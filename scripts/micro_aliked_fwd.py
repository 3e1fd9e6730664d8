"""A/B: ALIKED forward with row-normalized gathers (current) vs dense
l2-normalize + prenormalized SDDH. Checks whether dropping the dense pass
makes XLA duplicate the aggregation chain into both gather consumers.

Usage: python scripts/micro_aliked_fwd.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from lightglue_tpu import nn
from lightglue_tpu.configs import ALIKEDConfig
from lightglue_tpu.models import aliked


def timed(fn, *args, reps=8, tries=3):
    def run(r):
        @jax.jit
        def chained(*a):
            def body(c, _):
                return fn(*a, c), None

            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=r)
            return c

        float(chained(*args))
        best = float("inf")
        for _ in range(tries):
            t0 = time.perf_counter()
            float(chained(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t3 = run(reps), run(3 * reps)
    return (t3 - t1) / (2 * reps) * 1e3


def main():
    h, w, k = 768, 1024, 1024
    conf = ALIKEDConfig(max_num_keypoints=k, mp=True)
    params = aliked.init_params(jax.random.key(0), conf)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (1, h, w, 3)).astype(np.float32))
    size = jnp.asarray([[float(w), float(h)]])

    def fwd_rownorm(image, size_, c):
        f = aliked.forward(params, conf, image + c * 1e-20, size_)
        return (c + f.descriptors.sum().astype(jnp.float32) * 1e-20
                + f.keypoints.sum().astype(jnp.float32) * 1e-20)

    def fwd_densenorm(image, size_, c):
        im = (image + c * 1e-20).astype(jnp.bfloat16)
        fm, sm = aliked._dense_raw(params, im)
        fm = nn.l2_normalize(fm, axis=-1)
        kpts, kscores, valid = aliked.dkd_detect(sm, conf, size_)
        descs = aliked.sddh_describe(
            params["desc_head"], fm, kpts, conf, prenormalized=True
        ).astype(jnp.float32)
        return (c + descs.sum() * 1e-20 + kpts.sum() * 1e-20)

    for _ in range(2):
        print(f"rownorm  : {timed(fwd_rownorm, img, size):8.2f} ms")
        print(f"densenorm: {timed(fwd_densenorm, img, size):8.2f} ms")


if __name__ == "__main__" and "--barrier" not in sys.argv:
    main()


def barrier_variant():
    h, w, k = 768, 1024, 1024
    conf = ALIKEDConfig(max_num_keypoints=k, mp=True)
    params = aliked.init_params(jax.random.key(0), conf)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (1, h, w, 3)).astype(np.float32))
    size = jnp.asarray([[float(w), float(h)]])

    def fwd_barrier(image, size_, c):
        im = (image + c * 1e-20).astype(jnp.bfloat16)
        fm, sm = aliked._dense_raw(params, im)
        fm, sm = jax.lax.optimization_barrier((fm, sm))
        kpts, kscores, valid = aliked.dkd_detect(sm, conf, size_)
        descs = aliked.sddh_describe(
            params["desc_head"], fm, kpts, conf, prenormalized=False
        ).astype(jnp.float32)
        return (c + descs.sum() * 1e-20 + kpts.sum() * 1e-20)

    for _ in range(2):
        print(f"barrier  : {timed(fwd_barrier, img, size):8.2f} ms")


if "--barrier" in sys.argv:
    barrier_variant()
