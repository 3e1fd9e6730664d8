"""ALIKED per-stage batch-scaling study: which stage stops scaling?

B1 full forward is 9.98 ms/img but B8 is 15.0 — something in the graph
scales worse than linearly with batch. Times dense_raw / dkd / sddh at
B in {1, 4, 8} (differential chained timing).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import os as _os
if _os.environ.get("LG_CACHE", "1") != "0":
    from lightglue_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache(
        str(Path(__file__).resolve().parent.parent) + "/.cache/xla")

import jax
import jax.numpy as jnp
import numpy as np

from lightglue_tpu.configs import ALIKEDConfig
from lightglue_tpu.models import aliked


def timed(fn, *args, reps=6, tries=3):
    def run(r):
        @jax.jit
        def chained(*a):
            def body(carry, _):
                return fn(*a, carry), None

            out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=r)
            return out

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

    for b in (1, 4, 8):
        img = jnp.asarray(
            rng.uniform(0, 1, (b, h, w, 3)).astype(np.float32)
        ).astype(jnp.bfloat16)
        size = jnp.asarray(np.tile([[float(w), float(h)]], (b, 1)))

        def dense(image, c):
            fm, sm = aliked._dense_raw(params, image + c.astype(image.dtype) * 1e-20)
            return c + fm.sum().astype(jnp.float32) * 1e-20 + sm.sum() * 1e-20

        t_dense = timed(dense, img)

        fm, sm = jax.jit(lambda i: aliked.extract_dense_map(params, i))(img)
        fm, sm = jax.block_until_ready((fm, sm))

        def dkd(sm_, c):
            kp, ks, v = aliked.dkd_detect(sm_ + c * 1e-20, conf, size)
            return c + kp.sum() * 1e-20 + ks.sum() * 1e-20

        t_dkd = timed(dkd, sm)

        kpts, _, _ = jax.jit(lambda s: aliked.dkd_detect(s, conf, size))(sm)
        kpts = jax.block_until_ready(kpts)

        def sddh(fm_, kp, c):
            d = aliked.sddh_describe(
                params["desc_head"], fm_ + c.astype(fm_.dtype) * 1e-20,
                kp, conf)
            return c + d.sum().astype(jnp.float32) * 1e-20

        t_sddh = timed(sddh, fm, kpts)

        def full(image, c):
            f = aliked.forward(params, conf, image + c * 1e-20, size)
            return (c + f.descriptors.sum().astype(jnp.float32) * 1e-20
                    + f.keypoints.sum() * 1e-20)

        imgf = jnp.asarray(
            rng.uniform(0, 1, (b, h, w, 3)).astype(np.float32))
        t_full = timed(full, imgf)

        print(f"B{b}: dense {t_dense/b:7.2f}  dkd {t_dkd/b:6.2f}  "
              f"sddh {t_sddh/b:6.2f}  full {t_full/b:7.2f} ms/img",
              flush=True)


if __name__ == "__main__":
    main()
