"""Micro-bench of ALIKED DKD components at 1024x768: NMS dilation, exact
top_k over the full-res map, soft-argmax refinement, plus candidate
two-level top_k formulations.

Usage: python scripts/micro_dkd.py
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
    rng = np.random.default_rng(0)
    sm = jnp.asarray(rng.uniform(0, 1, (1, h, w)).astype(np.float32))
    conf = ALIKEDConfig(max_num_keypoints=k, mp=True)
    size = jnp.asarray([[float(w), float(h)]])

    def full(s, c):
        kpts, ks, valid = aliked.dkd_detect(s + c * 1e-20, conf, size)
        return c + kpts.sum() * 1e-20 + ks.sum() * 1e-20

    print(f"dkd_detect full   : {timed(full, sm):8.2f} ms")

    def nms(s, c):
        y = nn.max_pool_same(s[..., None] + c * 1e-20, 2)[..., 0]
        return c + y.sum() * 1e-20

    print(f"nms 5x5 dilation  : {timed(nms, sm):8.2f} ms")

    def topk(s, c):
        v, i = jax.lax.top_k((s + c * 1e-20).reshape(1, -1), k)
        return c + v.sum() * 1e-20 + i.sum() * 1e-20

    print(f"top_k 786k -> 1024: {timed(topk, sm):8.2f} ms")

    # two-level: per-row top-16, then top-k over 768*16 candidates
    def topk2(s, c):
        s2 = (s + c * 1e-20).reshape(1, h, w)
        vr, ir = jax.lax.top_k(s2, 16)  # (1, h, 16)
        cand = vr.reshape(1, -1)
        v, i2 = jax.lax.top_k(cand, k)
        row = i2 // 16
        col = jnp.take_along_axis(ir.reshape(1, -1), i2, axis=1)
        return c + v.sum() * 1e-20 + (row + col).sum() * 1e-20

    print(f"two-level topk    : {timed(topk2, sm):8.2f} ms")


if __name__ == "__main__" and "--topk2d" not in sys.argv:
    main()


def topk2d_bench():
    from lightglue_tpu.ops.topk import topk2d
    h, w, k = 768, 1024, 1024
    rng = np.random.default_rng(0)
    sm = jnp.asarray(rng.uniform(0, 1, (1, h, w)).astype(np.float32))

    def f(s, c):
        v, i = topk2d(s + c * 1e-20, k)
        return c + v.sum() * 1e-20 + i.sum() * 1e-20

    print(f"topk2d (cond)     : {timed(f, sm):8.2f} ms")

    def g(s, c):
        v, i = topk2d(s + c * 1e-20, k, cap=16)
        return c + v.sum() * 1e-20 + i.sum() * 1e-20

    print(f"topk2d cap16      : {timed(g, sm):8.2f} ms")


if "--topk2d" in sys.argv:
    topk2d_bench()
elif __name__ == "__main__":
    pass
