"""Fused stem kernel vs XLA conv1a/conv1b/pool1 on TPU (chained timing).

    python scripts/micro_stem.py [--batch 8] [--fp32] [--tile 16]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

import os as _os
if _os.environ.get("LG_CACHE", "1") != "0":
    from lightglue_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache(str(Path(__file__).resolve().parent.parent) + "/.cache/xla")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--h", type=int, default=768)
    ap.add_argument("--w", type=int, default=1024)
    ap.add_argument("--tile", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lightglue_tpu import nn
    from lightglue_tpu.models import superpoint as sp
    from lightglue_tpu.ops.stem import fused_stem_pallas

    mp = not args.fp32
    params = sp.init_params(jax.random.key(0))
    stem_p = {"conv1a": params["conv1a"], "conv1b": params["conv1b"]}
    rng = np.random.default_rng(1)
    img = jnp.asarray(
        rng.uniform(0, 1, (args.batch, args.h, args.w, 1)).astype(np.float32)
    )

    def xla_stem(image):
        x = image.astype(jnp.bfloat16) if mp else image
        x = jax.nn.relu(nn.conv2d(params["conv1a"], x))
        x = jax.nn.relu(nn.conv2d(params["conv1b"], x))
        return nn.max_pool(x, 2).astype(jnp.float32).sum()

    def pallas_stem(image):
        return fused_stem_pallas(
            stem_p, image, mp=mp, tile_rows=args.tile
        ).astype(jnp.float32).sum()

    # agreement first
    a = np.asarray(jax.jit(
        lambda im: fused_stem_pallas(stem_p, im, mp=mp, tile_rows=args.tile)
    )(img).astype(jnp.float32))
    def xla_full(image):
        x = image.astype(jnp.bfloat16) if mp else image
        x = jax.nn.relu(nn.conv2d(params["conv1a"], x))
        x = jax.nn.relu(nn.conv2d(params["conv1b"], x))
        return nn.max_pool(x, 2)
    r = np.asarray(jax.jit(xla_full)(img).astype(jnp.float32))
    print(f"agreement maxabs={np.abs(a - r).max():.3e} "
          f"rel={np.abs(a - r).max() / (np.abs(r).max() + 1e-9):.3e}",
          flush=True)

    def timed(fn, reps):
        def make(r):
            @jax.jit
            def chained(image):
                def body(c, _):
                    return c + fn(image + c * 1e-24) * 1e-20, None
                c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=r)
                return c
            return chained

        def best(f):
            float(f(img))
            b = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(f(img))
                b = min(b, time.perf_counter() - t0)
            return b

        t1 = best(make(reps))
        t3 = best(make(3 * reps))
        return (t3 - t1) / (2 * reps) / args.batch * 1000

    print(f"B={args.batch} {args.h}x{args.w} mp={mp} tile={args.tile}",
          flush=True)
    print(f"xla stem    {timed(xla_stem, args.reps):7.3f} ms/img", flush=True)
    print(f"pallas stem {timed(pallas_stem, args.reps):7.3f} ms/img",
          flush=True)


if __name__ == "__main__":
    main()
