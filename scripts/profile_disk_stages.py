"""DISK U-Net stage breakdown on the real TPU (differential chained timing).

Locates where the fp32 time goes and why bf16 regresses (measured 2026-08:
bf16 full forward 52.5 ms vs fp32 25.0 ms before the fix).

Usage: python scripts/profile_disk_stages.py [H W] [--bf16]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from lightglue_tpu import nn
from lightglue_tpu.configs import DISKConfig
from lightglue_tpu.models import disk


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
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    h = int(args[0]) if len(args) > 0 else 768
    w = int(args[1]) if len(args) > 1 else 1024
    dtype = jnp.bfloat16 if "--bf16" in sys.argv else jnp.float32

    conf = DISKConfig(max_num_keypoints=1024)
    params = disk.init_params(jax.random.key(0), conf)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (1, h, w, 3)).astype(np.float32))
    img = img.astype(dtype)
    print(f"dtype={dtype.__name__}  image={w}x{h}")

    # full unet
    def unet(x, c):
        y = disk.unet_forward(params, x + c.astype(x.dtype) * 1e-20)
        return c + y.sum().astype(jnp.float32) * 1e-20

    print(f"unet_forward      : {timed(unet, img):8.2f} ms")

    # down path only
    def down(x, c):
        x = x + c.astype(x.dtype) * 1e-20
        feats = []
        for i in range(len(disk.DOWN)):
            if i > 0:
                x = disk._avg_pool2(x)
            x = disk._conv_block(params["down"][str(i)], x, is_first=(i == 0))
            feats.append(x)
        return c + sum(f.sum().astype(jnp.float32) for f in feats) * 1e-20

    print(f"down path         : {timed(down, img):8.2f} ms")

    # individual stages at their real shapes
    shapes = [
        ("down0 conv 3->16 @1/1", (h, w, 3), params["down"]["0"], False),
        ("down1 blk 16->32 @1/2", (h // 2, w // 2, 16), params["down"]["1"], True),
        ("down2 blk 32->64 @1/4", (h // 4, w // 4, 32), params["down"]["2"], True),
        ("down3 blk 64->64 @1/8", (h // 8, w // 8, 64), params["down"]["3"], True),
        ("down4 blk 64->64 @1/16", (h // 16, w // 16, 64), params["down"]["4"], True),
        ("up0 blk 128->64 @1/8", (h // 8, w // 8, 128), params["up"]["0"], True),
        ("up1 blk 128->64 @1/4", (h // 4, w // 4, 128), params["up"]["1"], True),
        ("up2 blk 96->64 @1/2", (h // 2, w // 2, 96), params["up"]["2"], True),
        ("up3 blk 80->129 @1/1", (h, w, 80), params["up"]["3"], True),
    ]
    for name, shp, p, gated in shapes:
        xv = jnp.asarray(
            rng.standard_normal((1,) + shp).astype(np.float32)
        ).astype(dtype)

        def stage(x, c, p=p, gated=gated):
            y = disk._conv_block(p, x + c.astype(x.dtype) * 1e-20,
                                 is_first=not gated)
            return c + y.sum().astype(jnp.float32) * 1e-20

        print(f"{name:22s}: {timed(stage, xv):8.2f} ms")

    # primitive costs at the dominant resolution
    x80 = jnp.asarray(
        rng.standard_normal((1, h, w, 80)).astype(np.float32)
    ).astype(dtype)

    def inorm(x, c):
        y = nn.instance_norm(x + c.astype(x.dtype) * 1e-20)
        return c + y.sum().astype(jnp.float32) * 1e-20

    print(f"instance_norm @1/1/80 : {timed(inorm, x80):8.2f} ms")

    x64h = jnp.asarray(
        rng.standard_normal((1, h // 2, w // 2, 64)).astype(np.float32)
    ).astype(dtype)

    def ups(x, c):
        y = disk._upsample2_bilinear(x + c.astype(x.dtype) * 1e-20)
        return c + y.sum().astype(jnp.float32) * 1e-20

    print(f"bilinear up @1/2->1/1 : {timed(ups, x64h):8.2f} ms")

    def pool(x, c):
        y = disk._avg_pool2(x + c.astype(x.dtype) * 1e-20)
        return c + y.sum().astype(jnp.float32) * 1e-20

    print(f"avg_pool2 @1/1/80     : {timed(pool, x80):8.2f} ms")


if __name__ == "__main__":
    main()
