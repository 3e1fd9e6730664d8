"""A/B the clamp-based bilinear gather (ops/deform.py) vs the former
mask-based form, inside the block3 res-block composition, same session —
isolates the gather variant from chip/tunnel state drift."""

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

from lightglue_tpu import nn
from lightglue_tpu.configs import ALIKEDConfig
from lightglue_tpu.models import aliked
from lightglue_tpu.ops import deform


def timed(fn, *args, reps=8, tries=3):
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


def mask_gather(x, fy, fx):
    """The former mask-based quad-table gather (pre clamp rewrite)."""
    b, h, w, c = x.shape
    y0 = jnp.floor(fy)
    x0 = jnp.floor(fx)
    wy = (fy - y0)[..., None]
    wx = (fx - x0)[..., None]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    hp, wp = h + 1, w + 1
    quad = jnp.concatenate(
        [xp[:, :hp, :wp], xp[:, :hp, 1:], xp[:, 1:, :wp], xp[:, 1:, 1:]],
        axis=-1,
    ).reshape(b, hp * wp, 4 * c)
    yc = jnp.clip(y0, -1, h - 1).astype(jnp.int32) + 1
    xc = jnp.clip(x0, -1, w - 1).astype(jnp.int32) + 1
    idx = (yc * wp + xc).reshape(b, -1)
    g = jnp.take_along_axis(quad, idx[..., None], axis=1)
    g = g.reshape(*y0.shape, 4, c)

    def inside(yi, xi):
        ok = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        return ok[..., None].astype(x.dtype)

    w00 = (1 - wy) * (1 - wx) * inside(y0, x0)
    w01 = (1 - wy) * wx * inside(y0, x0 + 1)
    w10 = wy * (1 - wx) * inside(y0 + 1, x0)
    w11 = wy * wx * inside(y0 + 1, x0 + 1)
    return (
        g[..., 0, :] * w00
        + g[..., 1, :] * w01
        + g[..., 2, :] * w10
        + g[..., 3, :] * w11
    )


def clamp_gather_f32(x, fy, fx):
    """Clamp-based form but fp32 4-corner combine (old numerics)."""
    b, h, w, c = x.shape
    fy = jnp.clip(fy, -1.0, float(h))
    fx = jnp.clip(fx, -1.0, float(w))
    y0 = jnp.minimum(jnp.floor(fy), h - 1.0)
    x0 = jnp.minimum(jnp.floor(fx), w - 1.0)
    wy = (fy - y0)[..., None]
    wx = (fx - x0)[..., None]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    hp, wp = h + 1, w + 1
    quad = jnp.concatenate(
        [xp[:, :hp, :wp], xp[:, :hp, 1:], xp[:, 1:, :wp], xp[:, 1:, 1:]],
        axis=-1,
    ).reshape(b, hp * wp, 4 * c)
    idx = (y0.astype(jnp.int32) + 1) * wp + (x0.astype(jnp.int32) + 1)
    g = jnp.take_along_axis(quad, idx.reshape(b, -1)[..., None], axis=1)
    g = g.reshape(*y0.shape, 4, c)
    w00 = (1 - wy) * (1 - wx)
    w01 = (1 - wy) * wx
    w10 = wy * (1 - wx)
    w11 = wy * wx
    return (
        g[..., 0, :] * w00
        + g[..., 1, :] * w01
        + g[..., 2, :] * w10
        + g[..., 3, :] * w11
    )


def mask_gather_bf16(x, fy, fx):
    """Mask-based form but bf16 combine."""
    b, h, w, c = x.shape
    y0 = jnp.floor(fy)
    x0 = jnp.floor(fx)
    wy = (fy - y0)[..., None]
    wx = (fx - x0)[..., None]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    hp, wp = h + 1, w + 1
    quad = jnp.concatenate(
        [xp[:, :hp, :wp], xp[:, :hp, 1:], xp[:, 1:, :wp], xp[:, 1:, 1:]],
        axis=-1,
    ).reshape(b, hp * wp, 4 * c)
    yc = jnp.clip(y0, -1, h - 1).astype(jnp.int32) + 1
    xc = jnp.clip(x0, -1, w - 1).astype(jnp.int32) + 1
    idx = (yc * wp + xc).reshape(b, -1)
    g = jnp.take_along_axis(quad, idx[..., None], axis=1)
    g = g.reshape(*y0.shape, 4, c)

    def inside(yi, xi):
        ok = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        return ok[..., None].astype(x.dtype)

    w00 = (1 - wy) * (1 - wx) * inside(y0, x0)
    w01 = (1 - wy) * wx * inside(y0, x0 + 1)
    w10 = wy * (1 - wx) * inside(y0 + 1, x0)
    w11 = wy * wx * inside(y0 + 1, x0 + 1)
    if x.dtype == jnp.bfloat16:
        w00, w01, w10, w11 = (
            t.astype(jnp.bfloat16) for t in (w00, w01, w10, w11)
        )
    return (
        g[..., 0, :] * w00
        + g[..., 1, :] * w01
        + g[..., 2, :] * w10
        + g[..., 3, :] * w11
    )


def clamp_gather_flat(x, fy, fx):
    """Clamp form, but the quad-table gather is FLAT: batch folded into the
    row index, one batchless gather from (B*S, 4C)."""
    b, h, w, c = x.shape
    fy = jnp.clip(fy, -1.0, float(h))
    fx = jnp.clip(fx, -1.0, float(w))
    y0 = jnp.minimum(jnp.floor(fy), h - 1.0)
    x0 = jnp.minimum(jnp.floor(fx), w - 1.0)
    wy = (fy - y0)[..., None]
    wx = (fx - x0)[..., None]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    hp, wp = h + 1, w + 1
    quad = jnp.concatenate(
        [xp[:, :hp, :wp], xp[:, :hp, 1:], xp[:, 1:, :wp], xp[:, 1:, 1:]],
        axis=-1,
    ).reshape(b * hp * wp, 4 * c)
    idx = (y0.astype(jnp.int32) + 1) * wp + (x0.astype(jnp.int32) + 1)
    idx = idx.reshape(b, -1) + (jnp.arange(b, dtype=jnp.int32) * (hp * wp))[:, None]
    g = jnp.take(quad, idx.reshape(-1), axis=0)
    g = g.reshape(*y0.shape, 4, c)
    w00 = (1 - wy) * (1 - wx)
    w01 = (1 - wy) * wx
    w10 = wy * (1 - wx)
    w11 = wy * wx
    return (
        g[..., 0, :] * w00
        + g[..., 1, :] * w01
        + g[..., 2, :] * w10
        + g[..., 3, :] * w11
    )


def main():
    h, w = 768, 1024
    conf = ALIKEDConfig(max_num_keypoints=1024, mp=True)
    params = aliked.init_params(jax.random.key(0), conf)
    rng = np.random.default_rng(0)
    bs = [int(a) for a in sys.argv[1:]] or [1, 4]

    for b in bs:
        x2 = jnp.asarray(
            rng.standard_normal((b, h // 8, w // 8, 32)).astype(np.float32)
        ).astype(jnp.bfloat16)

        def b3(x, c):
            y = aliked._res_block(
                params["block3"], x + c.astype(x.dtype) * 1e-20, True
            )
            return c + y.sum().astype(jnp.float32) * 1e-20

        def b3_map(x, c):
            y = jax.lax.map(
                lambda xi: aliked._res_block(
                    params["block3"], xi[None], True
                )[0],
                x + c.astype(x.dtype) * 1e-20,
            )
            return c + y.sum().astype(jnp.float32) * 1e-20

        def b3_map2(x, c):
            n = x.shape[0]
            y = jax.lax.map(
                lambda xi: aliked._res_block(params["block3"], xi, True),
                (x + c.astype(x.dtype) * 1e-20).reshape(
                    n // 2, 2, *x.shape[1:]
                ),
            )
            return c + y.sum().astype(jnp.float32) * 1e-20

        res = {"batched": timed(b3, x2), "map1": timed(b3_map, x2)}
        orig = deform._bilinear_gather
        deform._bilinear_gather = clamp_gather_flat
        try:
            res["flat"] = timed(b3, x2)
        finally:
            deform._bilinear_gather = orig
        print(
            f"B{b}: " + "  ".join(f"{k} {v:6.2f}" for k, v in res.items()),
            flush=True,
        )


if __name__ == "__main__":
    main()
