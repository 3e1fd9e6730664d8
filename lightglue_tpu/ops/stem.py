"""Fused SuperPoint stem Pallas kernel: conv3x3(1->64) + ReLU +
conv3x3(64->64) + ReLU + maxpool2x2 in ONE pass over the image.

The stem is the most expensive stretch of the SuperPoint encoder
(reference lightglue/superpoint.py:158-160) because it runs at FULL
resolution: composed from XLA convs it was measured at 1.61 ms/image of a
2.59 ms total (conv1a 0.45 + conv1b 0.75 + pool1 0.41, v5e, bf16, B8
@1024x768) — and almost all of that is structural, not FLOPs:

  * conv1a (1 input channel) gives the MXU a contraction depth of 9, so
    XLA evaluates it VPU-bound;
  * each arrow materializes a full-resolution 64-channel map in HBM
    (~100 MB bf16): the stem moves ~425 MB/image where the kernel's
    fundamental traffic is image-in (1.5 MB) + pooled-out (25 MB).

Kernel design (grid = (B, H/TH), one row strip per step):

  * the strip lives in channel-plane layout (C on sublanes, W on lanes) —
    the same orientation ops/score_head.py uses — so conv shifts are
    sublane slices (dy) and lane shifts (dx), with no NHWC transpose of
    any 64-channel tensor (the only relayout is of the 1-channel input);
  * conv1a becomes an outer-product matmul per row: (64, 9) weight @
    (9, W) shifted-image taps — the depth-9 contraction costs one MXU
    pass per row instead of a 453M-FMA VPU chain;
  * conv1b packs dy into contraction depth and dx into output lanes:
    one (192, 192) stationary matmul per output row over the (192, W)
    dy-stacked conv1a planes (a free reshape in this layout), then the
    three dx phases recombine with two lane shifts — 576-deep effective
    contraction instead of XLA's 64;
  * ReLU, bias, 2x2 max-pool and the NHWC transpose of the (64, W/2)
    pooled rows all happen in VMEM before the single output write.

Accumulation is fp32 with bf16 operands under ``mp`` (the XLA path's
dtype flow: nn.conv2d casts accumulators back to the activation dtype
between stages); fp32 end-to-end otherwise. Not bitwise vs the XLA path
(the dx-split sums three fp32 partials instead of one 576-product
accumulation) — agreement asserted to ~1e-6 fp32 / ~2e-2 bf16 in
tests/test_stem.py and on-TPU by bench.py's kernel-agreement section.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO = 2  # conv1b ring (1) + conv1a ring (1)


def _shift_lanes(x: jnp.ndarray, dx: int, interp: bool = False) -> jnp.ndarray:
    """out[..., j] = x[..., j + dx], zero fill (conv SAME padding).

    Formulated as a lane rotate + iota mask: Mosaic rejects the natural
    slice+concat ("result/input offset mismatch on non-concat dimension"
    when gluing a zero pad onto a lane-offset slice view), but
    ``tpu.rotate`` is a native op.
    """
    if dx == 0:
        return x
    n = x.shape[-1]
    if interp:
        r = jnp.roll(x, -dx, axis=-1)
    else:
        if x.dtype.itemsize != 4:  # tpu.rotate is 32-bit only
            return _shift_lanes(
                x.astype(jnp.float32), dx, interp
            ).astype(x.dtype)
        r = pltpu.roll(x, -dx % n, axis=x.ndim - 1)
    j = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    ok = (j < n - dx) if dx > 0 else (j >= -dx)
    return jnp.where(ok, r, jnp.zeros_like(r))


def _stem_kernel(
    w1a_ref, b1a_ref, wcat_ref, b1b_ref, img_hbm,
    out_ref,
    a1, strip, sem,
    *,
    th: int, h: int, w: int, mp: bool, interp: bool, cplane: bool = False,
):
    i = pl.program_id(1)
    f32 = jnp.float32
    cdt = jnp.bfloat16 if mp else f32
    t2 = th + 2
    wp = strip.shape[1]

    # DMA length must be sublane-tile aligned (8): the strip scratch is
    # rounded up from th + 2*HALO; the extra rows are padding, never read.
    dma = pltpu.make_async_copy(
        img_hbm.at[pl.program_id(0), pl.ds(i * th, strip.shape[0]), :],
        strip, sem,
    )
    dma.start()
    dma.wait()

    b1a = b1a_ref[:].astype(f32)  # (64, 1)
    w1a = w1a_ref[:].astype(cdt)  # (64, 16) taps zero-padded past 9
    lane_ok = jax.lax.broadcasted_iota(jnp.int32, (1, wp), 1) < w

    # conv1a: per output row an outer-product matmul (64, 16) @ (16, W).
    # a1 row ti = conv1a output at global row i*th + ti - 1; rows outside
    # the image are ZERO (conv1b zero-pads its own input at the border).
    # Taps are built dx-major from one contiguous 3-row read (Mosaic
    # cannot concat single-row ref views with differing sublane offsets).
    for ti in range(t2):
        rows3 = strip[ti : ti + 3, :].astype(cdt)  # (3, wp)
        img9 = jnp.concatenate(
            [
                _shift_lanes(rows3, -1, interp),
                rows3,
                _shift_lanes(rows3, 1, interp),
                jnp.zeros((16 - 9, wp), cdt),
            ],
            axis=0,
        )  # (16, wp), tap order (dx, dy)
        acc = jax.lax.dot_general(
            w1a, img9, (((1,), (0,)), ((), ())), preferred_element_type=f32
        )
        val = jnp.maximum(acc.astype(cdt).astype(f32) + b1a, 0.0)
        g = i * th + ti - 1
        row_ok = jnp.logical_and(g >= 0, g < h)
        val = jnp.where(jnp.logical_and(row_ok, lane_ok), val, 0.0)
        a1[ti] = val.astype(cdt)

    wcat = wcat_ref[:].astype(cdt)  # (192, 192)
    b1b = b1b_ref[:].astype(f32)  # (64, 1)

    # conv1b + relu on pairs of rows, then 2x2 max-pool
    for t2i in range(th // 2):
        halves = []
        for dt in (0, 1):
            t = 2 * t2i + dt
            x = a1[t : t + 3].reshape(192, wp)  # dy-major stack, free
            y = jax.lax.dot_general(
                wcat, x, (((0,), (0,)), ((), ())),
                preferred_element_type=f32,
            )  # (192, wp): dx-phase-major output channels
            o = (
                _shift_lanes(y[0:64], -1, interp)
                + y[64:128]
                + _shift_lanes(y[128:192], 1, interp)
            )
            halves.append(jnp.maximum(o.astype(cdt).astype(f32) + b1b, 0.0))
        p = jnp.maximum(halves[0], halves[1])  # (64, wp)
        # stride-2 lane selection via transposed sublane split: Mosaic
        # rejects p[:, 0::2] (gather) but takes this reshape, and the
        # transpose is needed for the NHWC output write anyway.
        pt = p.T.reshape(wp // 2, 2, 64)
        pooled = jnp.max(pt, axis=1)  # (wp/2, 64)
        if cplane:
            # channel-plane output (C on sublanes, W on lanes): feeds the
            # block-2 kernel (ops/stem2.py) without any NHWC relayout
            out_ref[0, t2i] = pooled.T.astype(out_ref.dtype)
        else:
            out_ref[0, t2i] = pooled.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("mp", "tile_rows", "interpret", "out_layout")
)
def fused_stem_pallas(
    params: dict,
    image: jnp.ndarray,
    mp: bool = True,
    tile_rows: int = 16,
    interpret: bool = False,
    out_layout: str = "nhwc",
) -> jnp.ndarray:
    """conv1a/conv1b/pool1 of the SuperPoint encoder in one Pallas pass.

    params: {"conv1a": {w (3,3,1,64), b (64,)}, "conv1b": {w (3,3,64,64),
    b (64,)}} (models/superpoint.init_params). image: (B, H, W, 1) fp32,
    H and W even. Returns (B, H//2, W//2, 64) in the XLA path's working
    dtype (bfloat16 under mp); with ``out_layout="cplane"`` the channel
    axis moves to sublanes — (B, H//2, 64, W//2) — the layout the block-2
    kernel (ops/stem2.py::fused_block2_pallas) consumes directly.
    """
    b, h, w, c = image.shape
    assert c == 1 and h % 2 == 0 and w % 2 == 0
    dt = jnp.bfloat16 if mp else jnp.float32
    th = tile_rows
    n_h = -(-h // th)
    wp = -(-w // 128) * 128
    strip_rows = -(-(th + 2 * HALO) // 8) * 8
    hp = n_h * th + (strip_rows - th)
    img = jnp.pad(
        image[..., 0].astype(dt),
        ((0, 0), (HALO, hp - h - HALO), (0, wp - w)),
    )

    # (64, 9) taps in the kernel's (dx, dy) build order
    w1a = params["conv1a"]["w"].transpose(1, 0, 2, 3).reshape(9, 64).T
    w1a = jnp.pad(w1a, ((0, 0), (0, 7)))  # K tile: (64, 16)
    b1a = params["conv1a"]["b"].reshape(64, 1)
    # (dy, ci) -> contraction rows; (dx, co) -> output rows
    wcat = params["conv1b"]["w"].transpose(0, 2, 1, 3).reshape(192, 192)
    b1b = params["conv1b"]["b"].reshape(64, 1)

    cplane = out_layout == "cplane"
    kern = functools.partial(
        _stem_kernel, th=th, h=h, w=w, mp=mp, interp=interpret,
        cplane=cplane,
    )
    whole = lambda a: pl.BlockSpec(
        a.shape, lambda bb, ii: tuple(0 for _ in a.shape),
        memory_space=pltpu.VMEM,
    )
    out_shape = (
        (b, n_h * th // 2, 64, wp // 2) if cplane
        else (b, n_h * th // 2, wp // 2, 64)
    )
    out_block = (
        (1, th // 2, 64, wp // 2) if cplane else (1, th // 2, wp // 2, 64)
    )
    out = pl.pallas_call(
        kern,
        grid=(b, n_h),
        in_specs=[
            whole(w1a), whole(b1a), whole(wcat), whole(b1b),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=jax.ShapeDtypeStruct(out_shape, dt),
        out_specs=pl.BlockSpec(out_block, lambda bb, ii: (bb, ii, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((th + 2, 64, wp), dt),    # conv1a planes (C-major)
            pltpu.VMEM((strip_rows, wp), dt),  # image strip
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(w1a, b1a, wcat, b1b, img)
    if cplane:
        return out[:, : h // 2, :, : w // 2]
    return out[:, : h // 2, : w // 2]


def stem_pallas_ok(h: int, w: int) -> bool:
    """Shape gate: strips must tile, the W lanes must be worth it, and the
    a1 VMEM scratch ((th+2)*64*W elements, linear in W — ~2.25 MB at W=1024
    bf16) must fit comfortably: beyond W=4096 it approaches the VMEM budget
    and the kernel would fail to compile instead of falling back."""
    return h % 16 == 0 and w % 2 == 0 and h >= 64 and 256 <= w <= 4096
