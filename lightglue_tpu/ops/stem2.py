"""Fused SuperPoint block-2 Pallas kernel: conv3x3(64->64) + ReLU +
conv3x3(64->64) + ReLU + maxpool2x2 at H/2 resolution, in ONE pass.

Extends the fused-stem treatment (ops/stem.py; reference
lightglue/superpoint.py:161-163 is the conv2a/conv2b/pool2 stretch) one
block deeper: composed from XLA convs, block 2 costs ~0.47 ms/img of the
remaining encoder (conv2a 0.16 + conv2b 0.21 + pool2 0.11, v5e bf16 B8
@1024x768) with two full (H/2, W/2, 64) HBM round-trips between stages;
the kernel's fundamental traffic is strip-in + pooled-out.

Same design as the stem kernel's conv1b stage, twice:

  * input arrives in channel-plane layout (C on sublanes, W on lanes) —
    exactly what ``fused_stem_pallas(..., out_layout="cplane")`` emits, so
    no relayout exists anywhere between the two kernels;
  * each 3x3x64->64 conv packs dy into contraction depth (a free
    (3, 64, W) -> (192, W) reshape of adjacent channel-planes) and dx into
    output lanes: one (192, 192) stationary matmul per output row, then
    two lane shifts recombine the dx phases;
  * border zero-padding (rows outside the image, lanes past W/2 — the
    stem output is lane-padded with conv1b garbage there) is applied as an
    iota mask on the (192, W) tap stack, so the caller never slices;
  * ReLU, bias, 2x2 max-pool and the NHWC transpose happen in VMEM before
    the single output write.

Numerics match the stem kernel's envelope (dx-split sums three fp32
partials; bf16 operands under ``mp``): agreement vs the XLA composition
asserted in tests/test_stem.py, on-TPU as ``fused_block2_vs_xla_bf16`` in
benchmarks/kernel_agreement.json.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stem import _shift_lanes

HALO2 = 2  # conv2b ring (1) + conv2a ring (1), at H/2 scale


def _block2_kernel(
    w2a_ref, b2a_ref, w2b_ref, b2b_ref, x_hbm,
    out_ref,
    a2, strip, sem,
    *,
    th: int, h2: int, w2: int, mp: bool, interp: bool,
):
    i = pl.program_id(1)
    f32 = jnp.float32
    cdt = jnp.bfloat16 if mp else f32
    wp = strip.shape[2]

    # strip rows [i*th - 2, i*th + th + 1] of the HALO2-top-padded input:
    # padded row r = image row r - 2, so the DMA start i*th is aligned.
    dma = pltpu.make_async_copy(
        x_hbm.at[pl.program_id(0), pl.ds(i * th, strip.shape[0]), :, :],
        strip, sem,
    )
    dma.start()
    dma.wait()

    w2a = w2a_ref[:].astype(cdt)  # (192, 192) (dy,ci) -> (dx,co)
    b2a = b2a_ref[:].astype(f32)  # (64, 1)
    lane_ok = jax.lax.broadcasted_iota(jnp.int32, (192, wp), 1) < w2
    dy_row = jax.lax.broadcasted_iota(jnp.int32, (192, wp), 0) // 64
    # conv2a OUTPUT lanes >= w2 must be zero too: conv2b's dx=+1 tap at
    # lane w2-1 reads lane w2, which is SAME-padding zero in the XLA path
    lane64_ok = jax.lax.broadcasted_iota(jnp.int32, (64, wp), 1) < w2

    # conv2a: a2[ti] = output at global row g = i*th + ti - 1
    for ti in range(th + 2):
        g = i * th + ti - 1
        x = strip[ti : ti + 3].reshape(192, wp).astype(cdt)
        # zero taps outside the true image extent (rows beyond h2 and
        # lanes beyond w2 hold stem-kernel pad garbage, not zeros)
        row_src = g - 1 + dy_row
        ok = jnp.logical_and(
            jnp.logical_and(row_src >= 0, row_src < h2), lane_ok
        )
        x = jnp.where(ok, x, jnp.zeros_like(x))
        y = jax.lax.dot_general(
            w2a, x, (((0,), (0,)), ((), ())), preferred_element_type=f32
        )  # (192, wp) dx-phase-major
        o = (
            _shift_lanes(y[0:64], -1, interp)
            + y[64:128]
            + _shift_lanes(y[128:192], 1, interp)
        )
        val = jnp.maximum(o.astype(cdt).astype(f32) + b2a, 0.0)
        row_ok = jnp.logical_and(g >= 0, g < h2)
        val = jnp.where(jnp.logical_and(row_ok, lane64_ok), val, 0.0)
        a2[ti] = val.astype(cdt)

    w2b = w2b_ref[:].astype(cdt)
    b2b = b2b_ref[:].astype(f32)

    # conv2b + relu on pairs of rows, then 2x2 max-pool, NHWC write
    for t2i in range(th // 2):
        halves = []
        for dt in (0, 1):
            t = 2 * t2i + dt
            x = a2[t : t + 3].reshape(192, wp)
            y = jax.lax.dot_general(
                w2b, x, (((0,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
            o = (
                _shift_lanes(y[0:64], -1, interp)
                + y[64:128]
                + _shift_lanes(y[128:192], 1, interp)
            )
            halves.append(jnp.maximum(o.astype(cdt).astype(f32) + b2b, 0.0))
        p = jnp.maximum(halves[0], halves[1])  # (64, wp)
        pt = p.T.reshape(wp // 2, 2, 64)
        out_ref[0, t2i] = jnp.max(pt, axis=1).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("h2", "w2", "mp", "tile_rows", "interpret")
)
def fused_block2_pallas(
    params: dict,
    x: jnp.ndarray,
    h2: int,
    w2: int,
    mp: bool = True,
    tile_rows: int = 32,
    interpret: bool = False,
) -> jnp.ndarray:
    """conv2a/conv2b/pool2 of the SuperPoint encoder in one Pallas pass.

    tile_rows=32 (vs 16) halves the halo recompute fraction and the grid
    step count: 1.687 vs 1.732 ms/img full SuperPoint forward (v5e bf16
    B8 @1024x768); 64 measured slightly worse (1.707). Output is bitwise
    invariant to the tile split (identical per-row arithmetic).

    params: {"conv2a": {w (3,3,64,64), b (64,)}, "conv2b": ...}. ``x`` is
    the channel-plane stem output (B, >=h2, 64, wp2) from
    ``fused_stem_pallas(..., out_layout="cplane")`` — possibly row/lane
    padded; ``h2``/``w2`` give the true extent (pad values are masked in
    the kernel). h2 must be even. Returns (B, h2//2, w2//2, 64) NHWC.
    """
    b, hr, c, wp = x.shape
    assert c == 64 and h2 % 2 == 0 and hr >= h2 and wp % 128 == 0
    dt = jnp.bfloat16 if mp else jnp.float32
    th = tile_rows
    n_h = -(-h2 // th)
    strip_rows = -(-(th + 2 * HALO2) // 8) * 8
    hp = n_h * th + strip_rows  # top pad 2 + coverage, rounded up
    xpad = jnp.pad(
        x.astype(dt)[:, :h2], ((0, 0), (HALO2, hp - h2 - HALO2), (0, 0), (0, 0))
    )

    def _cat(wk):  # HWIO (dy, dx, ci, co) -> ((dy, ci), (dx, co))
        return wk.transpose(0, 2, 1, 3).reshape(192, 192)

    w2a = _cat(params["conv2a"]["w"])
    b2a = params["conv2a"]["b"].reshape(64, 1)
    w2b = _cat(params["conv2b"]["w"])
    b2b = params["conv2b"]["b"].reshape(64, 1)

    kern = functools.partial(
        _block2_kernel, th=th, h2=h2, w2=w2, mp=mp, interp=interpret
    )
    whole = lambda a: pl.BlockSpec(
        a.shape, lambda bb, ii: tuple(0 for _ in a.shape),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        kern,
        grid=(b, n_h),
        in_specs=[
            whole(w2a), whole(b2a), whole(w2b), whole(b2b),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=jax.ShapeDtypeStruct((b, n_h * th // 2, wp // 2, 64), dt),
        out_specs=pl.BlockSpec(
            (1, th // 2, wp // 2, 64), lambda bb, ii: (bb, ii, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((th + 2, 64, wp), dt),        # conv2a planes
            pltpu.VMEM((strip_rows, 64, wp), dt),    # input strip
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(w2a, b2a, w2b, b2b, xpad)
    return out[:, : h2 // 2, : w2 // 2]


def block2_pallas_ok(h: int, w: int) -> bool:
    """Gate on FULL-RES image shape (composes with stem_pallas_ok): block-2
    strips at H/2 must tile and the W/2 lanes must fill tiles. The strip
    scratch is (th+8)*64*(W/2) elements — W<=4096 keeps it ~3 MB bf16."""
    h2, w2 = h // 2, w // 2
    return (
        h % 2 == 0 and w % 2 == 0 and h2 % 16 == 0
        and h2 >= 64 and 256 <= w2 <= 2048 and w2 % 128 == 0
    )
