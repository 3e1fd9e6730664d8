"""Fused ALIKED score-head Pallas kernel.

The reference score head (lightglue/aliked.py:671-679) is
``conv1x1(dim->8) -> selu -> conv3x3(8->4) -> selu -> conv3x3(4->4) ->
selu -> conv3x3(4->1) -> sigmoid`` at FULL resolution. The 1x1 stage is
already folded through the aggregation upsamples (models/aliked.py
``_dense_raw``); the three 3x3 tails have 4/4/1 output channels — so
lane-starved that even the tap-matmul formulation (nn.conv2d_tapmat)
round-trips a 36-lane partial-product map through HBM per conv
(measured 2.11 ms/image at 1024x768 on v5e).

This kernel computes all three convs + selus + sigmoid on one
VMEM-resident row strip in CHW layout (W on lanes, H on sublanes): each
conv is an unrolled scalar-weight x shifted-plane FMA chain on the VPU
(9*8*4 + 9*4*4 + 9*4 = 468 FMAs over (TH, W) planes ≈ 0.37 GFLOP/image —
two orders of magnitude under the VPU roofline, so the cost collapses to
one HBM read of the 8-channel input plus one write of the score map).

Zero shift-fill reproduces conv SAME zero padding at image borders; row
strips carry a halo of 8 >= 3 (one ring per conv) so central rows are
exact. Under ``mp`` the inter-stage values are rounded to bfloat16 to
match the XLA path's working dtype (accumulation stays fp32 in both).

STATUS — NOT wired into models/aliked.py (measured round 4, v5e): the
kernel wins in isolation (0.44 ms vs 2.11 ms XLA convs) but LOSES in full
composition: its NHWC->CHW operand transpose poisons XLA's layout
assignment for the shared aggregation/upsample chain that also feeds the
feature map (extract_dense_map 6.8 -> 24-28 ms/img; an
optimization_barrier does not help), while the tap-matmul tail fuses into
the aggregation for +0.3 ms marginal. Use only for standalone score-map
computation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO = 8  # 3 conv rings, rounded to the fp32 sublane tile


def _shiftz(x: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """out[i, j] = x[i + dy, j + dx], zero fill (conv SAME padding)."""
    for d, axis in ((dy, 0), (dx, 1)):
        if d == 0:
            continue
        n = x.shape[axis]
        if d > 0:
            body = jax.lax.slice_in_dim(x, d, n, axis=axis)
            pad = jnp.zeros_like(jax.lax.slice_in_dim(x, 0, d, axis=axis))
            x = jnp.concatenate([body, pad], axis=axis)
        else:
            body = jax.lax.slice_in_dim(x, 0, n + d, axis=axis)
            pad = jnp.zeros_like(jax.lax.slice_in_dim(x, 0, -d, axis=axis))
            x = jnp.concatenate([pad, body], axis=axis)
    return x


_SELU_ALPHA = 1.6732632423543772848170429916717
_SELU_SCALE = 1.0507009873554804934193349852946


def _selu(x: jnp.ndarray) -> jnp.ndarray:
    # jax.nn.selu lowers via expm1, which Mosaic does not implement; the
    # exp(x)-1 form differs by <1e-7 abs for the negative branch
    return _SELU_SCALE * jnp.where(
        x > 0, x, _SELU_ALPHA * (jnp.exp(x) - 1.0)
    )


def _conv_stage(planes, w_ref, off: int, cin: int, cout: int, mp: bool):
    """3x3 conv on CHW planes via scalar-weight FMAs; returns cout planes
    (fp32). ``w_ref`` is the flat (dy, dx, ci, co)-ordered weight vector."""
    accs = [jnp.zeros_like(planes[0]) for _ in range(cout)]
    for ci in range(cin):
        xc = planes[ci]
        if mp:
            xc = xc.astype(jnp.bfloat16).astype(jnp.float32)
        for t in range(9):
            dy, dx = t // 3 - 1, t % 3 - 1
            sh = _shiftz(xc, dy, dx)
            base = off + (t * cin + ci) * cout
            for co in range(cout):
                accs[co] = accs[co] + w_ref[base + co] * sh
    return accs


def _score_head_kernel(w_ref, s_hbm, out_ref, strip, sem, *, th, mp, h, w):
    i = pl.program_id(1)
    dma = pltpu.make_async_copy(
        s_hbm.at[pl.program_id(0), :, pl.ds(i * th, th + 2 * HALO), :],
        strip, sem,
    )
    dma.start()
    dma.wait()
    # each conv stage zero-pads ITS OWN input at the image border (SAME
    # semantics); inside the strip that means re-zeroing everything outside
    # the image after every stage, or halo values computed from the border
    # leak into the next conv
    shape = (th + 2 * HALO, strip.shape[2])
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + i * th
    inside = (rows >= HALO) & (rows < HALO + h)
    if w < shape[1]:
        inside &= jax.lax.broadcasted_iota(jnp.int32, shape, 1) < w
    zero = jnp.zeros(shape, jnp.float32)

    def load(c):
        x = strip[c].astype(jnp.float32)
        if mp:  # XLA path downcasts s0 before its selu (models/aliked.py)
            x = x.astype(jnp.bfloat16).astype(jnp.float32)
        return jnp.where(inside, _selu(x), zero)

    planes = [load(c) for c in range(8)]
    o2 = 9 * 8 * 4
    o3 = o2 + 9 * 4 * 4
    y = [
        jnp.where(inside, _selu(a), zero)
        for a in _conv_stage(planes, w_ref, 0, 8, 4, mp)
    ]
    y = [
        jnp.where(inside, _selu(a), zero)
        for a in _conv_stage(y, w_ref, o2, 4, 4, mp)
    ]
    (s,) = _conv_stage(y, w_ref, o3, 4, 1, mp)
    out_ref[0] = jax.nn.sigmoid(s)[HALO : HALO + th]


def _pack_weights(sh_params, mp: bool) -> jnp.ndarray:
    """Flatten the three HWIO kernels to (dy, dx, ci, co) order; under mp
    round to bfloat16 first (the XLA tapmat path multiplies in bf16)."""
    parts = []
    for name in ("2", "4", "6"):
        w = sh_params[name]["w"]
        if mp:
            w = w.astype(jnp.bfloat16)
        parts.append(w.astype(jnp.float32).reshape(-1))
    return jnp.concatenate(parts)


@functools.partial(
    jax.jit, static_argnames=("mp", "tile_rows", "interpret")
)
def score_head_pallas(
    sh_params,
    s0: jnp.ndarray,
    mp: bool = True,
    tile_rows: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """s0: (B, H, W, 8) fp32 pre-activation of the folded 1x1 stage.
    Returns the sigmoid score map (B, H, W) fp32.

    NHWC convenience wrapper: pays the CHW operand transpose that loses in
    composition (see STATUS above). The composition-safe entry point is
    ``score_head_pallas_cplane``, fed by channel-plane branch partials."""
    return score_head_pallas_cplane(
        sh_params, s0.astype(jnp.float32).transpose(0, 3, 1, 2),
        mp=mp, tile_rows=tile_rows, interpret=interpret,
    )


@functools.partial(
    jax.jit, static_argnames=("mp", "tile_rows", "interpret")
)
def score_head_pallas_cplane(
    sh_params,
    s0c: jnp.ndarray,
    mp: bool = True,
    tile_rows: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Channel-plane entry point: s0c is (B, 8, H, W) fp32 — the layout the
    kernel consumes directly, so composition never pays a full-res NHWC
    transpose (models/aliked.py builds the 1x1-stage partial sums in this
    layout via einsum output ordering). Returns (B, H, W) fp32 scores."""
    b, c, h, w = s0c.shape
    assert c == 8
    th = min(tile_rows, max(8, -(-h // 8) * 8))
    n_h = -(-h // th)
    wp = -(-w // 128) * 128
    if wp > 1024:  # keep the fp32 strip scratch within VMEM at wide W
        th = min(th, 64)
        n_h = -(-h // th)
    hp = n_h * th + 2 * HALO
    x = jnp.pad(
        s0c.astype(jnp.float32),
        ((0, 0), (0, 0), (HALO, hp - h - HALO), (0, wp - w)),
    )
    wflat = _pack_weights(sh_params, mp)
    kern = functools.partial(_score_head_kernel, th=th, mp=mp, h=h, w=w)
    out = pl.pallas_call(
        kern,
        grid=(b, n_h),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=jax.ShapeDtypeStruct((b, n_h * th, wp), jnp.float32),
        out_specs=pl.BlockSpec((1, th, wp), lambda bb, ii: (bb, ii, 0)),
        scratch_shapes=[
            pltpu.VMEM((8, th + 2 * HALO, wp), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(wflat, x)
    return out[:, :h, :w]


def score_head_cplane_ok(h: int, w: int) -> bool:
    """Gate for the composed cplane path: the strip scratch is
    8*(th+16)*Wp fp32 — W <= 2048 keeps it under ~5.3 MB at th=64."""
    return 128 <= w <= 2048 and h >= 32
