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


def _tail_planes(planes, w_ref, inside, zero, mp):
    """The three 3x3 convs + selus + sigmoid on 8 fp32 strip planes."""
    o2 = 9 * 8 * 4
    o3 = o2 + 9 * 4 * 4
    planes = [jnp.where(inside, _selu(p), zero) for p in planes]
    y = [
        jnp.where(inside, _selu(a), zero)
        for a in _conv_stage(planes, w_ref, 0, 8, 4, mp)
    ]
    y = [
        jnp.where(inside, _selu(a), zero)
        for a in _conv_stage(y, w_ref, o2, 4, 4, mp)
    ]
    (s,) = _conv_stage(y, w_ref, o3, 4, 1, mp)
    return jax.nn.sigmoid(s)


def _inside_mask(i, th, h, w, wp):
    shape = (th + 2 * HALO, wp)
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + i * th
    inside = (rows >= HALO) & (rows < HALO + h)
    if w < wp:
        inside &= jax.lax.broadcasted_iota(jnp.int32, shape, 1) < w
    return inside, jnp.zeros(shape, jnp.float32)


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
    inside, zero = _inside_mask(i, th, h, w, strip.shape[2])

    def load(c):
        x = strip[c].astype(jnp.float32)
        if mp:  # XLA path downcasts s0 before its selu (models/aliked.py)
            x = x.astype(jnp.bfloat16).astype(jnp.float32)
        return x

    s = _tail_planes([load(c) for c in range(8)], w_ref, inside, zero, mp)
    out_ref[0] = s[HALO : HALO + th]


def _row_lerp_matrix(i, th, hk: int, h: int, start, rows: int):
    """(th+2*HALO, rows) dynamic row-lerp matrix for one strip: output row
    t (global g = i*th + t - HALO, clamped into the image) lerps branch
    rows y0, y0+1 with align_corners weights — the same two-point lerp
    ``models/aliked._lerp_matrix`` encodes. ``start`` is the (traced)
    first branch row resident in the strip scratch."""
    t = jax.lax.broadcasted_iota(jnp.int32, (th + 2 * HALO, 1), 0)
    g = jnp.clip(i * th + t - HALO, 0, h - 1).astype(jnp.float32)
    cy = g * ((hk - 1.0) / (h - 1.0))
    y0 = jnp.minimum(jnp.floor(cy), hk - 2.0)
    wy = cy - y0
    loc = y0.astype(jnp.int32) - start  # (T, 1)
    j = jax.lax.broadcasted_iota(jnp.int32, (th + 2 * HALO, rows), 1)
    return jnp.where(j == loc, 1.0 - wy, 0.0) + jnp.where(
        j == loc + 1, wy, 0.0
    )


def _score_lazy_kernel(
    w_ref, lx2_ref, lx3_ref, lx4_ref,
    s1_hbm, s2_hbm, s3_ref, s4_ref,
    out_ref,
    strip1, strip2, sem1, sem2,
    *,
    th, mp, h, w, h2, w2, h3, w3, h4, w4, r2,
):
    b = pl.program_id(0)
    i = pl.program_id(1)
    f32 = jnp.float32
    t16 = th + 2 * HALO
    wp = strip1.shape[2]

    d1 = pltpu.make_async_copy(
        s1_hbm.at[b, :, pl.ds(i * th, t16), :], strip1, sem1
    )
    d1.start()
    # s2 strip: branch rows [start2, start2+r2) covering the whole output
    # strip (rows outside clamp to the edge rows, which are resident).
    # start is rounded DOWN to the sublane tile (Mosaic requires dynamic
    # slice offsets in tiled dims to be 8-aligned); r2 carries +8 slack.
    start2 = (
        jnp.clip(
            ((i * th - HALO) * (h2 - 1) // (h - 1)) // 8, 0, (h2 - r2) // 8
        ).astype(jnp.int32)
        * 8  # outermost so Mosaic can PROVE the tiled-dim offset divisible
    )
    d2 = pltpu.make_async_copy(
        s2_hbm.at[b, :, pl.ds(start2, r2), :], strip2, sem2
    )
    d2.start()
    d1.wait()
    d2.wait()

    def up(branch_vmem, hk, wk, lx_ref, start, rows):
        """(8, rows, wkp) branch planes -> (8, t16, wp) upsampled: dynamic
        row-lerp matmul then static lane-lerp matmul (both MXU)."""
        ly = _row_lerp_matrix(i, th, hk, h, start, rows)  # (t16, rows)
        lx = lx_ref[:]  # (wk, wp)
        outs = []
        for c in range(8):
            rowsv = branch_vmem[c].astype(f32)  # (rows, wkp)
            t = jax.lax.dot_general(
                ly, rowsv, (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )  # (t16, wkp)
            outs.append(
                jax.lax.dot_general(
                    t[:, :wk], lx, (((1,), (0,)), ((), ())),
                    preferred_element_type=f32,
                )
            )  # (t16, wp)
        return outs

    u2 = up(strip2, h2, w2, lx2_ref, start2, strip2.shape[1])
    u3 = up(s3_ref[0], h3, w3, lx3_ref, jnp.int32(0), s3_ref.shape[2])
    u4 = up(s4_ref[0], h4, w4, lx4_ref, jnp.int32(0), s4_ref.shape[2])

    inside, zero = _inside_mask(i, th, h, w, wp)

    def plane(c):
        x = strip1[c].astype(f32) + u2[c] + u3[c] + u4[c]
        if mp:  # XLA path downcasts s0 before its selu (models/aliked.py)
            x = x.astype(jnp.bfloat16).astype(f32)
        return x

    s = _tail_planes([plane(c) for c in range(8)], w_ref, inside, zero, mp)
    out_ref[0] = s[HALO : HALO + th]


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


@functools.partial(
    jax.jit, static_argnames=("mp", "tile_rows", "interpret")
)
def score_head_pallas_lazy(
    sh_params,
    s1c: jnp.ndarray,
    s2c: jnp.ndarray,
    s3c: jnp.ndarray,
    s4c: jnp.ndarray,
    mp: bool = True,
    tile_rows: int = 16,
    interpret: bool = False,
) -> jnp.ndarray:
    """The ENTIRE score head after the per-branch 1x1 matmuls, fused: takes
    the four 8-channel partial sums at their NATIVE resolutions (s1c
    (B,8,H,W), s2c (B,8,H/2,W/2), s3c (B,8,H/8,W/8), s4c (B,8,H/32,W/32),
    channel-plane fp32) and performs the align_corners upsampling IN the
    kernel — a dynamic row-lerp matmul plus a static lane-lerp matmul per
    strip per branch — followed by the three 3x3 convs + sigmoid. The
    full-resolution upsampled partials (3x 24 MB/img fp32 in the XLA
    path, models/aliked.py::_dense_branches) never exist in HBM.

    Returns the (B, H, W) fp32 score map. Upsample weights identical to
    ``models/aliked._lerp_matrix``; accumulation fp32 (the XLA mp path
    rounds each lerp einsum to bf16 — agreement within the mp envelope)."""
    b, c8, h, w = s1c.shape
    assert c8 == 8
    h2, w2 = s2c.shape[2:]
    h3, w3 = s3c.shape[2:]
    h4, w4 = s4c.shape[2:]
    th = tile_rows
    n_h = -(-h // th)
    wp = -(-w // 128) * 128
    hp = n_h * th + 2 * HALO
    f32 = jnp.float32
    s1 = jnp.pad(
        s1c.astype(f32),
        ((0, 0), (0, 0), (HALO, hp - h - HALO), (0, wp - w)),
    )

    def padl(x):  # lane-pad a branch partial to the 128 tile
        wk = x.shape[3]
        return jnp.pad(
            x.astype(f32), ((0, 0), (0, 0), (0, 0), (0, -wk % 128))
        )

    from ..models.aliked import _lerp_matrix

    def lx(wk):  # (wk, wp) lane-lerp, zero past the true width
        m = _lerp_matrix(w, wk).T  # (wk, w)
        return jnp.pad(m, ((0, 0), (0, wp - w)))

    # span of branch rows one strip touches (+2 lerp ring, +8 tile-align
    # slack for the rounded-down dynamic start)
    r2 = -(-(int((th + 2 * HALO) * (h2 - 1) / (h - 1)) + 4 + 8) // 8) * 8
    wflat = _pack_weights(sh_params, mp)
    kern = functools.partial(
        _score_lazy_kernel, th=th, mp=mp, h=h, w=w, h2=h2, w2=w2,
        h3=h3, w3=w3, h4=h4, w4=w4, r2=r2,
    )
    whole = lambda a: pl.BlockSpec(
        a.shape, lambda bb, ii: tuple(0 for _ in a.shape),
        memory_space=pltpu.VMEM,
    )
    s3p, s4p = padl(s3c), padl(s4c)
    lx2, lx3, lx4 = lx(w2), lx(w3), lx(w4)
    out = pl.pallas_call(
        kern,
        grid=(b, n_h),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            whole(lx2), whole(lx3), whole(lx4),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (1, *s3p.shape[1:]), lambda bb, ii: (bb, 0, 0, 0)
            ),
            pl.BlockSpec(
                (1, *s4p.shape[1:]), lambda bb, ii: (bb, 0, 0, 0)
            ),
        ],
        out_shape=jax.ShapeDtypeStruct((b, n_h * th, wp), f32),
        out_specs=pl.BlockSpec((1, th, wp), lambda bb, ii: (bb, ii, 0)),
        scratch_shapes=[
            pltpu.VMEM((8, th + 2 * HALO, wp), f32),
            pltpu.VMEM((8, r2, -(-w2 // 128) * 128), f32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(wflat, lx2, lx3, lx4, s1, padl(s2c), s3p, s4p)
    return out[:, :h, :w]


def score_head_lazy_ok(h: int, w: int) -> bool:
    """Gate for the fused lazy score head in ALIKED composition (branch
    strides 2/8/32): sublane-tileable branch heights need h % 256 == 0;
    width bound as in ``score_head_cplane_ok``."""
    return h % 256 == 0 and h >= 512 and 128 <= w <= 2048
