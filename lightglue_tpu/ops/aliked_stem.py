"""Fused ALIKED block-1 Pallas kernel: ConvBlock (conv3x3(3->16) + BN +
SELU, conv3x3(16->16) + BN + SELU) at FULL resolution, plus the two
consumers of its output in the same pass — the 1x1 aggregation branch
(conv1: 16->32 + SELU -> y1) and the 2x2 average pool feeding block 2.

Composed from XLA ops (reference aliked.py:351-383 ConvBlock +
aliked.py:719-724 consumers), block 1 costs 1.91 ms/img at B8 1024x768
(v5e bf16): the 3- and 16-channel convs are so lane/depth-starved that
im2col materializes a 144-channel patch map (~216 MB/img) per conv, and
x1 (24 MB/img) round-trips HBM twice more for the pool and the 1x1. The
kernel's fundamental traffic is image-in (12.6 MB cplane bf16) +
y1-out (48 MB) + pooled-out (6 MB).

Design (grid = (B, H/TH), same strip scheme as ops/stem.py):

  * image arrives channel-plane (B, H, 8, W) — 3 real channels zero-padded
    to the fp32 sublane tile so the (3, 8, W) -> (24, W) tap reshape is
    tile-aligned;
  * conv1 packs (dy, ci) into a 24-deep contraction and dx into output
    lanes: one (24, 48) stationary matmul per row, two lane shifts
    recombine the dx phases; conv2 the same at (48, 48);
  * batch norm is applied as the XLA path does (x * scale + bias in the
    working dtype, nn.batch_norm), SELU in fp32 via the exp form (Mosaic
    has no expm1);
  * the y1 rows (16->32 matmul + SELU) and the 2x2 average pool both
    happen in VMEM before their single output writes.

Agreement vs the composed XLA ops: ~1e-5 fp32 / ~2e-2 bf16
(tests/test_aliked_stem.py; on-TPU tracked as
``aliked_stem_vs_xla_bf16`` in benchmarks/kernel_agreement.json).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stem import _shift_lanes

HALO = 2  # conv2 ring (1) + conv1 ring (1)

_SELU_ALPHA = 1.6732632423543772848170429916717
_SELU_SCALE = 1.0507009873554804934193349852946


def _selu_f32(x: jnp.ndarray) -> jnp.ndarray:
    return _SELU_SCALE * jnp.where(
        x > 0, x, _SELU_ALPHA * (jnp.exp(x) - 1.0)
    )


def _aliked_stem_kernel(
    w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref, wy_ref, img_hbm,
    y1_ref, xp_ref,
    a1, strip, sem,
    *,
    th: int, h: int, w: int, mp: bool, interp: bool,
):
    i = pl.program_id(1)
    f32 = jnp.float32
    cdt = jnp.bfloat16 if mp else f32
    wp = strip.shape[2]

    dma = pltpu.make_async_copy(
        img_hbm.at[pl.program_id(0), pl.ds(i * th, strip.shape[0]), :, :],
        strip, sem,
    )
    dma.start()
    dma.wait()

    w1 = w1_ref[:].astype(cdt)  # (24, 48): (dy, ci8) -> (dx, co)
    s1 = s1_ref[:].astype(cdt)  # (16, 1) BN scale
    b1 = b1_ref[:].astype(cdt)
    lane_ok = jax.lax.broadcasted_iota(jnp.int32, (16, wp), 1) < w

    def bn_selu(acc, scale, bias, ok):
        # match nn.batch_norm + selu dtype flow: conv accum rounded to the
        # working dtype, x*scale + bias in that dtype, SELU evaluated fp32
        v = acc.astype(cdt) * scale + bias
        v = _selu_f32(v.astype(f32))
        return jnp.where(ok, v, 0.0)

    # conv1: a1[ti] = BN+SELU(conv1) at global row g = i*th + ti - 1; rows
    # outside the image are zero (conv2 zero-pads its own input)
    for ti in range(th + 2):
        g = i * th + ti - 1
        x = strip[ti : ti + 3].reshape(24, wp).astype(cdt)
        y = jax.lax.dot_general(
            w1, x, (((0,), (0,)), ((), ())), preferred_element_type=f32
        )  # (48, wp) dx-phase-major
        o = (
            _shift_lanes(y[0:16], -1, interp)
            + y[16:32]
            + _shift_lanes(y[32:48], 1, interp)
        )
        row_ok = jnp.logical_and(g >= 0, g < h)
        a1[ti] = bn_selu(
            o, s1, b1, jnp.logical_and(row_ok, lane_ok)
        ).astype(cdt)

    w2 = w2_ref[:].astype(cdt)  # (48, 48)
    s2 = s2_ref[:].astype(cdt)
    b2 = b2_ref[:].astype(cdt)
    wy = wy_ref[:].astype(cdt)  # (16, 32) 1x1 conv1 branch

    prev = None
    for t in range(th):
        x = a1[t : t + 3].reshape(48, wp)
        y = jax.lax.dot_general(
            w2, x, (((0,), (0,)), ((), ())), preferred_element_type=f32
        )
        o = (
            _shift_lanes(y[0:16], -1, interp)
            + y[16:32]
            + _shift_lanes(y[32:48], 1, interp)
        )
        x1row = bn_selu(o, s2, b2, lane_ok)  # (16, wp) f32

        # y1 = selu(x1 @ wy) — the aggregation branch, written NHWC
        yb = jax.lax.dot_general(
            wy, x1row.astype(cdt), (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )  # (32, wp)
        y1_ref[0, t] = _selu_f32(
            yb.astype(cdt).astype(f32)
        ).T.astype(y1_ref.dtype)

        # 2x2 average pool over row pairs (XLA path: reduce_window add / 4
        # in the working dtype)
        if t % 2 == 0:
            prev = x1row.astype(cdt)
        else:
            p = (prev.astype(f32) + x1row) * 0.5
            pt = p.T.reshape(wp // 2, 2, 16)
            xp_ref[0, t // 2] = (
                jnp.sum(pt, axis=1) * 0.5
            ).astype(xp_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("mp", "tile_rows", "interpret")
)
def fused_aliked_stem(
    params: dict,
    image: jnp.ndarray,
    mp: bool = True,
    tile_rows: int = 16,
    interpret: bool = False,
):
    """ALIKED block1 + its consumers in one Pallas pass.

    params: {"block1": ConvBlock params (conv1/bn1/conv2/bn2),
    "conv1": 1x1 conv params} (models/aliked.init_params). image:
    (B, H, W, 3) in the working dtype (bfloat16 under mp). Returns
    (y1 (B, H, W, 32), x1_pooled (B, H//2, W//2, 16))."""
    b, h, w, c = image.shape
    assert c == 3 and h % 2 == 0 and w % 2 == 0
    dt = jnp.bfloat16 if mp else jnp.float32
    th = tile_rows
    n_h = -(-h // th)
    wp = -(-w // 128) * 128
    strip_rows = -(-(th + 2 * HALO) // 8) * 8
    hp = n_h * th + strip_rows
    img = jnp.pad(
        image.astype(dt).transpose(0, 1, 3, 2),  # (B, H, 3, W) cplane
        ((0, 0), (HALO, hp - h - HALO), (0, 8 - 3), (0, wp - w)),
    )

    bp = params["block1"]

    def _bn(bnp):
        inv = jax.lax.rsqrt(bnp["var"].astype(jnp.float32) + 1e-5)
        scale = bnp["scale"].astype(jnp.float32) * inv
        bias = bnp["bias"].astype(jnp.float32) - bnp["mean"].astype(
            jnp.float32
        ) * scale
        return scale.reshape(-1, 1), bias.reshape(-1, 1)

    # (dy, ci-padded-to-8) -> contraction rows; (dx, co) -> output rows
    w1 = jnp.zeros((3, 8, 3, 16), jnp.float32)
    w1 = w1.at[:, :3].set(bp["conv1"]["w"].transpose(0, 2, 1, 3))
    w1 = w1.reshape(24, 48)
    s1, b1 = _bn(bp["bn1"])
    w2 = bp["conv2"]["w"].transpose(0, 2, 1, 3).reshape(48, 48)
    s2, b2 = _bn(bp["bn2"])
    wy = params["conv1"]["w"].reshape(16, 32)

    kern = functools.partial(
        _aliked_stem_kernel, th=th, h=h, w=w, mp=mp, interp=interpret
    )
    whole = lambda a: pl.BlockSpec(
        a.shape, lambda bb, ii: tuple(0 for _ in a.shape),
        memory_space=pltpu.VMEM,
    )
    y1, xp = pl.pallas_call(
        kern,
        grid=(b, n_h),
        in_specs=[
            whole(w1), whole(s1), whole(b1), whole(w2), whole(s2),
            whole(b2), whole(wy),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((b, n_h * th, wp, 32), dt),
            jax.ShapeDtypeStruct((b, n_h * th // 2, wp // 2, 16), dt),
        ),
        out_specs=(
            pl.BlockSpec((1, th, wp, 32), lambda bb, ii: (bb, ii, 0, 0)),
            pl.BlockSpec(
                (1, th // 2, wp // 2, 16), lambda bb, ii: (bb, ii, 0, 0)
            ),
        ),
        scratch_shapes=[
            pltpu.VMEM((th + 2, 16, wp), dt),      # conv1 planes
            pltpu.VMEM((strip_rows, 8, wp), dt),   # image strip (cplane)
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(w1, s1, b1, w2, s2, b2, wy, img)
    return y1[:, :h, :w], xp[:, : h // 2, : w // 2]


def aliked_stem_ok(h: int, w: int) -> bool:
    """Shape gate (full-res image): strips must tile and the scratch
    (th+2)*16*W + strip 8*W stays small; W bound mirrors stem_pallas_ok."""
    return h % 16 == 0 and w % 2 == 0 and h >= 64 and 256 <= w <= 4096
