"""Fused iterative-NMS Pallas kernel.

``ops/sampling.simple_nms`` (the reference algorithm, superpoint.py:52-68)
is five separable max-pools plus mask logic over the full-resolution score
map. Composed from XLA ``reduce_window`` ops that is ten full-map HBM
round-trips and was measured at 1.32 ms/image for SuperPoint @1024x768 B16
on v5e — 37% of the whole extractor. This kernel runs the entire
suppression pipeline on one VMEM-resident row strip per grid step: the
score map is read from HBM exactly once and the suppressed map written
exactly once.

Design:
  * grid (B, H/TH); each step DMA-copies a (TH + 2*halo, W) strip into
    VMEM. halo = 5*r because each of the five sliding-max passes grows the
    inexact border ring by r; the central TH rows are exact.
  * the wrapper pre-pads rows/cols with -inf, reproducing the XLA
    ``reduce_window`` SAME padding semantics at image borders; a validity
    mask keeps padding rows out of the max masks (a -inf row is trivially
    equal to its own window max, but the reference's padding can never BE
    a detection, only lose to real pixels).
  * sliding max over 2r+1 is a separable log-doubling running max
    (4 shifted maxes per axis at r=4 instead of 2r).

Exact (max/compare arithmetic only — no rounding): agreement with the XLA
path is bitwise, asserted in tests/test_nms_pallas.py and on-TPU by
bench.py's kernel-agreement section.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")


def _shift(x: jnp.ndarray, d: int, axis: int) -> jnp.ndarray:
    """out[i] = x[i + d] (d may be negative), -inf fill."""
    if d == 0:
        return x
    n = x.shape[axis]
    if d > 0:
        body = jax.lax.slice_in_dim(x, d, n, axis=axis)
        pad = jnp.full_like(jax.lax.slice_in_dim(x, 0, d, axis=axis), NEG_INF)
        return jnp.concatenate([body, pad], axis=axis)
    body = jax.lax.slice_in_dim(x, 0, n + d, axis=axis)
    pad = jnp.full_like(jax.lax.slice_in_dim(x, 0, -d, axis=axis), NEG_INF)
    return jnp.concatenate([pad, body], axis=axis)


def _axis_winmax(x: jnp.ndarray, r: int, axis: int) -> jnp.ndarray:
    """Sliding max over window [i-r, i+r] along ``axis`` (-inf beyond the
    array): max of a forward and a backward running max of length r+1,
    each built by log-doubling. The -inf shift fill reproduces window
    clipping at the array edges exactly."""
    k = r + 1

    def run(sign: int) -> jnp.ndarray:
        f, ln = x, 1  # covers [i, i+sign*(ln-1)]
        while ln < k:
            step = min(ln, k - ln)
            f = jnp.maximum(f, _shift(f, sign * step, axis))
            ln += step
        return f

    return jnp.maximum(run(1), run(-1))


def _winmax(x: jnp.ndarray, r: int) -> jnp.ndarray:
    return _axis_winmax(_axis_winmax(x, r, 1), r, 0)


def _nms_kernel(s_hbm, out_ref, strip, sem, *, r, th, halo, h, w):
    i = pl.program_id(1)
    dma = pltpu.make_async_copy(
        s_hbm.at[pl.program_id(0), pl.ds(i * th, th + 2 * halo), :],
        strip, sem,
    )
    dma.start()
    dma.wait()
    s = strip[:]
    # image-interior mask: padded row p = i*th + local; real rows are
    # p in [halo, halo + h); real cols < w
    rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + i * th
    valid = (rows >= halo) & (rows < halo + h)
    if w < s.shape[1]:
        valid &= jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) < w

    zeros = jnp.zeros_like(s)
    m = (s == _winmax(s, r)) & valid
    for _ in range(2):
        supp = _winmax(jnp.where(m, 1.0, 0.0), r) > 0.0
        ss = jnp.where(supp, zeros, s)
        nm = (ss == _winmax(ss, r)) & valid
        m = m | (nm & ~supp)
    res = jnp.where(m, s, zeros)
    out_ref[0] = res[halo : halo + th, :]


@functools.partial(
    jax.jit, static_argnames=("nms_radius", "tile_rows", "interpret")
)
def simple_nms_pallas(
    scores: jnp.ndarray,
    nms_radius: int,
    tile_rows: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused simple_nms on (B, H, W) score maps; exact vs the XLA path."""
    b, h, w = scores.shape
    r = int(nms_radius)
    # five sliding-max passes each grow the inexact ring by r; round up to
    # the fp32 sublane tile (Mosaic requires DMA slice rows % 8 == 0)
    halo = -(-(5 * r) // 8) * 8
    th = min(tile_rows, max(8, -(-h // 8) * 8))
    n_h = -(-h // th)
    wp = -(-w // 128) * 128
    hp = n_h * th + 2 * halo
    s = jnp.pad(
        scores.astype(jnp.float32),
        ((0, 0), (halo, hp - h - halo), (0, wp - w)),
        constant_values=NEG_INF,
    )
    kern = functools.partial(_nms_kernel, r=r, th=th, halo=halo, h=h, w=w)
    out = pl.pallas_call(
        kern,
        grid=(b, n_h),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_shape=jax.ShapeDtypeStruct((b, n_h * th, wp), jnp.float32),
        out_specs=pl.BlockSpec((1, th, wp), lambda bb, ii: (bb, ii, 0)),
        scratch_shapes=[
            pltpu.VMEM((th + 2 * halo, wp), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(s)
    return out[:, :h, :w].astype(scores.dtype)


def nms_pallas_ok(h: int, w: int, nms_radius: int) -> bool:
    """Shape/radius gate, measured in FULL composition on v5e @1024x768:
    the kernel wins only at large radii (SuperPoint r=4: 2.60 vs 2.70
    ms/img full forward). At r=2 the XLA separable path is already cheap
    and the pallas_call disrupts fusion of the surrounding graph — DISK is
    a wash (9.11 vs 9.06) and ALIKED's dense+DKD composition REGRESSES
    8.5 ms/img (17.0 vs 8.5: the kernel between the score map and its
    top_k/patch-gather consumers defeats XLA's scheduling around the
    barrier). Isolated-kernel wins lie; gate on radius >= 3."""
    return h >= 64 and w >= 128 and 3 <= nms_radius <= 8
