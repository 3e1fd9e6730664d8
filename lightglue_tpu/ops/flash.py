"""Pallas TPU attention kernels.

Replaces the reference's torch-SDPA/flash-attn dispatch (lightglue.py:97-137)
with TPU-native kernels. The XLA fallback in ops/attention.py materializes the
(B, H, N, N) fp32 score tensor in HBM — at batch 32 x 1024 keypoints that is
~0.5 GB per attention and the matcher becomes HBM-bandwidth-bound. These
kernels keep each query block's score row strip in VMEM only.

Design ("strip-softmax" rather than online-softmax): LightGlue sequences are
short (<= a few thousand keypoints), so the full K/V of one (batch, head) fits
comfortably in VMEM (N=4096: K+V bf16 = 1 MB). Each grid step loads one query
block, computes the full (BQ, N) score strip in fp32 VMEM, does an exact
masked softmax over the strip, and multiplies into V — no second pass, no
rescaling, exact results. Grid = (B, H, N/BQ).

The bidirectional cross-attention (reference CrossBlock shared-QK trick,
lightglue.py:216-225) reuses the same kernel twice with roles swapped; the
score strip is recomputed rather than stored (FLOPs are cheaper than HBM).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LANES = 128
ONES_COL = 64  # lane holding the softmax denominator in the augmented V


def pick_block(n: int, block: int) -> int:
    """Largest power-of-two fraction of ``block`` that divides ``n`` (n
    itself if smaller): keeps any multiple-of-128 length (e.g. 384, 640)
    tileable instead of raising when n % block != 0."""
    block = min(block, n)
    while n % block:
        block //= 2
    return max(block, 1)


def _augment_v(v):
    """(B, H, N, D<=64) -> (B, H, N, 128) = [v | ones@64 | zeros]: the PV
    matmul then computes the softmax sum on the MXU instead of a VPU pass."""
    b, h, n, d = v.shape
    assert d <= ONES_COL
    parts = [v]
    if d < ONES_COL:
        parts.append(jnp.zeros((b, h, n, ONES_COL - d), v.dtype))
    parts.append(jnp.ones((b, h, n, 1), v.dtype))
    parts.append(jnp.zeros((b, h, n, LANES - ONES_COL - 1), v.dtype))
    return jnp.concatenate(parts, axis=-1)


LOG2E = 1.4426950408889634  # 1/ln(2): exp(x) == exp2(x * LOG2E)
SHIFT_CLAMP = 100.0  # max exp2 argument after shift (2^100 ~ 1e30, safe sums)


def _attn_kernel_shift(q_ref, k_ref, v_ref, kbias_ref, o_ref, *,
                       shift2: float, has_mask: bool):
    """Fixed-shift softmax variant: softmax is shift-invariant, so a CONSTANT
    shift replaces the per-row max — removing the max reduction pass over the
    (BQ, N) strip entirely. Scores are handled in the log2 domain (scale *
    LOG2E folded into q by the caller) so the transcendental is a bare exp2.
    A clamp bounds the exp2 argument, trading exactness above
    ``shift + ~70`` nats (astronomically confident scores) for overflow
    safety. Underflow: rows whose max score is ~85 nats below ``shift``
    collapse to zero weight — far outside trained matcher score ranges
    (|s| <~ 30, reference lightglue.py score head semantics).
    """
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # log2-domain scores
    if has_mask:
        s = s + kbias_ref[0, 0, :][None, :]
    e = jnp.exp2(jnp.minimum(s - shift2, SHIFT_CLAMP))
    l = jnp.sum(e, axis=1, keepdims=True)
    o = jax.lax.dot_general(
        e.astype(v_ref.dtype), v_ref[0, 0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) / jnp.maximum(l, 1e-30)
    o_ref[0, 0] = o.astype(o_ref.dtype)


def _attn_kernel_4d(q_ref, k_ref, v_ref, kbias_ref, o_ref, *, scale: float,
                    has_mask: bool, fast: bool = False):
    """One query block vs full K/V for one (batch, head).

    q_ref: (1, 1, BQ, D); k_ref/v_ref: (1, 1, N, D); kbias_ref: (1, 1, N)
    fp32 additive bias (0=valid, NEG_INF=masked) [absent when
    has_mask=False]; o_ref: (1, 1, BQ, D).
    Loads index the leading block-dims directly (ref.at views trigger a
    Mosaic memref-slice bug for 64-lane bf16 blocks).

    VPU economy: the (BQ, N) strip is touched by exactly max / sub / exp /
    sum (+ one where if masked); the softmax scale is folded into q and the
    1/l normalization is applied to the (BQ, D) output after the PV matmul.
    """
    strip_t = jnp.bfloat16 if fast else jnp.float32
    q = q_ref[0, 0] * jnp.asarray(scale, q_ref.dtype)
    k = k_ref[0, 0]
    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,  # Mosaic requires 32-bit acc
    ).astype(strip_t)  # bf16 strip doubles VPU lane throughput in fast mode
    if has_mask:
        # additive bias (0 for valid, NEG_INF for invalid): one VPU add —
        # a jnp.where over the strip lowers much slower on Mosaic
        s = s + kbias_ref[0, 0, :][None, :].astype(strip_t)
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    l = jnp.sum(e.astype(jnp.float32), axis=1, keepdims=True)
    o = jax.lax.dot_general(
        e.astype(v_ref.dtype), v_ref[0, 0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) / jnp.maximum(l, 1e-30)
    if has_mask:
        # zero rows whose keys were all masked (reference nan_to_num parity);
        # all-masked rows have s==NEG_INF => e==1 => o==mean(v) pre-guard.
        # any key valid <=> max bias == 0
        any_valid = jnp.max(kbias_ref[0, 0, :]) >= 0.0
        o = jnp.where(any_valid, o, 0.0)
    o_ref[0, 0] = o.astype(o_ref.dtype)


def flash_sdpa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    k_valid: Optional[jnp.ndarray] = None,
    block_q: int = 256,
    interpret: bool = False,
    fast: bool = False,
    shift: Optional[float] = None,
) -> jnp.ndarray:
    """Scaled dot-product attention via the strip-softmax Pallas kernel.

    q: (B, H, Nq, D); k, v: (B, H, Nk, D); k_valid: (B, Nk) bool (True=keep).
    ``fast=False``: exact fp32 softmax. ``fast=True``: bf16 score strip
    (2x VPU throughput; attention-weight error ~0.4% — same precision class
    as the reference's fp16 flash path, lightglue.py:118-120).
    ``shift``: constant softmax shift (in nats) replacing the per-row max —
    one fewer VPU reduction over the N^2 strip; exact for scores within
    ~(shift-85, shift+70), see _attn_kernel_shift.
    Returns (B, H, Nq, D) in q.dtype.
    """
    b, h, nq, d = q.shape
    nk = k.shape[2]
    block_q = pick_block(nq, block_q)
    has_mask = k_valid is not None
    scale = d**-0.5

    grid = (b, h, nq // block_q)
    if shift is not None:
        # log2-domain: fold scale * LOG2E into q (free: q is elementwise
        # scaled anyway), bias stays additive
        q = q * jnp.asarray(scale * LOG2E, q.dtype)
        kernel = functools.partial(
            _attn_kernel_shift, shift2=shift * LOG2E, has_mask=has_mask
        )
        scale = 1.0
    else:
        kernel = functools.partial(
            _attn_kernel_4d, scale=scale, has_mask=has_mask, fast=fast
        )
    in_specs = [
        pl.BlockSpec(
            (1, 1, block_q, d), lambda ib, ih, iq: (ib, ih, iq, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, 1, nk, d), lambda ib, ih, iq: (ib, ih, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, 1, nk, d), lambda ib, ih, iq: (ib, ih, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    operands = [q, k, v]
    if has_mask:
        in_specs.append(
            pl.BlockSpec(
                (1, 1, nk), lambda ib, ih, iq: (ib, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        kbias = (k_valid.astype(jnp.float32) - 1.0) * -NEG_INF
        operands.append(kbias[:, None, :])
    else:
        # keep kernel signature uniform: kmask_ref slot unused
        masked_kernel = kernel

        def kernel(q_ref, k_ref, v_ref, o_ref):
            masked_kernel(q_ref, k_ref, v_ref, None, o_ref)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d), lambda ib, ih, iq: (ib, ih, iq, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(*operands)


def flash_cross_pair(
    qk0: jnp.ndarray,
    qk1: jnp.ndarray,
    v0: jnp.ndarray,
    v1: jnp.ndarray,
    valid0: Optional[jnp.ndarray] = None,
    valid1: Optional[jnp.ndarray] = None,
    block_q: int = 256,
    interpret: bool = False,
    fast: bool = False,
    shift: Optional[float] = None,
):
    """Bidirectional shared-QK cross attention via two strip-softmax passes
    (reference semantics: lightglue.py:216-225 — one similarity matrix,
    row-softmax messages for image0, col-softmax messages for image1).

    Returns (m0 (B,H,M,D), m1 (B,H,N,D)).
    """
    m0 = flash_sdpa(qk0, qk1, v1, valid1, block_q, interpret, fast, shift)
    m1 = flash_sdpa(qk1, qk0, v0, valid0, block_q, interpret, fast, shift)
    return m0, m1
