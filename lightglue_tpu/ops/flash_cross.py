"""Fused bidirectional cross-attention Pallas kernel.

LightGlue's CrossBlock computes ONE similarity matrix and softmaxes it in
both directions (reference lightglue.py:216-225). The naive TPU mapping runs
two independent attention passes — two QK^T matmuls and two full softmax
exp-chains over the (M, N) strip. This kernel computes the strip once and
derives both directions from a single exponentiation:

  row direction (messages into image0):
      e_r = exp(s - m_row)                    (exact per-row shift)
  column direction (messages into image1):
      e_c = e_r * exp(m_row - m_strip) * valid0   (<= 1, no overflow)
  with classic flash-style running rescale of the column accumulator as the
  per-strip shift m_strip grows across query blocks.

VPU economy: the only full-strip passes are max / sub+exp / one multiply /
casts. Row and column SUMS ride the MXU for free: V is augmented with a
ones-column, so the PV matmul yields [unnormalized message | softmax sum]
in one shot (the head dim is padded to 128 lanes anyway).

Numerical note: the column softmax uses a per-(b,h) global shift (the max
over the whole similarity matrix) instead of per-column maxima. Columns whose
own max lies > ~80 below the global max underflow to zero weight — far
outside the score range of trained matchers (|s| <~ 30). The row direction
is exact.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import flash as flash_ops

NEG_INF = -1e30
LANES = 128


def _fused_cross_kernel(
    q0_ref,      # (1, 1, BQ, D)   query block of image0 (pre-scaled)
    k1_ref,      # (1, 1, N, D)    keys = qk1, full
    v0a_ref,     # (1, 1, BQ, LANES) ones-augmented v0 block
    v1a_ref,     # (1, 1, N, LANES)  ones-augmented v1, full
    bias0_ref,   # (1, 1, BQ)      additive row bias (0 valid / NEG_INF)
    bias1_ref,   # (1, 1, N)       additive col bias
    m0_ref,      # (1, 1, BQ, LANES) out: normalized messages into image0
    m1_ref,      # (1, 1, N, LANES)  out: normalized messages into image1
    acc_ref,     # scratch (N, LANES) f32: column accumulator [msg | l_col]
    mrun_ref,    # scratch (1, 1) f32: running strip max
    *,
    n_i: int,
    has_mask: bool,
):
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        mrun_ref[0, 0] = NEG_INF

    q = q0_ref[0, 0]
    k = k1_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BQ, N) fp32 strip
    if has_mask:
        s = s + bias1_ref[0, 0, :][None, :]

    m_row = jnp.max(s, axis=1, keepdims=True)          # (BQ, 1)
    e_r = jnp.exp(s - m_row)                            # STRIP PASS (exp)

    # --- row direction: exact softmax, sum via MXU ones-column ---
    pv = jax.lax.dot_general(
        e_r.astype(v1a_ref.dtype), v1a_ref[0, 0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BQ, LANES): [o_unnorm | l_row | ...]
    # l_row sits in the augmented ones column; divide the whole row by it.
    # The ones column divides to 1, harmless.
    l = pv[:, _ONES_COL:_ONES_COL + 1]
    m0 = pv / jnp.maximum(l, 1e-30)
    m0_ref[0, 0] = m0.astype(m0_ref.dtype)

    # --- column direction: strip-shifted weights, flash-style rescale ---
    m_strip = jnp.max(m_row)                            # scalar
    m_old = mrun_ref[0, 0]
    m_new = jnp.maximum(m_old, m_strip)
    mrun_ref[0, 0] = m_new
    # rescale previous accumulator (pass over (N, LANES), small vs strip)
    acc_ref[...] = acc_ref[...] * jnp.exp(m_old - m_new)
    # fold row-shift correction and row validity into a (BQ,1) factor
    f = jnp.exp(m_row - m_new)                          # (BQ, 1), <= 1
    if has_mask:
        f = f * (bias0_ref[0, 0, :][:, None] >= 0.0).astype(jnp.float32)
    e_c = e_r * f                                       # STRIP PASS (mul)
    acc_ref[...] += jax.lax.dot_general(
        e_c.astype(v0a_ref.dtype), v0a_ref[0, 0],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (N, LANES) += e_c^T @ v0a

    @pl.when(i == n_i - 1)
    def _():
        acc = acc_ref[...]
        lc = acc[:, _ONES_COL:_ONES_COL + 1]
        m1 = acc / jnp.maximum(lc, 1e-30)
        m1_ref[0, 0] = m1.astype(m1_ref.dtype)


def _single_pass_cross_kernel(
    q0_ref,      # (1, 1, BQ, D)   query block of image0 (log2-domain scaled)
    k1_ref,      # (1, 1, N, D)
    v0a_ref,     # (1, 1, BQ, LANES) ones-augmented v0 block
    v1a_ref,     # (1, 1, N, LANES)  ones-augmented v1, full
    bias0_ref,   # (1, 1, BQ)  additive row bias (0 valid / NEG_INF) or absent
    bias1_ref,   # (1, 1, N)   additive col bias
    m0_ref,      # (1, 1, BQ, LANES) out
    m1_ref,      # (1, 1, N, LANES)  out
    acc_ref,     # scratch (N, LANES) f32 (only touched when n_i > 1)
    *,
    n_i: int,
    shift2: float,
    has_mask: bool,
):
    """TRUE single-pass bidirectional cross attention.

    With a CONSTANT softmax shift (see flash.py::_attn_kernel_shift) the row
    and column softmaxes share one exponential: e = exp2(s - c). Both
    normalizer sums ride the MXU through the ones-column of the augmented V
    (e @ v1a for rows, e^T @ v0a for columns), so the ONLY VPU work over the
    (BQ, N) strip is the fused bias-add/clamp/exp2/cast map — no max pass,
    no rescale, no column-correction multiply (which the exact kernel needs,
    see _fused_cross_kernel). Invalid rows/columns carry NEG_INF bias, so
    they exponentiate to zero and drop out of both directions; their own
    outputs normalize to 0 via the guarded divide.
    """
    i = pl.program_id(2)
    s = jax.lax.dot_general(
        q0_ref[0, 0], k1_ref[0, 0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BQ, N) log2-domain scores
    if has_mask:
        s = s + bias0_ref[0, 0, :][:, None] + bias1_ref[0, 0, :][None, :]
    e = jnp.exp2(
        jnp.minimum(s - shift2, flash_ops.SHIFT_CLAMP)
    ).astype(v1a_ref.dtype)

    pv0 = jax.lax.dot_general(
        e, v1a_ref[0, 0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BQ, LANES): [message | l_row | ...]
    l_row = pv0[:, _ONES_COL:_ONES_COL + 1]
    m0_ref[0, 0] = (pv0 / jnp.maximum(l_row, 1e-30)).astype(m0_ref.dtype)

    pv1 = jax.lax.dot_general(
        e, v0a_ref[0, 0],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (N, LANES) = e^T @ v0a
    if n_i == 1:
        l_col = pv1[:, _ONES_COL:_ONES_COL + 1]
        m1_ref[0, 0] = (pv1 / jnp.maximum(l_col, 1e-30)).astype(m1_ref.dtype)
    else:
        @pl.when(i == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        acc_ref[...] += pv1

        @pl.when(i == n_i - 1)
        def _():
            acc = acc_ref[...]
            l_col = acc[:, _ONES_COL:_ONES_COL + 1]
            m1_ref[0, 0] = (acc / jnp.maximum(l_col, 1e-30)).astype(
                m1_ref.dtype
            )


_ONES_COL = 64  # lane index of the ones column inside the augmented V


def _augment_v(v: jnp.ndarray) -> jnp.ndarray:
    """(B, H, N, D<=64) -> (B, H, N, 128) = [v | ones | zeros]."""
    b, h, n, d = v.shape
    assert d <= _ONES_COL
    pad_to_ones = _ONES_COL - d
    ones = jnp.ones((b, h, n, 1), v.dtype)
    zeros_mid = jnp.zeros((b, h, n, pad_to_ones), v.dtype)
    zeros_end = jnp.zeros((b, h, n, LANES - _ONES_COL - 1), v.dtype)
    return jnp.concatenate([v, zeros_mid, ones, zeros_end], axis=-1)


def fused_cross_attention(
    qk0: jnp.ndarray,
    qk1: jnp.ndarray,
    v0: jnp.ndarray,
    v1: jnp.ndarray,
    valid0: Optional[jnp.ndarray] = None,
    valid1: Optional[jnp.ndarray] = None,
    block_q: int = 256,
    interpret: bool = False,
    shift: Optional[float] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bidirectional shared-QK cross attention, one strip pass.

    qk0: (B, H, M, D); qk1: (B, H, N, D); v0/v1 same leading dims.
    ``shift``: constant softmax shift (nats) — switches to the true
    single-pass kernel (one exp2 map for BOTH directions, sums on the MXU;
    see _single_pass_cross_kernel). None = exact max-based kernel.
    Returns (m0 (B,H,M,D), m1 (B,H,N,D)) in input dtype.
    """
    b, h, m, d = qk0.shape
    n = qk1.shape[2]
    if shift is not None:
        # big query blocks: the strip is written once, so the block size is
        # bounded only by VMEM (~6 MB fp32 strip budget); power of two so
        # pick_block can land on it
        cap = max(6 * 2**20 // (4 * n), 128)
        block_q = 1 << (cap.bit_length() - 1)
    block_q = flash_ops.pick_block(m, block_q)
    has_mask = valid0 is not None or valid1 is not None
    if has_mask:
        if valid0 is None:
            valid0 = jnp.ones((b, m), bool)
        if valid1 is None:
            valid1 = jnp.ones((b, n), bool)
    scale = d**-0.5
    if shift is not None:
        q0s = qk0 * jnp.asarray(scale * flash_ops.LOG2E, qk0.dtype)
    else:
        q0s = qk0 * jnp.asarray(scale, qk0.dtype)
    v0a = _augment_v(v0)
    v1a = _augment_v(v1)

    n_i = m // block_q
    grid = (b, h, n_i)
    if shift is not None:
        kernel = functools.partial(
            _single_pass_cross_kernel, n_i=n_i,
            shift2=shift * flash_ops.LOG2E, has_mask=has_mask,
        )
    else:
        kernel = functools.partial(
            _fused_cross_kernel, n_i=n_i, has_mask=has_mask
        )

    in_specs = [
        pl.BlockSpec((1, 1, block_q, d), lambda ib, ih, i: (ib, ih, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, n, d), lambda ib, ih, i: (ib, ih, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_q, LANES), lambda ib, ih, i: (ib, ih, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, n, LANES), lambda ib, ih, i: (ib, ih, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [q0s, qk1, v0a, v1a]
    if has_mask:
        bias0 = ((valid0.astype(jnp.float32) - 1.0) * -NEG_INF)[:, None, :]
        bias1 = ((valid1.astype(jnp.float32) - 1.0) * -NEG_INF)[:, None, :]
        in_specs += [
            pl.BlockSpec((1, 1, block_q), lambda ib, ih, i: (ib, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda ib, ih, i: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands += [bias0, bias1]
        kern = kernel
    else:
        def kern(q0_ref, k1_ref, v0a_ref, v1a_ref, m0_ref, m1_ref, *scratch):
            kernel(q0_ref, k1_ref, v0a_ref, v1a_ref, None, None,
                   m0_ref, m1_ref, *scratch)

    m0a, m1a = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, block_q, LANES),
                         lambda ib, ih, i: (ib, ih, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n, LANES), lambda ib, ih, i: (ib, ih, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, m, LANES), qk0.dtype),
            jax.ShapeDtypeStruct((b, h, n, LANES), qk0.dtype),
        ],
        scratch_shapes=(
            [pltpu.VMEM((n, LANES), jnp.float32)]
            if shift is not None
            else [
                pltpu.VMEM((n, LANES), jnp.float32),
                pltpu.SMEM((1, 1), jnp.float32),
            ]
        ),
        interpret=interpret,
    )(*operands)
    return m0a[..., :d], m1a[..., :d]
