"""Fused log-assignment + mutual-NN filtering Pallas kernels.

The XLA path (ops/assignment.py) materializes the (B, M+1, N+1) fp32
log-assignment matrix in HBM and re-reads it for two log-softmaxes and two
argmaxes (reference math: lightglue.py:265-318). This fused pair of kernels
never materializes the matrix:

  score[i, j] = 2*sim[i, j] - lse_row[i] - lse_col[j] + ls0[i] + ls1[j]

so row/column argmaxes factor: argmax_j score[i, :] = argmax_j
(2*sim[i, j] - lse_col[j] + ls1[j]) and symmetrically for columns.

* pass 1: strip-wise exact row log-sum-exp + flash-style running column
  log-sum-exp (masked via additive biases).
* pass 2: recompute the similarity strips and reduce row/column argmax +
  max score values directly.

The cheap mutual-consistency + threshold tail (reference
lightglue.py:302-318) runs in XLA on (B, M)/(B, N) vectors. The dustbin
row/column never participates in filter_matches (it is sliced off,
lightglue.py:304), so it is not computed here.
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


def _lse_kernel(q_ref, k_ref, bias0_ref, bias1_ref, lr_ref, lc_ref,
                cmax_ref, csum_ref, *, n_i: int):
    """Row LSE (exact per strip) + running column LSE.

    q_ref: (1, BQ, D) mdesc0 strip; k_ref: (1, N, D) mdesc1;
    bias0/bias1: (1, BQ)/(1, N) additive validity biases;
    lr_ref out: (1, 1, BQ); lc_ref out: (1, 1, N);
    scratch: cmax (1, N), csum (1, N).
    """
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        cmax_ref[...] = jnp.full_like(cmax_ref, NEG_INF)
        csum_ref[...] = jnp.zeros_like(csum_ref)

    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BQ, N)
    s = s + bias1_ref[0, 0, :][None, :] + bias0_ref[0, 0, :][:, None]
    m_row = jnp.max(s, axis=1)
    e = jnp.exp(s - m_row[:, None])
    lr_ref[0, 0] = m_row + jnp.log(jnp.maximum(jnp.sum(e, axis=1), 1e-30))

    # column side: rescale running sum to the new running max
    m_strip = jnp.max(s, axis=0)  # (N,)
    m_old = cmax_ref[0]
    m_new = jnp.maximum(m_old, m_strip)
    csum_ref[0] = csum_ref[0] * jnp.exp(m_old - m_new) + jnp.sum(
        jnp.exp(s - m_new[None, :]), axis=0
    )
    cmax_ref[0] = m_new

    @pl.when(i == n_i - 1)
    def _():
        lc_ref[0, 0] = cmax_ref[0] + jnp.log(jnp.maximum(csum_ref[0], 1e-30))


def _argmax_kernel(q_ref, k_ref, bias0_ref, bias1_ref, rterm_ref, cterm_ref,
                   m0_ref, v0_ref, m1_ref, v1_ref, cmax_ref, carg_ref,
                   *, n_i: int, block_q: int):
    """Row/column argmax of the factored score.

    rterm: (1, BQ) = ls0 - lse_row (row-constant part);
    cterm: (1, N) = ls1 - lse_col (column-constant part).
    Outputs: m0/v0 (1, 1, BQ) row argmax idx/value;
             m1/v1 (1, 1, N) column argmax idx/value (written at last strip).
    """
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        cmax_ref[...] = jnp.full_like(cmax_ref, NEG_INF)
        carg_ref[...] = jnp.zeros_like(carg_ref)

    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * 2.0
    s = s + bias1_ref[0, 0, :][None, :] + bias0_ref[0, 0, :][:, None]

    # row direction: argmax_j (2 sim + cterm[j]); final value adds rterm[i]
    t = s + cterm_ref[0, 0, :][None, :]
    m0_ref[0, 0] = jnp.argmax(t, axis=1).astype(jnp.int32)
    v0_ref[0, 0] = jnp.max(t, axis=1) + rterm_ref[0, 0, :]

    # column direction: running argmax_i (2 sim + rterm[i])
    u = s + rterm_ref[0, 0, :][:, None]
    u_max = jnp.max(u, axis=0)
    u_arg = jnp.argmax(u, axis=0).astype(jnp.int32) + i * block_q
    better = u_max > cmax_ref[0]
    cmax_ref[0] = jnp.where(better, u_max, cmax_ref[0])
    carg_ref[0] = jnp.where(better, u_arg, carg_ref[0])

    @pl.when(i == n_i - 1)
    def _():
        m1_ref[0, 0] = carg_ref[0]
        v1_ref[0, 0] = cmax_ref[0] + cterm_ref[0, 0, :]


def fused_filter_matches(
    mdesc0: jnp.ndarray,
    mdesc1: jnp.ndarray,
    z0: jnp.ndarray,
    z1: jnp.ndarray,
    threshold: float,
    mask0: Optional[jnp.ndarray] = None,
    mask1: Optional[jnp.ndarray] = None,
    block_q: int = 256,
    interpret: bool = False,
):
    """Matches from projected descriptors without materializing the score
    matrix. mdesc0/mdesc1: (B, M/N, D) ALREADY final_proj'ed and scaled by
    d^-0.25 (reference MatchAssignment, lightglue.py:287-296); z0/z1:
    (B, M/N) matchability logits.

    Returns (matches0, matches1, mscores0, mscores1) with the exact
    filter_matches semantics (lightglue.py:302-318).
    """
    b, m, d = mdesc0.shape
    n = mdesc1.shape[1]
    block_q = flash_ops.pick_block(m, block_q)
    n_i = m // block_q

    bias0 = jnp.zeros((b, m), jnp.float32) if mask0 is None else (
        (mask0.astype(jnp.float32) - 1.0) * -NEG_INF
    )
    bias1 = jnp.zeros((b, n), jnp.float32) if mask1 is None else (
        (mask1.astype(jnp.float32) - 1.0) * -NEG_INF
    )
    ls0 = jax.nn.log_sigmoid(z0.astype(jnp.float32))
    ls1 = jax.nn.log_sigmoid(z1.astype(jnp.float32))
    bias0_3d = bias0[:, None, :]
    bias1_3d = bias1[:, None, :]

    grid = (b, n_i)
    q_spec = pl.BlockSpec((1, block_q, d), lambda ib, i: (ib, i, 0),
                          memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((1, n, d), lambda ib, i: (ib, 0, 0),
                          memory_space=pltpu.VMEM)
    b0_spec = pl.BlockSpec((1, 1, block_q), lambda ib, i: (ib, 0, i),
                           memory_space=pltpu.VMEM)
    b1_spec = pl.BlockSpec((1, 1, n), lambda ib, i: (ib, 0, 0),
                           memory_space=pltpu.VMEM)
    row_out = pl.BlockSpec((1, 1, block_q), lambda ib, i: (ib, 0, i),
                           memory_space=pltpu.VMEM)
    col_out = pl.BlockSpec((1, 1, n), lambda ib, i: (ib, 0, 0),
                           memory_space=pltpu.VMEM)

    lse_row, lse_col = pl.pallas_call(
        functools.partial(_lse_kernel, n_i=n_i),
        grid=grid,
        in_specs=[q_spec, k_spec, b0_spec, b1_spec],
        out_specs=[row_out, col_out],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, m), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, n), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, n), jnp.float32),
            pltpu.VMEM((1, n), jnp.float32),
        ],
        interpret=interpret,
    )(mdesc0, mdesc1, bias0_3d, bias1_3d)
    lse_row = lse_row[:, 0]
    lse_col = lse_col[:, 0]

    rterm = ls0 - lse_row  # (B, M)
    cterm = ls1 - lse_col  # (B, N)
    if mask0 is not None:
        rterm = jnp.where(mask0, rterm, NEG_INF)
    if mask1 is not None:
        cterm = jnp.where(mask1, cterm, NEG_INF)
    m0, v0, m1, v1 = pl.pallas_call(
        functools.partial(_argmax_kernel, n_i=n_i, block_q=block_q),
        grid=grid,
        in_specs=[q_spec, k_spec, b0_spec, b1_spec, b0_spec, b1_spec],
        out_specs=[row_out, row_out, col_out, col_out],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, m), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, m), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, n), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, n), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, n), jnp.float32),
            pltpu.VMEM((1, n), jnp.int32),
        ],
        interpret=interpret,
    )(mdesc0, mdesc1, bias0_3d, bias1_3d, rterm[:, None, :],
      cterm[:, None, :])
    m0 = m0[:, 0]
    v1 = v1[:, 0]
    m1 = m1[:, 0]
    max0 = v0[:, 0] + 0.0  # (B, M) best score per row

    # mutual + threshold tail (reference lightglue.py:306-318)
    indices0 = jnp.arange(m, dtype=jnp.int32)[None]
    indices1 = jnp.arange(n, dtype=jnp.int32)[None]
    mutual0 = indices0 == jnp.take_along_axis(m1, m0, axis=1)
    mutual1 = indices1 == jnp.take_along_axis(m0, m1, axis=1)
    max0_exp = jnp.exp(max0)
    mscores0 = jnp.where(mutual0, max0_exp, 0.0)
    mscores1 = jnp.where(mutual1, jnp.take_along_axis(mscores0, m1, axis=1), 0.0)
    valid0 = mutual0 & (mscores0 > threshold)
    valid1 = mutual1 & jnp.take_along_axis(valid0, m1, axis=1)
    if mask0 is not None:
        valid0 &= mask0
        mscores0 = jnp.where(mask0, mscores0, 0.0)
    if mask1 is not None:
        valid1 &= mask1
        mscores1 = jnp.where(mask1, mscores1, 0.0)
    m0 = jnp.where(valid0, m0, -1)
    m1 = jnp.where(valid1, m1, -1)
    return m0, m1, mscores0, mscores1
