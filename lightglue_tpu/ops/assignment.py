"""Log-assignment head and match filtering (mask-aware, static shapes).

Reference math: lightglue/lightglue.py:265-318. The TPU versions take
explicit validity masks so that padded keypoint slots (static shapes under
jit) behave exactly like absent points: they can never win a match and do not
shift the softmax normalization of valid rows/columns.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .. import nn
from .attention import MASK_VALUE


def _masked_log_softmax(
    x: jnp.ndarray, mask: Optional[jnp.ndarray], axis: int
) -> jnp.ndarray:
    """log_softmax over the valid entries of ``axis``; invalid entries get
    MASK_VALUE-ish logs (they are masked downstream anyway)."""
    xf = x.astype(jnp.float32)
    if mask is not None:
        xf = jnp.where(mask, xf, MASK_VALUE)
    m = jnp.max(xf, axis=axis, keepdims=True)
    shifted = xf - jax.lax.stop_gradient(m)
    lse = jnp.log(jnp.sum(jnp.exp(shifted), axis=axis, keepdims=True))
    return shifted - lse


def sigmoid_log_double_softmax(
    sim: jnp.ndarray,
    z0: jnp.ndarray,
    z1: jnp.ndarray,
    mask0: Optional[jnp.ndarray] = None,
    mask1: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Log assignment matrix from similarity + matchability logits
    (reference: lightglue.py:265-277).

    sim: (B, M, N); z0: (B, M, 1); z1: (B, N, 1); masks (B, M)/(B, N) bool.
    Returns (B, M+1, N+1) with dustbin row/col = logsigmoid(-z).
    """
    b, m, n = sim.shape
    z0 = z0.astype(jnp.float32)
    z1 = z1.astype(jnp.float32)
    certainties = jax.nn.log_sigmoid(z0) + jax.nn.log_sigmoid(z1).transpose(0, 2, 1)
    pair_mask = None
    if mask0 is not None or mask1 is not None:
        m0 = mask0[:, :, None] if mask0 is not None else jnp.ones((b, m, 1), bool)
        m1 = mask1[:, None, :] if mask1 is not None else jnp.ones((b, 1, n), bool)
        pair_mask = m0 & m1
    scores0 = _masked_log_softmax(sim, pair_mask, axis=2)
    scores1 = _masked_log_softmax(sim, pair_mask, axis=1)
    inner = scores0 + scores1 + certainties
    if pair_mask is not None:
        inner = jnp.where(pair_mask, inner, MASK_VALUE)
    scores = jnp.zeros((b, m + 1, n + 1), jnp.float32)
    scores = scores.at[:, :m, :n].set(inner)
    scores = scores.at[:, :-1, -1].set(jax.nn.log_sigmoid(-z0[..., 0]))
    scores = scores.at[:, -1, :-1].set(jax.nn.log_sigmoid(-z1[..., 0]))
    return scores


def match_assignment_init(key, dim: int) -> nn.Params:
    k1, k2 = jax.random.split(key)
    return {
        "matchability": nn.linear_init(k1, dim, 1),
        "final_proj": nn.linear_init(k2, dim, dim),
    }


def match_assignment(
    p: nn.Params,
    desc0: jnp.ndarray,
    desc1: jnp.ndarray,
    mask0: Optional[jnp.ndarray] = None,
    mask1: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Assignment scores from descriptors (reference: lightglue.py:287-296).

    Returns (scores (B, M+1, N+1) fp32, sim (B, M, N))."""
    mdesc0 = nn.linear(p["final_proj"], desc0)
    mdesc1 = nn.linear(p["final_proj"], desc1)
    d = mdesc0.shape[-1]
    inv = d**-0.25
    sim = jnp.einsum(
        "bmd,bnd->bmn", mdesc0 * inv, mdesc1 * inv,
        preferred_element_type=jnp.float32,
    )
    z0 = nn.linear(p["matchability"], desc0)
    z1 = nn.linear(p["matchability"], desc1)
    scores = sigmoid_log_double_softmax(sim, z0, z1, mask0, mask1)
    return scores, sim


def get_matchability(p: nn.Params, desc: jnp.ndarray) -> jnp.ndarray:
    """Sigmoid matchability per point (reference: lightglue.py:298-299)."""
    return jax.nn.sigmoid(
        nn.linear(p["matchability"], desc).astype(jnp.float32)
    )[..., 0]


def filter_matches(
    scores: jnp.ndarray,
    th: float,
    mask0: Optional[jnp.ndarray] = None,
    mask1: Optional[jnp.ndarray] = None,
):
    """Mutual-nearest match extraction from a (B, M+1, N+1) log-assignment
    (reference: lightglue.py:302-318). Static shapes: returns per-point
    arrays; compact (K, 2) match lists are produced host-side
    (pipeline.compact_matches).

    Returns (m0 (B,M) int32, m1 (B,N) int32, mscores0 (B,M), mscores1 (B,N)).
    """
    inner = scores[:, :-1, :-1]
    max0 = jnp.max(inner, axis=2)
    m0 = jnp.argmax(inner, axis=2).astype(jnp.int32)
    m1 = jnp.argmax(inner, axis=1).astype(jnp.int32)
    indices0 = jnp.arange(m0.shape[1], dtype=jnp.int32)[None]
    indices1 = jnp.arange(m1.shape[1], dtype=jnp.int32)[None]
    mutual0 = indices0 == jnp.take_along_axis(m1, m0, axis=1)
    mutual1 = indices1 == jnp.take_along_axis(m0, m1, axis=1)
    max0_exp = jnp.exp(max0.astype(jnp.float32))
    mscores0 = jnp.where(mutual0, max0_exp, 0.0)
    mscores1 = jnp.where(mutual1, jnp.take_along_axis(mscores0, m1, axis=1), 0.0)
    valid0 = mutual0 & (mscores0 > th)
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
