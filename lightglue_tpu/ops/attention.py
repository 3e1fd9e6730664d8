"""Attention primitives for the matcher (XLA path).

The reference dispatches between torch SDPA / flash-attn / einsum softmax
(lightglue/lightglue.py:97-137). On TPU the XLA compiler already fuses the
QK^T -> softmax -> PV chain efficiently at LightGlue's sequence lengths
(<= a few thousand keypoints, head_dim 64), so the baseline path is plain
jnp with explicit masking; a Pallas flash kernel (ops/flash.py) covers large-N
cases where the (N x N) score matrix should never hit HBM.

Masking convention: boolean masks mark VALID entries (True = attend), the
same convention as the reference's ``attn_mask``. Fully-masked query rows
produce zero output (reference achieves this with ``nan_to_num`` after SDPA,
lightglue.py:121,130).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

MASK_VALUE = -1e9  # finite -inf stand-in: exp(MASK_VALUE - max) underflows to 0


def _safe_softmax(sim: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Softmax in fp32 with finite masking already applied to ``sim``."""
    simf = sim.astype(jnp.float32)
    m = jnp.max(simf, axis=axis, keepdims=True)
    e = jnp.exp(simf - m)
    s = jnp.sum(e, axis=axis, keepdims=True)
    return e / jnp.maximum(s, 1e-30)


def sdpa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Scaled dot-product attention over (..., N, head_dim).

    ``mask``: broadcastable to (..., Nq, Nk), True = attend. Matches the
    reference einsum fallback (lightglue.py:131-137) with fp32 softmax.
    """
    scale = q.shape[-1] ** -0.5
    sim = jnp.einsum(
        "...id,...jd->...ij", q, k, preferred_element_type=jnp.float32
    ) * scale
    if mask is not None:
        sim = jnp.where(mask, sim, MASK_VALUE)
    attn = _safe_softmax(sim, axis=-1)
    out = jnp.einsum(
        "...ij,...jd->...id", attn.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    if mask is not None:
        # zero fully-masked query rows (parity with reference nan_to_num)
        row_valid = jnp.any(mask, axis=-1, keepdims=True)
        out = jnp.where(row_valid, out, 0.0)
    return out.astype(v.dtype)


def bidirectional_cross_attention(
    qk0: jnp.ndarray,
    qk1: jnp.ndarray,
    v0: jnp.ndarray,
    v1: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
):
    """LightGlue's shared-QK cross attention: ONE similarity matrix yields
    messages in both directions (reference CrossBlock, lightglue.py:216-225).

    qk0: (..., M, d), qk1: (..., N, d) — used as both queries and keys.
    mask: broadcastable to (..., M, N), True where both sides valid.
    Returns (m0, m1): messages into image0 (from v1) and image1 (from v0).
    """
    scale = qk0.shape[-1] ** -0.5
    sim = jnp.einsum(
        "...id,...jd->...ij", qk0, qk1, preferred_element_type=jnp.float32
    ) * scale
    if mask is not None:
        sim = jnp.where(mask, sim, MASK_VALUE)
    attn01 = _safe_softmax(sim, axis=-1)
    attn10 = _safe_softmax(sim, axis=-2)
    m0 = jnp.einsum(
        "...ij,...jd->...id", attn01.astype(v1.dtype), v1,
        preferred_element_type=jnp.float32,
    ).astype(v1.dtype)
    m1 = jnp.einsum(
        "...ij,...id->...jd", attn10.astype(v0.dtype), v0,
        preferred_element_type=jnp.float32,
    ).astype(v0.dtype)
    if mask is not None:
        m0 = jnp.where(jnp.any(mask, axis=-1, keepdims=True), m0, 0.0)
        m1 = jnp.where(jnp.any(mask, axis=-2)[..., None], m1, 0.0)
    return m0, m1
