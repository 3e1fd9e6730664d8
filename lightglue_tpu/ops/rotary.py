"""Rotary (learnable-Fourier) positional encoding primitives.

Math parity with reference lightglue/lightglue.py:58-81: the encoding is a
stack ``(cos, sin)`` of a learned linear projection of the (normalized)
keypoint positions, each channel repeated twice (``repeat_interleave(2)``),
and applied to q/k as ``t*cos + rotate_half(t)*sin`` with interleaved-pair
rotation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import nn


def rotate_half(t: jnp.ndarray) -> jnp.ndarray:
    """Interleaved-pair rotation: (x1, x2) -> (-x2, x1) over the last axis
    (reference: lightglue/lightglue.py:58-61)."""
    x = t.reshape(*t.shape[:-1], -1, 2)
    x1 = x[..., 0]
    x2 = x[..., 1]
    return jnp.stack((-x2, x1), axis=-1).reshape(t.shape)


def apply_rotary(enc: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Apply a cached rotary encoding ``enc = (2, ..., N, head_dim)``
    (cos at enc[0], sin at enc[1]) to ``t`` (reference: lightglue.py:64-65)."""
    cos, sin = enc[0], enc[1]
    return t * cos.astype(t.dtype) + rotate_half(t) * sin.astype(t.dtype)


def fourier_posenc_init(key, m_dim: int, f_dim: int, gamma: float = 1.0) -> nn.Params:
    """Learnable Fourier features W_r: R^M -> R^{F/2}, N(0, gamma^-2)
    (reference: lightglue.py:68-74)."""
    w = jax.random.normal(key, (m_dim, f_dim // 2)) * gamma**-2
    return {"Wr": {"w": w}}


def fourier_posenc(p: nn.Params, kpts: jnp.ndarray) -> jnp.ndarray:
    """Compute cached rotary frequencies for keypoints ``(B, N, M)``.

    Returns ``(2, B, 1, N, F)`` — (cos, sin) broadcastable over heads —
    matching the reference's ``emb.repeat_interleave(2, dim=-1)``
    (lightglue.py:76-81). Computed in fp32 for stable trig.
    """
    proj = kpts.astype(jnp.float32) @ p["Wr"]["w"].astype(jnp.float32)  # (B, N, F/2)
    cos, sin = jnp.cos(proj), jnp.sin(proj)
    emb = jnp.stack([cos, sin], axis=0)[:, :, None, :, :]  # (2, B, 1, N, F/2)
    return jnp.repeat(emb, 2, axis=-1)  # (2, B, 1, N, F)
