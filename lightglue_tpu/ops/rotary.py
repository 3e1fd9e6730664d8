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
    """Apply a cached HALF-layout rotary encoding ``enc = (2, ..., N, F/2)``
    (cos at enc[0], sin at enc[1], one entry per channel PAIR) to
    interleaved-layout ``t`` (reference: lightglue.py:64-65; the reference
    materializes repeat_interleave(2)'d cos/sin — this computes the exact
    same per-pair formula without the doubled tables, bit-identically:
    out[2i] = t[2i]*c_i - t[2i+1]*s_i; out[2i+1] = t[2i+1]*c_i + t[2i]*s_i).
    """
    cos = enc[0].astype(t.dtype)[..., None]
    sin = enc[1].astype(t.dtype)[..., None]
    x = t.reshape(*t.shape[:-1], -1, 2)
    x1 = x[..., 0:1]
    x2 = x[..., 1:2]
    o = jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
    )
    return o.reshape(t.shape)


def apply_rotary_deint(enc: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Rotary application for DEINTERLEAVED-pair q/k layout: ``t``'s last
    axis holds [x1-halves | x2-halves] instead of interleaved pairs.

    Attention scores are invariant under any fixed permutation applied to
    BOTH q and k head channels, so when the Wqkv projection's output
    columns are pre-permuted into this layout (see
    models/lightglue.py::_deint_qkv_params) the rotation becomes pure
    half-width elementwise math + one concat — no interleave shuffle at
    all (the rotate_half lane shuffle costs ~0.2 ms/pair over 9 layers on
    v5e). enc: (2, ..., N, F/2) half-layout cos/sin."""
    cos = enc[0].astype(t.dtype)
    sin = enc[1].astype(t.dtype)
    h = t.shape[-1] // 2
    x1 = t[..., :h]
    x2 = t[..., h:]
    return jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
    )


def fourier_posenc_init(key, m_dim: int, f_dim: int, gamma: float = 1.0) -> nn.Params:
    """Learnable Fourier features W_r: R^M -> R^{F/2}, N(0, gamma^-2)
    (reference: lightglue.py:68-74)."""
    w = jax.random.normal(key, (m_dim, f_dim // 2)) * gamma**-2
    return {"Wr": {"w": w}}


def fourier_posenc(p: nn.Params, kpts: jnp.ndarray) -> jnp.ndarray:
    """Compute cached rotary frequencies for keypoints ``(B, N, M)``.

    Returns ``(2, B, 1, N, F/2)`` — (cos, sin) broadcastable over heads, in
    HALF layout (one entry per channel pair). The reference materializes
    ``emb.repeat_interleave(2, dim=-1)`` (lightglue.py:76-81);
    apply_rotary/apply_rotary_deint consume the half tables directly with
    bit-identical results. Computed in fp32 for stable trig."""
    proj = kpts.astype(jnp.float32) @ p["Wr"]["w"].astype(jnp.float32)  # (B, N, F/2)
    cos, sin = jnp.cos(proj), jnp.sin(proj)
    return jnp.stack([cos, sin], axis=0)[:, :, None, :, :]  # (2, B, 1, N, F/2)
