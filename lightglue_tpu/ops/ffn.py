"""Fused FFN (concat -> Linear -> LayerNorm -> GELU -> Linear -> residual)
Pallas kernel.

The reference transformer block ends with ``x + ffn(cat[x, message])``
(lightglue/lightglue.py:152-157,170-172). Unfused, XLA round-trips the
(B, N, 2D) hidden activation through HBM between the two matmuls, and the
fp32 LayerNorm forces extra dtype conversions around the bf16 MXU matmuls.
This kernel keeps one row-block resident in VMEM: both matmuls hit the MXU
with fp32 accumulation, and LayerNorm+GELU run on the VPU in fp32 registers
between them — zero intermediate HBM traffic.

The concat is algebraic, not physical: cat[x, m] @ W1 == x @ W1[:D] + m @ W1[D:].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flash import pick_block


def _erf(x):
    """Abramowitz & Stegun 7.1.26 rational erf approximation (max abs error
    1.5e-7) — Mosaic has no erf lowering; exp it has."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _ffn_kernel(x_ref, m_ref, w1x_ref, w1m_ref, b1_ref, g_ref, be_ref,
                w2_ref, b2_ref, o_ref, *, eps: float):
    x = x_ref[0]
    m = m_ref[0]
    s = jax.lax.dot_general(
        x, w1x_ref[:, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s + jax.lax.dot_general(
        m, w1m_ref[:, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s + b1_ref[0, :][None, :]
    mean = jnp.mean(s, axis=-1, keepdims=True)
    c = s - mean
    var = jnp.mean(c * c, axis=-1, keepdims=True)
    h = c * jax.lax.rsqrt(var + eps)
    h = h * g_ref[0, :][None, :] + be_ref[0, :][None, :]
    # erf GELU (torch nn.GELU default; see nn.gelu) — polynomial erf, since
    # Mosaic lacks the primitive. 1.5e-7 erf error ≈ 1e-7 GELU error, far
    # below the bf16 output rounding.
    h = 0.5 * h * (1.0 + _erf(h * 0.7071067811865476))
    y = jax.lax.dot_general(
        h.astype(w2_ref.dtype), w2_ref[:, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    y = y + b2_ref[0, :][None, :]
    o_ref[0] = (x.astype(jnp.float32) + y).astype(o_ref.dtype)


def fused_ffn_residual(
    x: jnp.ndarray,
    msg: jnp.ndarray,
    p: dict,
    block_q: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """x + FFN(cat[x, msg]) with FFN = lin1 -> LayerNorm -> GELU -> lin2.

    x, msg: (B, N, D); p: {"lin1": {w (2D,2D), b}, "ln": {scale, bias},
    "lin2": {w (2D,D), b}} (models/lightglue.py::_ffn_init layout).
    """
    b, n, d = x.shape
    bq = pick_block(n, block_q)
    w1 = p["lin1"]["w"]
    w1x = w1[:d].astype(x.dtype)
    w1m = w1[d:].astype(x.dtype)
    b1 = p["lin1"]["b"].astype(jnp.float32)[None, :]
    g = p["ln"]["scale"].astype(jnp.float32)[None, :]
    be = p["ln"]["bias"].astype(jnp.float32)[None, :]
    w2 = p["lin2"]["w"].astype(x.dtype)
    b2 = p["lin2"]["b"].astype(jnp.float32)[None, :]

    grid = (b, n // bq)
    row = lambda ib, iq: (ib, iq, 0)
    whole = lambda shape: pl.BlockSpec(
        shape, lambda ib, iq: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_ffn_kernel, eps=1e-5),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, d), row, memory_space=pltpu.VMEM),
            whole(w1x.shape),
            whole(w1m.shape),
            whole(b1.shape),
            whole(g.shape),
            whole(be.shape),
            whole(w2.shape),
            whole(b2.shape),
        ],
        out_specs=pl.BlockSpec((1, bq, d), row, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, msg, w1x, w1m, b1, g, be, w2, b2)
