"""Fully-fused cross-attention block Pallas kernel (shift-softmax variant).

The reference CrossBlock (lightglue/lightglue.py:201-230) is
``to_qk(x0/x1), to_v(x0/x1) -> one similarity matrix softmaxed both ways ->
to_out -> x + FFN(cat[x, message])`` per image. Composed from separate ops
that is ~12 HBM round-trips of (B, N, D) activations per layer; this kernel
runs the whole block in one Pallas program with grid (B, H), head axis
innermost:

  * each (b, h) step projects qk/v for BOTH images from the VMEM-resident
    x0/x1, computes the shared-QK similarity strip ONCE, exponentiates once
    (constant-shift softmax, see ops/flash.py::_attn_kernel_shift), and
    derives both direction messages with two MXU matmuls (softmax sums ride
    the ones-column of the augmented V, ops/flash_cross.py idiom);
  * per-head messages are pushed through the head's to_out slice
    (concat_h(m_h) @ Wo == sum_h m_h @ Wo[h]) into fp32 accumulators;
  * the final head appends the fused FFN (ops/ffn.py math) for both images
    and writes ``x + ffn(cat[x, message])``.

HBM traffic collapses to: read x0/x1 once per batch row, read weights,
write the two outputs once. VMEM bounds the un-blocked (M, N) strip, so the
kernel engages only for max(M, N) <= MAX_FUSED_N; larger problems use the
composed path (models/lightglue.py::cross_block).

Masking: validity rides additive NEG_INF biases folded into the strip before
the exp2, so masked points drop out of both softmax directions and their own
messages normalize to zero — no correction passes.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ffn import _erf
from .flash import LOG2E, NEG_INF, SHIFT_CLAMP
from .flash_cross import _ONES_COL, LANES

# (M, N) fp32 strip + bf16 exp copy + two fp32 accumulators must fit VMEM.
MAX_FUSED_N = 1024


def _ffn_rows(x, msg, w1x_ref, w1m_ref, b1_ref, g_ref, be_ref, w2_ref,
              b2_ref, eps):
    """ops/ffn.py::_ffn_kernel math on VMEM-resident rows."""
    f32 = jnp.float32
    s = jax.lax.dot_general(
        x, w1x_ref[:, :], (((1,), (0,)), ((), ())), preferred_element_type=f32
    )
    s = s + jax.lax.dot_general(
        msg, w1m_ref[:, :], (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    s = s + b1_ref[0, :][None, :]
    mean = jnp.mean(s, axis=-1, keepdims=True)
    c = s - mean
    var = jnp.mean(c * c, axis=-1, keepdims=True)
    h = c * jax.lax.rsqrt(var + eps)
    h = h * g_ref[0, :][None, :] + be_ref[0, :][None, :]
    h = 0.5 * h * (1.0 + _erf(h * 0.7071067811865476))
    y = jax.lax.dot_general(
        h.astype(w2_ref.dtype), w2_ref[:, :], (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    return x.astype(f32) + y + b2_ref[0, :][None, :]


def _project(x, w_ref, b_ref):
    y = jax.lax.dot_general(
        x, w_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b_ref[0, 0][None, :]
    return y


def _augment(v, n, dt):
    """(N, hd) fp32 -> (N, LANES) dt = [v | 0 | ones | 0] (zero-width
    segments skipped — Mosaic rejects 0-sized vectors)."""
    hd = v.shape[-1]
    parts = [v.astype(dt)]
    if hd < _ONES_COL:
        parts.append(jnp.zeros((n, _ONES_COL - hd), dt))
    parts.append(jnp.ones((n, 1), dt))
    if LANES - _ONES_COL - 1 > 0:
        parts.append(jnp.zeros((n, LANES - _ONES_COL - 1), dt))
    return jnp.concatenate(parts, axis=-1)


def _kernel(
    x0_ref, x1_ref,
    wqk_ref, bqk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
    w1x_ref, w1m_ref, b1_ref, g_ref, be_ref, w2_ref, b2_ref,
    bias0_ref, bias1_ref,
    o0_ref, o1_ref,
    acc0, acc1,
    *,
    num_heads: int, shift2: Optional[float], has_mask: bool, eps: float,
):
    h = pl.program_id(1)
    f32 = jnp.float32
    x0 = x0_ref[0]  # (M, D)
    x1 = x1_ref[0]  # (N, D)
    m, _ = x0.shape
    n, _ = x1.shape
    dt = x0.dtype

    qk0 = _project(x0, wqk_ref, bqk_ref).astype(dt)  # (M, hd), scale folded
    qk1 = _project(x1, wqk_ref, bqk_ref).astype(dt)  # (N, hd)
    v0a = _augment(_project(x0, wv_ref, bv_ref), m, dt)  # (M, LANES)
    v1a = _augment(_project(x1, wv_ref, bv_ref), n, dt)  # (N, LANES)

    s = jax.lax.dot_general(
        qk0, qk1, (((1,), (1,)), ((), ())), preferred_element_type=f32
    )  # (M, N) scores (log2 domain when shift2 is set)
    if has_mask:
        s = s + bias0_ref[0, 0, :][:, None] + bias1_ref[0, 0, :][None, :]
    if shift2 is not None:
        # single-exp constant-shift softmax shared by both directions
        e = jnp.exp2(jnp.minimum(s - shift2, SHIFT_CLAMP)).astype(dt)
        e_c = e
    else:
        # exact row softmax; column direction via the per-(b,h) global
        # shift (ops/flash_cross.py::_fused_cross_kernel semantics) — one
        # exp over the strip serves both directions
        m_row = jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s - m_row).astype(dt)
        f = jnp.exp(m_row - jnp.max(m_row))  # (M, 1), <= 1
        if has_mask:
            f = f * (bias0_ref[0, 0, :][:, None] >= 0.0).astype(f32)
        e_c = (e.astype(f32) * f).astype(dt)

    pv0 = jax.lax.dot_general(
        e, v1a, (((1,), (0,)), ((), ())), preferred_element_type=f32
    )  # (M, LANES): [msg0 | l_row | ...]
    l0 = pv0[:, _ONES_COL:_ONES_COL + 1]
    m0 = (pv0 / jnp.maximum(l0, 1e-30))[:, : wo_ref.shape[1]]
    if has_mask and shift2 is None:
        # all keys of image1 masked => uniform weights; reference zeroes
        # these messages (nan_to_num parity, lightglue.py:133-135)
        m0 = jnp.where(jnp.max(bias1_ref[0, 0, :]) >= 0.0, m0, 0.0)
    y0 = jax.lax.dot_general(
        m0.astype(dt), wo_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )  # (M, D)

    pv1 = jax.lax.dot_general(
        e_c, v0a, (((0,), (0,)), ((), ())), preferred_element_type=f32
    )  # (N, LANES) = e_c^T @ v0a
    l1 = pv1[:, _ONES_COL:_ONES_COL + 1]
    m1 = (pv1 / jnp.maximum(l1, 1e-30))[:, : wo_ref.shape[1]]
    if has_mask and shift2 is None:
        m1 = jnp.where(jnp.max(bias0_ref[0, 0, :]) >= 0.0, m1, 0.0)
    y1 = jax.lax.dot_general(
        m1.astype(dt), wo_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )  # (N, D)

    @pl.when(h == 0)
    def _init():
        acc0[...] = y0 + bo_ref[0][None, :]
        acc1[...] = y1 + bo_ref[0][None, :]

    @pl.when(h > 0)
    def _add():
        acc0[...] += y0
        acc1[...] += y1

    @pl.when(h == num_heads - 1)
    def _finish():
        args = (w1x_ref, w1m_ref, b1_ref, g_ref, be_ref, w2_ref, b2_ref, eps)
        o0_ref[0] = _ffn_rows(x0, acc0[...].astype(dt), *args).astype(
            o0_ref.dtype
        )
        o1_ref[0] = _ffn_rows(x1, acc1[...].astype(dt), *args).astype(
            o1_ref.dtype
        )


def fused_cross_block(
    p: dict,
    x0: jnp.ndarray,
    x1: jnp.ndarray,
    num_heads: int,
    mask0: Optional[jnp.ndarray] = None,
    mask1: Optional[jnp.ndarray] = None,
    shift: Optional[float] = None,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run a whole CrossBlock (reference lightglue.py:201-230) in one kernel.

    p: cross_attn params {"to_qk": {w (D,D), b}, "to_v": {w (D,D), b},
    "to_out": {w (D,D), b}, "ffn": {...}} (models/lightglue.py::
    _cross_block_init). x0: (B, M, D); x1: (B, N, D); mask0/1: (B, M)/(B, N)
    bool validity. ``shift``: constant softmax shift in nats — single exp2
    serves both directions. ``shift=None``: exact per-row max softmax for
    the row direction, per-(b,h) global shift for the column direction
    (ops/flash_cross.py numerics note) — still one exp over the strip plus
    one correction multiply.
    Returns the block outputs for both images, (B, M, D) and (B, N, D).
    """
    b, m, d = x0.shape
    n = x1.shape[1]
    hd = d // num_heads
    assert hd <= _ONES_COL
    dt = x0.dtype
    has_mask = mask0 is not None or mask1 is not None

    # fold sqrt(scale [* LOG2E]) into the SHARED qk projection: the
    # similarity is bilinear in (qk0, qk1), so each side carries the root
    root = (hd**-0.5 * (LOG2E if shift is not None else 1.0)) ** 0.5
    wqk = (p["to_qk"]["w"] * root).reshape(d, num_heads, hd)
    wqk = wqk.transpose(1, 0, 2).astype(dt)
    bqk = (p["to_qk"]["b"] * root).reshape(num_heads, 1, hd).astype(
        jnp.float32
    )
    wv = p["to_v"]["w"].reshape(d, num_heads, hd).transpose(1, 0, 2).astype(dt)
    bv = p["to_v"]["b"].reshape(num_heads, 1, hd).astype(jnp.float32)
    wo = p["to_out"]["w"].reshape(num_heads, hd, d).astype(dt)
    bo = p["to_out"]["b"].astype(jnp.float32)[None, :]

    ffn = p["ffn"]
    w1 = ffn["lin1"]["w"]
    w1x = w1[:d].astype(dt)
    w1m = w1[d:].astype(dt)
    b1 = ffn["lin1"]["b"].astype(jnp.float32)[None, :]
    g = ffn["ln"]["scale"].astype(jnp.float32)[None, :]
    be = ffn["ln"]["bias"].astype(jnp.float32)[None, :]
    w2 = ffn["lin2"]["w"].astype(dt)
    b2 = ffn["lin2"]["b"].astype(jnp.float32)[None, :]

    if has_mask:
        m0_ = mask0 if mask0 is not None else jnp.ones((b, m), bool)
        m1_ = mask1 if mask1 is not None else jnp.ones((b, n), bool)
        bias0 = ((m0_.astype(jnp.float32) - 1.0) * -NEG_INF)[:, None, :]
        bias1 = ((m1_.astype(jnp.float32) - 1.0) * -NEG_INF)[:, None, :]
    else:
        bias0 = jnp.zeros((b, 1, 128), jnp.float32)  # unused placeholder
        bias1 = jnp.zeros((b, 1, 128), jnp.float32)

    grid = (b, num_heads)
    batch_row = lambda shape: pl.BlockSpec(
        shape, lambda ib, ih: (ib, 0, 0), memory_space=pltpu.VMEM
    )
    head_row = lambda shape: pl.BlockSpec(
        shape, lambda ib, ih: (ih, 0, 0), memory_space=pltpu.VMEM
    )
    whole = lambda shape: pl.BlockSpec(
        shape, lambda ib, ih: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(
        _kernel,
        num_heads=num_heads,
        shift2=None if shift is None else shift * LOG2E,
        has_mask=has_mask,
        eps=1e-5,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            batch_row((1, m, d)),
            batch_row((1, n, d)),
            head_row((1, d, hd)), head_row((1, 1, hd)),
            head_row((1, d, hd)), head_row((1, 1, hd)),
            head_row((1, hd, d)), whole(bo.shape),
            whole(w1x.shape), whole(w1m.shape), whole(b1.shape),
            whole(g.shape), whole(be.shape), whole(w2.shape),
            whole(b2.shape),
            batch_row((1, 1, bias0.shape[-1])),
            batch_row((1, 1, bias1.shape[-1])),
        ],
        out_specs=[
            batch_row((1, m, d)),
            batch_row((1, n, d)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, m, d), dt),
            jax.ShapeDtypeStruct((b, n, d), dt),
        ],
        scratch_shapes=[
            pltpu.VMEM((m, d), jnp.float32),
            pltpu.VMEM((n, d), jnp.float32),
        ],
        interpret=interpret,
    )(
        x0, x1, wqk, bqk, wv, bv, wo, bo,
        w1x, w1m, b1, g, be, w2, b2, bias0, bias1,
    )
