"""Fully-fused self-attention block Pallas kernel.

The reference SelfBlock (lightglue/lightglue.py:159-172) is
``Wqkv -> rotary(q,k) -> SDPA -> out_proj -> x + FFN(cat[x, message])``.
Composed from separate ops, every arrow is an HBM round-trip of a
(B, N, D)-sized activation: qkv write+read, rotary read+write of q/k,
attention context write, out_proj read/write, FFN read of x and message
(~14 N*D transfers per image per layer). At 1024 keypoints x 256 dims x
9 layers x 2 images, that HBM traffic rivals the attention FLOPs as the
per-pair cost on v5e.

This kernel runs the ENTIRE block in one Pallas program. Grid is
(B, N/BQ, H) with the head axis innermost:

  * at the first query block of each batch row, the k/v projections of all
    heads are computed once and parked in VMEM scratch (rotary applied to k
    in-register);
  * each (query-block, head) step projects its q tile, applies rotary,
    runs the strip softmax against the scratch k/v, multiplies into the
    head's out_proj slice (out_proj distributes over heads:
    concat_h(ctx_h) @ Wo == sum_h ctx_h @ Wo[h]), and accumulates into an
    fp32 VMEM accumulator — the output block is only touched on the
    final head;
  * the final head's step appends the fused FFN (ops/ffn.py math:
    algebraic concat split, fp32 LayerNorm + polynomial-erf GELU between
    the two MXU matmuls) and writes ``x + ffn(cat[x, message])``.

HBM traffic per block collapses to: read x once per batch row, read the
(small) weights, write the output once.

q/k use the DEINTERLEAVED pair layout (models/lightglue.py::_deint_qkv_perm):
attention scores are invariant to a fixed channel permutation shared by q
and k, and in this layout rotary is two half-width multiplies plus one
half-swap — no interleave lane shuffle. The half-swap itself is folded into
the sin table: with ``cosd=[c|c]`` and ``sind=[-s|s]``,
``rot(t) = t*cosd + swap_halves(t)*sind`` reproduces
reference lightglue.py:58-65 exactly.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ffn import _erf
from .flash import LOG2E, NEG_INF, SHIFT_CLAMP, pick_block

# VMEM budget: x + k/v scratch + (BQ, N) strip + weights must fit ~16 MB.
# N=2048 uses ~7 MB; 4096 would need ~14 and leaves no pipelining headroom.
MAX_FUSED_N = 2048


@functools.lru_cache(maxsize=None)
def _qkv_split_perms(num_heads: int, head_dim: int):
    """Per-head column indices into the packed Wqkv output (reference
    layout ``(head*hd + chan)*3 + which``, lightglue.py:166) producing
    deinterleaved q/k and natural v, each ordered head-major."""
    hh = head_dim // 2
    q_cols = np.empty((num_heads, head_dim), np.int64)
    k_cols = np.empty((num_heads, head_dim), np.int64)
    v_cols = np.empty((num_heads, head_dim), np.int64)
    for h in range(num_heads):
        for j in range(head_dim):
            src = 2 * j if j < hh else 2 * (j - hh) + 1
            q_cols[h, j] = (h * head_dim + src) * 3 + 0
            k_cols[h, j] = (h * head_dim + src) * 3 + 1
            v_cols[h, j] = (h * head_dim + j) * 3 + 2
    return q_cols.ravel(), k_cols.ravel(), v_cols.ravel()


def _rot(t, cosd, sind):
    """Deint rotary with sign folded into sind: t*[c|c] + swap(t)*[-s|s]."""
    hh = t.shape[-1] // 2
    swap = jnp.concatenate([t[..., hh:], t[..., :hh]], axis=-1)
    return t * cosd + swap * sind


def _kernel(
    x_ref, cosd_ref, sind_ref,
    wq_ref, wk_ref, wv_ref, bq_ref, bk_ref, bv_ref, wo_ref, bo_ref,
    w1x_ref, w1m_ref, b1_ref, g_ref, be_ref, w2_ref, b2_ref,
    kbias_ref,
    o_ref,
    k_s, v_s, acc,
    *,
    block_q: int, num_heads: int, shift2: Optional[float], has_mask: bool,
    eps: float,
):
    iq = pl.program_id(1)
    h = pl.program_id(2)
    f32 = jnp.float32

    @pl.when(iq == 0)
    def _fill_kv():
        xx = x_ref[0]  # (N, D)
        k = jax.lax.dot_general(
            xx, wk_ref[0], (((1,), (0,)), ((), ())), preferred_element_type=f32
        ) + bk_ref[0, 0][None, :]
        k = _rot(k, cosd_ref[0].astype(f32), sind_ref[0].astype(f32))
        k_s[h] = k.astype(k_s.dtype)
        v = jax.lax.dot_general(
            xx, wv_ref[0], (((1,), (0,)), ((), ())), preferred_element_type=f32
        ) + bv_ref[0, 0][None, :]
        v_s[h] = v.astype(v_s.dtype)

    xb = x_ref[0, pl.ds(iq * block_q, block_q), :]  # (BQ, D)
    q = jax.lax.dot_general(
        xb, wq_ref[0], (((1,), (0,)), ((), ())), preferred_element_type=f32
    ) + bq_ref[0, 0][None, :]
    cosb = cosd_ref[0, pl.ds(iq * block_q, block_q), :].astype(f32)
    sinb = sind_ref[0, pl.ds(iq * block_q, block_q), :].astype(f32)
    q = _rot(q, cosb, sinb)  # softmax scale pre-folded into wq/bq

    s = jax.lax.dot_general(
        q.astype(k_s.dtype), k_s[h],
        (((1,), (1,)), ((), ())), preferred_element_type=f32,
    )  # (BQ, N)
    if has_mask:
        s = s + kbias_ref[0, 0, :][None, :]
    if shift2 is not None:
        e = jnp.exp2(jnp.minimum(s - shift2, SHIFT_CLAMP))
    else:
        e = jnp.exp(s - jnp.max(s, axis=1, keepdims=True))
    l = jnp.sum(e, axis=1, keepdims=True)
    ctx = jax.lax.dot_general(
        e.astype(v_s.dtype), v_s[h],
        (((1,), (0,)), ((), ())), preferred_element_type=f32,
    ) / jnp.maximum(l, 1e-30)
    if has_mask:
        # zero context where every key is masked (reference nan_to_num
        # parity, lightglue.py:133-135): any key valid <=> max bias == 0
        any_valid = jnp.max(kbias_ref[0, 0, :]) >= 0.0
        ctx = jnp.where(any_valid, ctx, 0.0)
    y = jax.lax.dot_general(
        ctx.astype(wo_ref.dtype), wo_ref[0],
        (((1,), (0,)), ((), ())), preferred_element_type=f32,
    )  # (BQ, D) — this head's out_proj contribution

    @pl.when(h == 0)
    def _init_acc():
        acc[...] = y + bo_ref[0][None, :]

    @pl.when(h > 0)
    def _add_acc():
        acc[...] += y

    @pl.when(h == num_heads - 1)
    def _ffn_and_write():
        msg = acc[...].astype(x_ref.dtype)  # message, bf16 like unfused path
        s1 = jax.lax.dot_general(
            xb, w1x_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        s1 = s1 + jax.lax.dot_general(
            msg, w1m_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        s1 = s1 + b1_ref[0, :][None, :]
        mean = jnp.mean(s1, axis=-1, keepdims=True)
        c = s1 - mean
        var = jnp.mean(c * c, axis=-1, keepdims=True)
        hid = c * jax.lax.rsqrt(var + eps)
        hid = hid * g_ref[0, :][None, :] + be_ref[0, :][None, :]
        hid = 0.5 * hid * (1.0 + _erf(hid * 0.7071067811865476))
        y2 = jax.lax.dot_general(
            hid.astype(w2_ref.dtype), w2_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        y2 = y2 + b2_ref[0, :][None, :]
        o_ref[0] = (xb.astype(f32) + y2).astype(o_ref.dtype)


def fused_self_block(
    p: dict,
    x: jnp.ndarray,
    enc: jnp.ndarray,
    num_heads: int,
    key_mask: Optional[jnp.ndarray] = None,
    shift: Optional[float] = None,
    block_q: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Run a whole SelfBlock (reference lightglue.py:159-172) in one kernel.

    p: self_attn params {"Wqkv": {w (D,3D), b}, "out_proj": {w (D,D), b},
    "ffn": {lin1, ln, lin2}} (models/lightglue.py::_self_block_init).
    x: (B, N, D); enc: (2, B, 1, N, head_dim/2) half-layout rotary cache
    (ops/rotary.py::fourier_posenc); key_mask: (B, N) bool (True=valid);
    shift: constant-softmax shift in nats (see ops/flash.py).
    Returns (B, N, D): ``x + ffn(cat[x, out_proj(attention)])``.
    """
    b, n, d = x.shape
    hd = d // num_heads
    dt = x.dtype
    if block_q is None:
        # one query block per (b, h) when the fp32 strip fits VMEM (~4 MB):
        # measured 27.0 vs 31.7 us/image at N=1024 vs BQ=256 (fewer grid
        # steps, no k/v-fill bubble)
        block_q = n if n * n * 4 <= 4 * 2**20 else 256
    block_q = pick_block(n, block_q)
    has_mask = key_mask is not None

    q_cols, k_cols, v_cols = _qkv_split_perms(num_heads, hd)
    w = p["Wqkv"]["w"]
    bias = p["Wqkv"]["b"]
    per_head = lambda cols: (
        w[:, cols].reshape(d, num_heads, hd).transpose(1, 0, 2),
        bias[cols].reshape(num_heads, 1, hd),
    )
    scale = hd**-0.5
    shift2 = None
    if shift is not None:
        scale *= LOG2E
        shift2 = shift * LOG2E
    wq, bq = per_head(q_cols)
    wq = (wq * scale).astype(dt)
    bq = (bq * scale).astype(jnp.float32)
    wk, bk = per_head(k_cols)
    wv, bv = per_head(v_cols)
    wk, wv = wk.astype(dt), wv.astype(dt)
    bk, bv = bk.astype(jnp.float32), bv.astype(jnp.float32)
    # out_proj rows grouped per head: concat_h(ctx) @ Wo == sum_h ctx_h@Wo[h]
    wo = p["out_proj"]["w"].reshape(num_heads, hd, d).astype(dt)
    bo = p["out_proj"]["b"].astype(jnp.float32)[None, :]

    cos = enc[0][:, 0]  # (B, N, hh)
    sin = enc[1][:, 0]
    cosd = jnp.concatenate([cos, cos], axis=-1).astype(dt)
    sind = jnp.concatenate([-sin, sin], axis=-1).astype(dt)

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
        kbias = ((key_mask.astype(jnp.float32) - 1.0) * -NEG_INF)[:, None, :]
    else:
        kbias = jnp.zeros((b, 1, 128), jnp.float32)  # unused placeholder

    grid = (b, n // block_q, num_heads)
    batch_row = lambda shape: pl.BlockSpec(
        shape, lambda ib, iq, ih: (ib, 0, 0), memory_space=pltpu.VMEM
    )
    head_row = lambda shape: pl.BlockSpec(
        shape, lambda ib, iq, ih: (ih, 0, 0), memory_space=pltpu.VMEM
    )
    whole = lambda shape: pl.BlockSpec(
        shape, lambda ib, iq, ih: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM,
    )
    in_specs = [
        batch_row((1, n, d)),          # x
        batch_row((1, n, hd)),         # cosd
        batch_row((1, n, hd)),         # sind
        head_row((1, d, hd)),          # wq
        head_row((1, d, hd)),          # wk
        head_row((1, d, hd)),          # wv
        head_row((1, 1, hd)),          # bq
        head_row((1, 1, hd)),          # bk
        head_row((1, 1, hd)),          # bv
        head_row((1, hd, d)),          # wo
        whole(bo.shape),               # bo
        whole(w1x.shape), whole(w1m.shape), whole(b1.shape),
        whole(g.shape), whole(be.shape), whole(w2.shape), whole(b2.shape),
        batch_row((1, 1, kbias.shape[-1])),  # kbias
    ]
    kernel = functools.partial(
        _kernel,
        block_q=block_q, num_heads=num_heads, shift2=shift2,
        has_mask=has_mask, eps=1e-5,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, block_q, d), lambda ib, iq, ih: (ib, iq, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(x.shape, dt),
        scratch_shapes=[
            pltpu.VMEM((num_heads, n, hd), dt),  # k (rotated)
            pltpu.VMEM((num_heads, n, hd), dt),  # v
            pltpu.VMEM((block_q, d), jnp.float32),  # out_proj accumulator
        ],
        interpret=interpret,
    )(
        x, cosd, sind, wq, wk, wv, bq, bk, bv, wo, bo,
        w1x, w1m, b1, g, be, w2, b2, kbias,
    )
