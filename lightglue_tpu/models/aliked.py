"""ALIKED detector+descriptor, TPU-native.

Re-design of the reference's vendored ALIKED (lightglue/aliked.py, from
Shiaoming/ALIKED, BSD-3) in NHWC JAX with static shapes:

* ConvBlock/ResBlock encoder; blocks 3-4 use the gather-based deformable
  conv (ops/deform.py) instead of torchvision's CUDA op (aliked.py:341).
* 4-scale aggregation with x2/x8/x32 bilinear upsampling, sigmoid score
  head, L2-normalized dense feature map (aliked.py:709-740).
* DKD keypoint detection (aliked.py:94-261): NMS + static top-k (replacing
  the per-image dynamic threshold loops) + 5x5 soft-argmax sub-pixel
  refinement with temperature 0.1 + bilinear score lookup.
* SDDH deformable descriptor head (aliked.py:479-609): 3x3 patch extraction
  at each keypoint, offset MLP -> n_pos sample positions, bilinear feature
  sampling, learned aggregation, L2 norm — vectorized over all keypoints
  (the reference loops per image).

Images must arrive padded to a multiple of 32 (pipeline handles this); the
true extent travels as ``image_size`` for border suppression, standing in
for the reference's InputPadder pad/unpad (aliked.py:264-288).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import nn
from ..configs import ALIKEDConfig
from ..ops.deform import deformable_conv_block
from ..ops.sampling import bilinear_sample, simple_nms
from .superpoint import Features

# c1, c2, c3, c4, dim, K, M  (reference aliked.py:625-630)
CFGS = {
    "aliked-t16": (8, 16, 32, 64, 64, 3, 16),
    "aliked-n16": (16, 32, 64, 128, 128, 3, 16),
    "aliked-n16rot": (16, 32, 64, 128, 128, 3, 16),
    "aliked-n32": (16, 32, 64, 128, 128, 3, 32),
}


def selu(x):
    return jax.nn.selu(x)


# ---------------------------------------------------------------------------
# Parameter construction
# ---------------------------------------------------------------------------


def _conv_block_init(key, cin, cout):
    k1, k2 = jax.random.split(key)
    return {
        "conv1": nn.conv2d_init(k1, cin, cout, 3, bias=False),
        "bn1": nn.batch_norm_init(cout),
        "conv2": nn.conv2d_init(k2, cout, cout, 3, bias=False),
        "bn2": nn.batch_norm_init(cout),
    }


def _deform_conv_init(key, cin, cout, kernel=3):
    k1, k2 = jax.random.split(key)
    return {
        "offset_conv": nn.conv2d_init(k1, cin, 2 * kernel * kernel, kernel),
        "regular_conv": nn.conv2d_init(k2, cin, cout, kernel, bias=False),
    }


def _res_block_init(key, cin, cout, deform: bool):
    k1, k2, k3 = jax.random.split(key, 3)
    conv_init = _deform_conv_init if deform else (
        lambda k, i, o: nn.conv2d_init(k, i, o, 3, bias=False)
    )
    return {
        "conv1": conv_init(k1, cin, cout),
        "bn1": nn.batch_norm_init(cout),
        "conv2": conv_init(k2, cout, cout),
        "bn2": nn.batch_norm_init(cout),
        "downsample": nn.conv2d_init(k3, cin, cout, 1),
    }


def init_params(key, conf: ALIKEDConfig = ALIKEDConfig()) -> nn.Params:
    c1, c2, c3, c4, dim, K, M = CFGS[conf.model_name]
    keys = jax.random.split(key, 16)
    p = {
        "block1": _conv_block_init(keys[0], 3, c1),
        "block2": _res_block_init(keys[1], c1, c2, False),
        "block3": _res_block_init(keys[2], c2, c3, True),
        "block4": _res_block_init(keys[3], c3, c4, True),
        "conv1": nn.conv2d_init(keys[4], c1, dim // 4, 1, bias=False),
        "conv2": nn.conv2d_init(keys[5], c2, dim // 4, 1, bias=False),
        "conv3": nn.conv2d_init(keys[6], c3, dim // 4, 1, bias=False),
        "conv4": nn.conv2d_init(keys[7], dim, dim // 4, 1, bias=False),
        "score_head": {
            "0": nn.conv2d_init(keys[8], dim, 8, 1, bias=False),
            "2": nn.conv2d_init(keys[9], 8, 4, 3, bias=False),
            "4": nn.conv2d_init(keys[10], 4, 4, 3, bias=False),
            "6": nn.conv2d_init(keys[11], 4, 1, 3, bias=False),
        },
        "desc_head": {
            "offset_conv1": nn.conv2d_init(keys[12], dim, 2 * M, K),
            "offset_conv2": nn.conv2d_init(keys[13], 2 * M, 2 * M, 1),
            "sf_conv": nn.conv2d_init(keys[14], dim, dim, 1, bias=False),
            "agg_weights": jax.random.uniform(keys[15], (M, dim, dim)),
        },
    }
    return p


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _conv_block(p, x):
    # small-channel full-res 3x3 convs: im2col matmul beats XLA conv ~2x
    x = selu(nn.batch_norm(p["bn1"], nn.conv2d_im2col(p["conv1"], x)))
    x = selu(nn.batch_norm(p["bn2"], nn.conv2d_im2col(p["conv2"], x)))
    return x


def _res_block(p, x, deform: bool):
    # non-deform (block2, 16->32 @ H/2): DIRECT XLA conv — im2col
    # materializes a 9*16-ch patch tensor per conv and measured 2.22 vs
    # 0.97 ms/img marginal in composition (v5e bf16; /tmp A/B 2026-08,
    # bit-identical outputs). im2col only pays at full res with <=16ch
    # (block1, now inside the fused stem kernel on TPU).
    conv = (
        (lambda q, y: deformable_conv_block(q, y))
        if deform
        else (lambda q, y: nn.conv2d(q, y))
    )

    def one(xi):
        out = selu(nn.batch_norm(p["bn1"], conv(p["conv1"], xi)))
        out = nn.batch_norm(p["bn2"], conv(p["conv2"], out))
        identity = nn.conv2d(p["downsample"], xi)
        return selu(out + identity)

    # Deform blocks scale BADLY with batch on TPU: the whole-block cost is
    # 1.6 ms/img at B1 but 3.4 ms/img at B8 (XLA picks worse gather /
    # fusion strategies as soon as B>1; scripts/micro_deform_ab.py).
    # lax.map over the batch keeps every image at the B1 rate — 26.9 ->
    # 13.0 ms for block3 at B8 — and each per-image program is already
    # large enough to fill the chip.
    if deform and x.shape[0] > 1 and x.shape[1] * x.shape[2] >= 64 * 64:
        return jax.lax.map(lambda xi: one(xi[None])[0], x)
    return one(x)


def _avg_pool(x, k):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k, k, 1), (1, k, k, 1), "VALID"
    ) / (k * k)


def _lerp_matrix(n_out: int, n_in: int) -> jnp.ndarray:
    """(n_out, n_in) row-stochastic bilinear interpolation matrix for
    align_corners=True resampling (each row has the two lerp weights)."""
    ys = np.linspace(0.0, n_in - 1.0, n_out)
    y0 = np.floor(ys).astype(np.int64)
    y1 = np.minimum(y0 + 1, n_in - 1)
    wy = (ys - y0).astype(np.float32)
    mat = np.zeros((n_out, n_in), np.float32)
    mat[np.arange(n_out), y0] += 1.0 - wy
    mat[np.arange(n_out), y1] += wy
    return jnp.asarray(mat)


def _upsample(x, factor):
    """Bilinear x-factor upsample with align_corners=True (reference
    nn.Upsample(align_corners=True), aliked.py:659-670), expressed as two
    lerp matmuls so the resampling runs on the MXU instead of full-res XLA
    row gathers. Identical values: each output is the same 2-point lerp,
    summed with exact zeros."""
    b, h, w, c = x.shape
    ly = _lerp_matrix(h * factor, h).astype(x.dtype)
    lx = _lerp_matrix(w * factor, w).astype(x.dtype)
    y = jnp.einsum("oh,bhwc->bowc", ly, x)
    return jnp.einsum("ow,bhwc->bhoc", lx, y)


def extract_dense_map(
    params: nn.Params, image: jnp.ndarray, fused_score: bool = False
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, H, W, 3) -> (feature_map (B,H,W,dim) L2-normalized,
    score_map (B,H,W)) (reference aliked.py:709-740). H, W must be
    multiples of 32."""
    fm, sm = _dense_raw(params, image, fused_score=fused_score)
    return nn.l2_normalize(fm, axis=-1), sm


def _dense_raw(
    params: nn.Params, image: jnp.ndarray, fused_score: bool = False
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dense features WITHOUT the final L2 normalization. ``forward`` uses
    this and normalizes per gathered row inside SDDH instead — a lerp of
    normalized corners equals sampling the normalized map, so skipping the
    dense-normalize pass is exact and saves a full-resolution HBM
    read+write."""
    x1 = _conv_block(params["block1"], image)
    x2 = _res_block(params["block2"], _avg_pool(x1, 2), False)
    x3 = _res_block(params["block3"], _avg_pool(x2, 4), True)
    x4 = _res_block(params["block4"], _avg_pool(x3, 4), True)

    x1 = selu(nn.conv2d(params["conv1"], x1))
    x2 = selu(nn.conv2d(params["conv2"], x2))
    x3 = selu(nn.conv2d(params["conv3"], x3))
    x4 = selu(nn.conv2d(params["conv4"], x4))
    x1234 = jnp.concatenate(
        [x1, _upsample(x2, 2), _upsample(x3, 8), _upsample(x4, 32)], axis=-1
    )
    sh = params["score_head"]
    # score conv "0" is 1x1 on the concat; a channel matmul commutes with
    # the (channel-wise linear) lerp upsample, so apply each 32-ch slice of
    # W0 at its branch's NATIVE resolution and upsample the 8-ch partial
    # sums instead of re-reading the 128-ch full-res concat. Exact.
    w0 = sh["0"]["w"][0, 0]  # (dim, 8), no bias in the reference head
    from . import lightglue as _lg  # _on_tpu; no cycle at import time
    from ..ops import score_head as _score

    h, w = x1.shape[1:3]
    use_cplane = (
        fused_score and _lg._on_tpu() and _score.score_head_cplane_ok(h, w)
    )
    if use_cplane:
        # Channel-plane scoring path: build the 8-ch partial sums directly
        # in (B, 8, H, W) via einsum OUTPUT ordering — the layout the fused
        # tail kernel consumes — so only the tiny 8-ch score tensors ever
        # change layout; the shared aggregation chain that also feeds the
        # feature map stays NHWC (the round-4 wiring transposed the NHWC
        # s0 buffer instead, which poisoned layout assignment for that
        # shared chain: extract_dense_map 6.8 -> 24-28 ms/img).
        c = x1.shape[-1]
        s0c = jnp.einsum(
            "bhwc,cs->bshw", x1, w0[:c].astype(x1.dtype),
            preferred_element_type=jnp.float32,
        )
        for xi, up in ((x2, 2), (x3, 8), (x4, 32)):
            si = jnp.einsum(
                "bhwc,cs->bshw", xi,
                w0[c : c + xi.shape[-1]].astype(xi.dtype),
                preferred_element_type=jnp.float32,
            ).astype(xi.dtype)
            c += xi.shape[-1]
            hi, wi = si.shape[2:]
            ly = _lerp_matrix(hi * up, hi).astype(si.dtype)
            lx = _lerp_matrix(wi * up, wi).astype(si.dtype)
            si = jnp.einsum("oh,bshw->bsow", ly, si)
            si = jnp.einsum("ow,bshw->bsho", lx, si)
            s0c = s0c + si.astype(jnp.float32)
        if "b" in sh["0"]:
            s0c = s0c + sh["0"]["b"].astype(jnp.float32).reshape(8, 1, 1)
        score_map = _score.score_head_pallas_cplane(
            sh, s0c, mp=x1.dtype == jnp.bfloat16
        )
        return x1234, score_map
    c = x1.shape[-1]
    s0 = jax.lax.dot_general(
        x1, w0[:c].astype(x1.dtype), (((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    for xi, up in ((x2, 2), (x3, 8), (x4, 32)):
        si = jax.lax.dot_general(
            xi, w0[c : c + xi.shape[-1]].astype(xi.dtype),
            (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(xi.dtype)
        c += xi.shape[-1]
        s0 = s0 + _upsample(si, up).astype(jnp.float32)
    if "b" in sh["0"]:
        s0 = s0 + sh["0"]["b"].astype(jnp.float32)
    # XLA score tail (fallback + CPU): tiny-cout 3x3 convs as tap-matmuls —
    # 9*cout<=36 partial products stay in one lane tile instead of a
    # lane-starved conv (see nn.conv2d_tapmat).
    s = selu(s0.astype(x1.dtype))
    s = selu(nn.conv2d_tapmat(sh["2"], s))
    s = selu(nn.conv2d_tapmat(sh["4"], s))
    s = nn.conv2d_tapmat(sh["6"], s)
    score_map = jax.nn.sigmoid(s.astype(jnp.float32))[..., 0]
    return x1234, score_map


# ---------------------------------------------------------------------------
# DKD: differentiable keypoint detection (reference aliked.py:94-261)
# ---------------------------------------------------------------------------


def _gather_patches(maps: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray, r: int):
    """Gather (2r+1)^2 patches from (B, H, W) maps at integer centers
    (B, K), zero padding outside. Returns (B, K, (2r+1)^2) row-major.

    Row gathers from an x-shift table (TPU gathers cost per ROW, so
    (2r+1)^2 scalar gathers per point lose badly): the table holds only the
    2r+1 COLUMN shifts ((2r+1)x the map in HBM, not (2r+1)^2x — the full
    neighborhood table was 78 MB/image at 1024x768 r=2 and dominated DKD's
    batch scaling), and each keypoint gathers its 2r+1 patch ROWS from it."""
    b, h, w = maps.shape
    ks = 2 * r + 1
    mp = jnp.pad(maps, ((0, 0), (r, r), (r, r)))  # (b, h+2r, w+2r)
    hp = h + 2 * r
    xtab = jnp.stack(
        [mp[:, :, dx : dx + w] for dx in range(ks)], axis=-1
    ).reshape(b, hp * w, ks)  # xtab[y, x, dx] = maps[y - r, x + dx - r]
    # patch row dy at padded row iy+dy, same x
    rows = iy[..., None] + jnp.arange(ks)[None, None, :]  # (B, K, ks)
    idx = (rows * w + ix[..., None]).reshape(b, -1)  # (B, K*ks)
    vals = jnp.take_along_axis(xtab, idx[..., None], axis=1)
    return vals.reshape(b, iy.shape[1], ks * ks)  # dy-major, matches grid


def dkd_detect(
    score_map: jnp.ndarray,
    conf: ALIKEDConfig,
    image_size: Optional[jnp.ndarray] = None,
):
    """Static-k keypoint detection with sub-pixel refinement.

    score_map: (B, H, W). Returns (keypoints_xy (B, K, 2) in PIXELS,
    kptscores (B, K), valid (B, K)).
    """
    b, h, w = score_map.shape
    r = conf.nms_radius
    nms = simple_nms(score_map, r)
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    if image_size is not None:
        tw = image_size[:, 0][:, None, None].astype(jnp.float32)
        th = image_size[:, 1][:, None, None].astype(jnp.float32)
    else:
        tw = jnp.full((b, 1, 1), float(w))
        th = jnp.full((b, 1, 1), float(h))
    border = (ys < r) | (ys >= th - r) | (xs < r) | (xs >= tw - r)
    nms = jnp.where(border, 0.0, nms)

    k = conf.max_num_keypoints
    if conf.approx_topk > 0:
        kscores, idx = jax.lax.approx_max_k(
            nms.reshape(b, -1), k, recall_target=conf.approx_topk
        )
    elif getattr(conf, "twolevel_topk", False):
        from ..ops.topk import topk2d

        kscores, idx = topk2d(nms, k)
    else:
        kscores, idx = jax.lax.top_k(nms.reshape(b, -1), k)
    iy = idx // w
    ix = idx % w
    valid = kscores > conf.detection_threshold

    # sub-pixel refinement: 5x5 soft-argmax on the raw score map
    ks = 2 * r + 1
    patches = _gather_patches(score_map, iy, ix, r)  # (B, K, ks^2)
    grid_x = jnp.tile(jnp.linspace(-r, r, ks), ks)
    grid_y = jnp.repeat(jnp.linspace(-r, r, ks), ks)
    grid = jnp.stack([grid_x, grid_y], axis=-1)  # (ks^2, 2) as (x, y)
    max_v = jnp.max(patches, axis=-1, keepdims=True)
    x_exp = jnp.exp((patches - max_v) / 0.1)  # temperature (aliked.py:117)
    denom = jnp.sum(x_exp, axis=-1, keepdims=True)
    residual = (x_exp @ grid) / denom  # (B, K, 2)

    kpts = jnp.stack([ix.astype(jnp.float32), iy.astype(jnp.float32)], -1)
    kpts = kpts + residual
    # score at refined location (bilinear, align_corners=True on the
    # normalized [-1,1] grid — reference aliked.py:226-233)
    wh = jnp.asarray([w - 1, h - 1], jnp.float32)
    kpts_norm = kpts / wh * 2.0 - 1.0
    kptscore = bilinear_sample(score_map[..., None], kpts_norm)[..., 0]
    return kpts, kptscore, valid


# ---------------------------------------------------------------------------
# Lazy feature-map evaluation (branch maps instead of the dense concat)
# ---------------------------------------------------------------------------


def _dense_branches(
    params: nn.Params, image: jnp.ndarray, fused_score: bool = True,
    fused_stem: bool = True,
):
    """Encoder + aggregation WITHOUT materializing the full-resolution
    feature map: returns ((y1, y2, y3, y4), score_map) where fm ==
    concat([y1, up2(y2), up8(y3), up32(y4)]) is never built. Building fm
    costs ~24 ms at B8 1024x768 (up8/up32 intermediates + the 192 MB/img
    concat are pure HBM traffic); SDDH only ever reads ~25 positions per
    keypoint, so ``_fm_rows_lazy`` evaluates those rows from the branch
    maps directly."""
    from . import lightglue as _lg
    from ..ops import aliked_stem as _astem

    h, w = image.shape[1:3]
    if (
        fused_stem and _lg._on_tpu() and _astem.aliked_stem_ok(h, w)
        and params["conv1"]["w"].shape[2] == 16
    ):
        # block1 + its consumers in one Pallas pass (full-res x1 never
        # hits HBM; composed XLA block1 alone is 1.91 ms/img at B8)
        y1, x1p = _astem.fused_aliked_stem(
            {"block1": params["block1"], "conv1": params["conv1"]},
            image, mp=image.dtype == jnp.bfloat16,
        )
        x2 = _res_block(params["block2"], x1p, False)
    else:
        x1 = _conv_block(params["block1"], image)
        y1 = selu(nn.conv2d(params["conv1"], x1))
        x2 = _res_block(params["block2"], _avg_pool(x1, 2), False)
    x3 = _res_block(params["block3"], _avg_pool(x2, 4), True)
    x4 = _res_block(params["block4"], _avg_pool(x3, 4), True)
    y2 = selu(nn.conv2d(params["conv2"], x2))
    y3 = selu(nn.conv2d(params["conv3"], x3))
    y4 = selu(nn.conv2d(params["conv4"], x4))

    sh = params["score_head"]
    w0 = sh["0"]["w"][0, 0]
    from ..ops import score_head as _score
    use_lazy_score = (
        fused_score and _lg._on_tpu() and _score.score_head_lazy_ok(h, w)
    )
    if use_lazy_score:
        # Fully-fused score head: per-branch 1x1 partial sums at NATIVE
        # resolution in channel-plane layout (einsum output ordering —
        # only the tiny 8-ch tensors change layout, the shared NHWC
        # aggregation chain is untouched), upsampling + 3x3 tail inside
        # the kernel: the 3x full-res fp32 upsampled partials never exist.
        parts = []
        c = 0
        for xi in (y1, y2, y3, y4):
            si = jnp.einsum(
                "bhwc,cs->bshw", xi,
                w0[c : c + xi.shape[-1]].astype(xi.dtype),
                preferred_element_type=jnp.float32,
            )
            c += xi.shape[-1]
            parts.append(si)
        if "b" in sh["0"]:
            parts[0] = parts[0] + sh["0"]["b"].astype(jnp.float32).reshape(
                8, 1, 1
            )
        score_map = _score.score_head_pallas_lazy(
            sh, *parts, mp=y1.dtype == jnp.bfloat16
        )
        return (y1, y2, y3, y4), score_map

    c = 0
    s0 = None
    for xi, up in ((y1, 1), (y2, 2), (y3, 8), (y4, 32)):
        si = jax.lax.dot_general(
            xi, w0[c : c + xi.shape[-1]].astype(xi.dtype),
            (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        c += xi.shape[-1]
        if up > 1:
            si = _upsample(si.astype(xi.dtype), up).astype(jnp.float32)
        s0 = si if s0 is None else s0 + si
    if "b" in sh["0"]:
        s0 = s0 + sh["0"]["b"].astype(jnp.float32)
    s = selu(s0.astype(y1.dtype))
    s = selu(nn.conv2d_tapmat(sh["2"], s))
    s = selu(nn.conv2d_tapmat(sh["4"], s))
    s = nn.conv2d_tapmat(sh["6"], s)
    score_map = jax.nn.sigmoid(s.astype(jnp.float32))[..., 0]
    return (y1, y2, y3, y4), score_map


def _quad_table(yk: jnp.ndarray) -> jnp.ndarray:
    """Corner-quad table over a branch map: T[y, x] = [yk[y,x], yk[y,x+1],
    yk[y+1,x], yk[y+1,x+1]] for base cells y<hk-1, x<wk-1 — ONE wide row
    gather fetches all four bilinear corners (TPU gathers cost per ROW;
    4x 32-lane gathers per sample lose to 1x 128-lane)."""
    a = yk[:, :-1, :-1]
    b_ = yk[:, :-1, 1:]
    c_ = yk[:, 1:, :-1]
    d = yk[:, 1:, 1:]
    t = jnp.concatenate([a, b_, c_, d], axis=-1)
    bsz, hm1, wm1, c4 = t.shape
    return t.reshape(bsz, hm1 * wm1, c4)


def _branch_rows(quad, hk: int, wk: int, c: int, cy, cx, dt):
    """Bilinear values of a branch map (via its quad table) at fractional
    coordinates (B, S) guaranteed inside [0, hk-1] x [0, wk-1]. Matches
    ``_upsample``'s lerp order (rows first, then columns, with a working-
    dtype round between) so lazy == dense bit-for-bit at fp32 and to the
    same rounding at bf16."""
    y0 = jnp.minimum(jnp.floor(cy), hk - 2 if hk > 1 else 0)
    x0 = jnp.minimum(jnp.floor(cx), wk - 2 if wk > 1 else 0)
    wy = (cy - y0)[..., None].astype(dt)
    wx = (cx - x0)[..., None].astype(dt)
    idx = y0.astype(jnp.int32) * (wk - 1) + x0.astype(jnp.int32)
    g = jnp.take_along_axis(quad, idx[..., None], axis=1)
    g = g.reshape(*cy.shape, 4, c)
    top = g[..., 0, :] * (1 - wy) + g[..., 2, :] * wy
    bot = g[..., 1, :] * (1 - wy) + g[..., 3, :] * wy
    return top * (1 - wx) + bot * wx


def _fm_rows_lazy(ys, quads, iy, ix, H: int, W: int, normalize: bool):
    """fm[iy, ix] where fm = concat([y1, up2(y2), up8(y3), up32(y4)]),
    evaluated from the branch maps: y1 contributes its own pixel; each
    coarser branch contributes its bilinear value at the align_corners-
    mapped coordinate (exactly what the `_lerp_matrix` upsample computes
    at that output pixel) via its corner-quad table. iy/ix: (B, S) int32
    inside the map. Returns (B, S, dim)."""
    y1 = ys[0]
    b, _, _, c1 = y1.shape
    parts = [
        jnp.take_along_axis(
            y1.reshape(b, H * W, c1), (iy * W + ix)[..., None], axis=1
        )
    ]
    for yk, quad in zip(ys[1:], quads):
        hk, wk = yk.shape[1:3]
        cy = iy.astype(jnp.float32) * ((hk - 1.0) / (H - 1.0))
        cx = ix.astype(jnp.float32) * ((wk - 1.0) / (W - 1.0))
        parts.append(
            _branch_rows(quad, hk, wk, yk.shape[-1], cy, cx, y1.dtype)
        )
    rows = jnp.concatenate(parts, axis=-1)
    if normalize:
        f32 = rows.astype(jnp.float32)
        n = jnp.linalg.norm(f32, axis=-1, keepdims=True)
        rows = (f32 / jnp.maximum(n, 1e-12)).astype(rows.dtype)
    return rows


# ---------------------------------------------------------------------------
# SDDH: deformable descriptor head (reference aliked.py:479-609)
# ---------------------------------------------------------------------------


def sddh_describe(
    p: nn.Params,
    feature_map: jnp.ndarray,
    keypoints: jnp.ndarray,
    conf: ALIKEDConfig,
    prenormalized: bool = True,
) -> jnp.ndarray:
    """feature_map (B, H, W, C); keypoints (B, K, 2) in pixels.
    Returns (B, K, C) L2-normalized descriptors.

    ``prenormalized=False`` accepts the RAW dense map (``_dense_raw``) and
    L2-normalizes every gathered row on the fly — exactly equivalent to
    sampling the normalized map, minus the dense normalization pass."""
    b, h, w, c = feature_map.shape
    _, _, _, _, dim, K, M = CFGS[conf.model_name]
    max_offset = max(h, w) / 4.0

    # --- 3x3 patches at integer keypoint corners (reference: keypoints are
    # truncated to ints first, then corner = (ikpt - ps/2 + 1).long(),
    # clamped — aliked.py:48-54, 551)
    ps = K
    ikx = keypoints[..., 0].astype(jnp.int32)
    iky = keypoints[..., 1].astype(jnp.int32)
    cx = jnp.clip(
        (ikx.astype(jnp.float32) - ps / 2 + 1).astype(jnp.int32), 0, w - 1 - ps
    )
    cy = jnp.clip(
        (iky.astype(jnp.float32) - ps / 2 + 1).astype(jnp.int32), 0, h - 1 - ps
    )
    dy = jnp.repeat(jnp.arange(ps), ps)[None, None, :]
    dx = jnp.tile(jnp.arange(ps), ps)[None, None, :]
    yy = cy[..., None] + dy  # (B, Kp, ps^2)
    xx = cx[..., None] + dx
    idx = yy * w + xx
    flat = feature_map.reshape(b, h * w, c)
    patches = jnp.take_along_axis(
        flat, idx.reshape(b, -1)[..., None], axis=1
    ).reshape(b, keypoints.shape[1], ps * ps, c)  # (B, Kp, ps^2, C)
    if not prenormalized:
        pf = patches.astype(jnp.float32)
        pn = jnp.linalg.norm(pf, axis=-1, keepdims=True)
        patches = (pf / jnp.maximum(pn, 1e-12)).astype(patches.dtype)

    # --- offset MLP: KxK conv VALID over the patch == tensordot
    w1 = p["offset_conv1"]["w"]  # (K, K, C, 2M) HWIO
    w1 = w1.reshape(ps * ps * c, -1)
    x = patches.reshape(b, -1, ps * ps * c) @ w1 + p["offset_conv1"]["b"]
    x = selu(x)
    x = x @ p["offset_conv2"]["w"].reshape(2 * M, 2 * M) + p["offset_conv2"]["b"]
    x = jnp.clip(x, -max_offset, max_offset)  # (B, Kp, 2M)
    # channel layout: first M are x-offsets, next M are y-offsets
    # (reference view(N, 2, n_pos).permute -> offset[:, p, d], aliked.py:571)
    off = x.reshape(b, -1, 2, M).transpose(0, 1, 3, 2)  # (B, Kp, M, 2)

    # --- sample features at kpt + offset (offset math in fp32)
    off = off.astype(jnp.float32)
    pos = keypoints[:, :, None, :] + off  # (B, Kp, M, 2) pixel coords
    wh = jnp.asarray([w - 1, h - 1], jnp.float32)
    pos_norm = 2.0 * pos / wh - 1.0
    feats = bilinear_sample(
        feature_map,
        pos_norm.reshape(b, -1, 2),
        row_l2_normalize=not prenormalized,
    ).reshape(b, -1, M, c)  # (B, Kp, M, C)

    # --- sf_conv (1x1, no bias) + selu + learned aggregation
    feats = feats @ p["sf_conv"]["w"].reshape(c, c)
    feats = selu(feats)
    descs = jnp.einsum(
        "bkpc,pcd->bkd", feats, p["agg_weights"],
        preferred_element_type=jnp.float32,
    )
    return nn.l2_normalize(descs, axis=-1)


def sddh_describe_lazy(
    p: nn.Params,
    ys,
    keypoints: jnp.ndarray,
    conf: ALIKEDConfig,
    H: int,
    W: int,
) -> jnp.ndarray:
    """``sddh_describe`` against the LAZY feature map: every fm row it
    needs (3x3 patch taps + the 4 bilinear corners of each offset sample)
    is evaluated from the branch maps by ``_fm_rows_lazy`` instead of
    gathered from the dense concat. Same math as
    ``sddh_describe(prenormalized=False)``: rows are L2-normalized before
    use, offset samples zero outside the map (grid_sample semantics,
    reference aliked.py:571-585)."""
    b = keypoints.shape[0]
    _, _, _, _, dim, K, M = CFGS[conf.model_name]
    max_offset = max(H, W) / 4.0
    ps = K
    kp_n = keypoints.shape[1]
    quads = tuple(_quad_table(yk) for yk in ys[1:])

    ikx = keypoints[..., 0].astype(jnp.int32)
    iky = keypoints[..., 1].astype(jnp.int32)
    cx = jnp.clip(
        (ikx.astype(jnp.float32) - ps / 2 + 1).astype(jnp.int32), 0,
        W - 1 - ps,
    )
    cy = jnp.clip(
        (iky.astype(jnp.float32) - ps / 2 + 1).astype(jnp.int32), 0,
        H - 1 - ps,
    )
    dy = jnp.repeat(jnp.arange(ps), ps)[None, None, :]
    dx = jnp.tile(jnp.arange(ps), ps)[None, None, :]
    yy = (cy[..., None] + dy).reshape(b, -1)
    xx = (cx[..., None] + dx).reshape(b, -1)
    patches = _fm_rows_lazy(ys, quads, yy, xx, H, W, normalize=True).reshape(
        b, kp_n, ps * ps, dim
    )

    w1 = p["offset_conv1"]["w"].reshape(ps * ps * dim, -1)
    x = patches.reshape(b, -1, ps * ps * dim) @ w1 + p["offset_conv1"]["b"]
    x = selu(x)
    x = x @ p["offset_conv2"]["w"].reshape(2 * M, 2 * M) + p["offset_conv2"]["b"]
    x = jnp.clip(x, -max_offset, max_offset)
    off = x.reshape(b, -1, 2, M).transpose(0, 1, 3, 2).astype(jnp.float32)

    pos = keypoints[:, :, None, :] + off  # (B, Kp, M, 2) pixel coords
    px, py = pos[..., 0], pos[..., 1]
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wdt = ys[0].dtype
    wx = (px - x0)[..., None].astype(wdt)
    wy = (py - y0)[..., None].astype(wdt)

    def corner(dy_, dx_):
        yi = y0 + dy_
        xi = x0 + dx_
        inside = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32).reshape(b, -1)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32).reshape(b, -1)
        v = _fm_rows_lazy(ys, quads, yc, xc, H, W, normalize=True).reshape(
            b, kp_n, M, dim
        )
        return jnp.where(inside[..., None], v, 0.0)

    top = corner(0, 0) * (1 - wx) + corner(0, 1) * wx
    bot = corner(1, 0) * (1 - wx) + corner(1, 1) * wx
    feats = top * (1 - wy) + bot * wy  # (B, Kp, M, dim)

    feats = feats @ p["sf_conv"]["w"].reshape(dim, dim)
    feats = selu(feats)
    descs = jnp.einsum(
        "bkpc,pcd->bkd", feats, p["agg_weights"],
        preferred_element_type=jnp.float32,
    )
    return nn.l2_normalize(descs, axis=-1)


def forward(
    params: nn.Params,
    conf: ALIKEDConfig,
    image: jnp.ndarray,
    image_size: Optional[jnp.ndarray] = None,
) -> Features:
    """(B, H, W, C) image (H, W multiples of 32) -> static-k Features.

    Batched calls run ONE IMAGE AT A TIME under ``lax.map``: ALIKED's
    gather-heavy graph scales badly when XLA batches it (full forward
    12.7-19 ms/img at B8 vs 9.9 at B1 — same pathology as the deform
    blocks, scripts/micro_deform_ab.py), and a single 1024x768 image
    already fills the chip, so the per-image program IS the throughput
    optimum (B8 under map: 9.94 ms/img, v5e bf16)."""
    if image.shape[0] > 1 and image.shape[1] * image.shape[2] >= 256 * 256:
        sz = (
            image_size
            if image_size is not None
            else jnp.tile(
                jnp.asarray(
                    [[float(image.shape[2]), float(image.shape[1])]],
                    jnp.float32,
                ),
                (image.shape[0], 1),
            )
        )
        return jax.lax.map(
            lambda a: jax.tree.map(
                lambda t: t[0], forward(params, conf, a[0][None], a[1][None])
            ),
            (image, sz),
        )
    if image.shape[-1] == 1:
        image = jnp.repeat(image, 3, axis=-1)
    if conf.mp:
        image = image.astype(jnp.bfloat16)
    H, W = image.shape[1:3]
    if conf.lazy_fm:
        # lazy feature map: never build the 192 MB/img full-res concat
        # (reference aliked.py:735 builds it densely; SDDH reads ~25
        # positions/kpt) — ~24 ms saved at B8 1024x768
        ys, score_map = _dense_branches(
            params, image, fused_score=conf.fused_score_head,
            fused_stem=conf.fused_stem,
        )
        ys = jax.lax.optimization_barrier(ys)
        score_map = jax.lax.optimization_barrier(score_map)
        kpts, kscores, valid = dkd_detect(score_map, conf, image_size)
        descs = sddh_describe_lazy(
            params["desc_head"], ys, kpts, conf, H, W
        ).astype(jnp.float32)
    else:
        feature_map, score_map = _dense_raw(
            params, image, fused_score=conf.fused_score_head
        )
        # materialize the dense maps ONCE: without this barrier XLA
        # duplicates the aggregation chain into each gather consumer
        # (score lookup, SDDH patches, offset samples) — measured +5.6 ms
        # at 1024x768
        feature_map, score_map = jax.lax.optimization_barrier(
            (feature_map, score_map)
        )
        kpts, kscores, valid = dkd_detect(score_map, conf, image_size)
        descs = sddh_describe(
            params["desc_head"], feature_map, kpts, conf,
            prenormalized=False,
        ).astype(jnp.float32)
    return Features(
        keypoints=kpts,
        keypoint_scores=jnp.where(valid, kscores, 0.0),
        descriptors=jnp.where(valid[..., None], descs, 0.0),
        valid=valid,
    )
