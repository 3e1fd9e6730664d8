"""DISK detector+descriptor, TPU-native.

The reference delegates to ``kornia.feature.DISK.from_pretrained`` (reference
disk.py:26), whose network is the thin U-Net of Tyszkiewicz et al., "DISK:
Learning local features with policy gradient" (NeurIPS 2020): input 3ch,
down channels [16, 32, 64, 64, 64], up channels [64, 64, 64, desc_dim+1],
5x5 convolutions in pre-activation blocks (PReLU gate -> InstanceNorm ->
conv), average-pool downsampling, bilinear upsampling with skip
concatenation. The U-Net output splits into a 128-d dense descriptor map and
a 1-ch detection heatmap.

Detection follows kornia's DISK inference: window NMS (local max over a
(window)^2 neighborhood) + score threshold + top-n; descriptors are sampled
at the integer keypoint locations and L2-normalized.

NOTE on checkpoints: the converter (weights.convert_disk) targets the kornia
0.7 state-dict layout (``unet.path_down.{i}...`` naming); it is written from
the published architecture — validate against a real kornia checkpoint
before relying on pretrained weights.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .. import nn
from ..configs import DISKConfig
from .superpoint import Features

DOWN = [16, 32, 64, 64, 64]
UP = [64, 64, 64]  # + final desc_dim + 1


def _prelu_init(ch: int) -> nn.Params:
    return {"alpha": jnp.full((ch,), 0.25, jnp.float32)}


def _prelu(p: nn.Params, x: jnp.ndarray) -> jnp.ndarray:
    a = p["alpha"].astype(x.dtype)
    return jnp.where(x >= 0, x, a * x)


def _conv_block_init(key, cin, cout, is_first=False):
    p = {"conv": nn.conv2d_init(key, cin, cout, 5)}
    if not is_first:
        p["gate"] = _prelu_init(cin)
    return p


def _conv_block(p, x):
    # gate presence in the params is authoritative (converted checkpoints
    # may or may not gate the first block; init gates all but block 0)
    if "gate" in p:
        x = _prelu(p["gate"], x)
        x = nn.instance_norm(x)
    return nn.conv2d(p["conv"], x)


def init_params(key, conf: DISKConfig = DISKConfig()) -> nn.Params:
    keys = jax.random.split(key, 16)
    down = []
    cin = 3
    for i, cout in enumerate(DOWN):
        down.append(_conv_block_init(keys[i], cin, cout, is_first=(i == 0)))
        cin = cout
    up = []
    ups = UP + [conf.desc_dim + 1]
    for i, cout in enumerate(ups):
        # input = upsampled previous + skip connection from down path
        skip_ch = DOWN[len(DOWN) - 2 - i]
        up.append(
            _conv_block_init(keys[8 + i], cin + skip_ch, cout)
        )
        cin = cout
    return {
        "down": {str(i): p for i, p in enumerate(down)},
        "up": {str(i): p for i, p in enumerate(up)},
    }


def _avg_pool2(x):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) / 4.0


def _upsample2_bilinear(x):
    """x2 bilinear upsample, align_corners=False (torch nn.Upsample default
    used by the thin U-Net's TrivialUpsample)."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="bilinear")


def unet_trunk(params: nn.Params, image: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) -> (B, H, W, 64+DOWN[0]): the gated+normalized input of
    the final up block, i.e. everything except its conv. Splitting here
    lets the forward path compute the 1-ch heatmap with a tap-matmul and
    the descriptors only at the K detected keypoints, instead of the
    full-res (desc_dim+1)-channel 5x5 conv (measured 8.2 ms -> ~0.5 ms at
    1024x768)."""
    feats = []
    n = len(DOWN)
    # down0 (ungated 5x5 conv at full res, small cout) via the phase-packed
    # stride-2 formulation: measured 1.8 -> 1.0 ms at 1024x768 (see
    # nn.conv2d_phases); exact
    p0 = params["down"]["0"]
    if "gate" in p0:  # converted checkpoints may gate block 0
        x = _conv_block(p0, image)
    else:
        x = nn.depth_to_space2(nn.conv2d_phases(p0["conv"], image))
    feats.append(x)
    for i in range(1, n):
        x = _avg_pool2(x)
        x = _conv_block(params["down"][str(i)], x)
        feats.append(x)
    y = feats[-1]
    for i in range(len(UP)):
        y = _upsample2_bilinear(y)
        skip = feats[n - 2 - i]
        y = jnp.concatenate([y, skip], axis=-1)
        y = _conv_block(params["up"][str(i)], y)
    y = _upsample2_bilinear(y)
    y = jnp.concatenate([y, feats[0]], axis=-1)
    p_last = params["up"][str(len(UP))]
    if "gate" in p_last:
        y = _prelu(p_last["gate"], y)
        y = nn.instance_norm(y)
    return y


def unet_forward(params: nn.Params, image: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) -> (B, H, W, desc_dim+1). H, W multiples of 16."""
    z = unet_trunk(params, image)
    return nn.conv2d(params["up"][str(len(UP))]["conv"], z)


def _heatmap_tapmat(params: nn.Params, z: jnp.ndarray, desc_dim: int) -> jnp.ndarray:
    """Final-block heatmap channel only, via nn.conv2d_tapmat. (B,H,W)."""
    p = params["up"][str(len(UP))]["conv"]
    ph = {"w": p["w"][..., desc_dim:]}
    if "b" in p:
        ph["b"] = p["b"][desc_dim:]
    return nn.conv2d_tapmat(ph, z)[..., 0]


def _desc_at_keypoints(
    params: nn.Params,
    z: jnp.ndarray,
    kpts: jnp.ndarray,
    desc_dim: int,
) -> jnp.ndarray:
    """Descriptors of the final conv evaluated only at K integer keypoint
    locations: gather the 5x5 input patches and contract them against the
    reshaped conv kernel in one (K, 25*cin) x (25*cin, desc_dim) matmul.
    Exactly equal to slicing the dense conv output at those points.

    z: (B, H, W, C) trunk output; kpts: (B, K, 2) xy integer positions.
    """
    p = params["up"][str(len(UP))]["conv"]
    kh, kw, cin, _ = p["w"].shape
    b, h, w, _ = z.shape
    phh, pww = (kh - 1) // 2, (kw - 1) // 2
    zp = jnp.pad(z, ((0, 0), (phh, phh), (pww, pww), (0, 0)))
    wp = w + 2 * pww
    flat = zp.reshape(b, (h + 2 * phh) * wp, cin)
    ix = kpts[..., 0].astype(jnp.int32)
    iy = kpts[..., 1].astype(jnp.int32)
    # tap-major index layout to match w.reshape(kh*kw*cin, desc_dim)
    offs = jnp.asarray(
        [(dy * wp + dx) for dy in range(kh) for dx in range(kw)], jnp.int32
    )
    base = iy * wp + ix  # padded coords: kpt (x,y) -> patch corner (y, x)
    idx = base[..., None] + offs[None, None, :]  # (B, K, kh*kw)
    rows = jnp.take_along_axis(
        flat, idx.reshape(b, -1)[..., None], axis=1
    )  # (B, K*taps, cin)
    k = kpts.shape[1]
    cols = rows.reshape(b, k, kh * kw * cin)
    wmat = p["w"][..., :desc_dim].reshape(kh * kw * cin, desc_dim).astype(z.dtype)
    desc = jax.lax.dot_general(
        cols, wmat, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if "b" in p:
        desc = desc + p["b"][:desc_dim].astype(jnp.float32)
    return desc


def heatmap_to_keypoints(
    heatmap: jnp.ndarray,
    conf: DISKConfig,
    image_size: Optional[jnp.ndarray] = None,
):
    """Window NMS + threshold + static top-n (kornia disk detector
    semantics). heatmap: (B, H, W). Returns (kpts (B,K,2) xy, scores, valid).
    """
    b, h, w = heatmap.shape
    win = conf.nms_window_size
    # separable window max: rows pass then cols pass is exact for max and
    # avoids the O(win^2) 2-D reduce_window (same rewrite measured on
    # SuperPoint's simple_nms, ops/sampling.py:82)
    local_max = jax.lax.reduce_window(
        heatmap, -jnp.inf, jax.lax.max, (1, 1, win), (1, 1, 1), "SAME",
    )
    local_max = jax.lax.reduce_window(
        local_max, -jnp.inf, jax.lax.max, (1, win, 1), (1, 1, 1), "SAME",
    )
    is_max = heatmap == local_max
    scores = jnp.where(is_max, heatmap, -jnp.inf)
    if image_size is not None:
        ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
        xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
        tw = image_size[:, 0][:, None, None].astype(jnp.float32)
        th = image_size[:, 1][:, None, None].astype(jnp.float32)
        scores = jnp.where((ys < th) & (xs < tw), scores, -jnp.inf)
    k = conf.max_num_keypoints
    if conf.approx_topk > 0:
        kscores, idx = jax.lax.approx_max_k(
            scores.reshape(b, -1), k, recall_target=conf.approx_topk
        )
    elif conf.twolevel_topk:
        from ..ops.topk import topk2d

        kscores, idx = topk2d(scores, k)
    else:
        kscores, idx = jax.lax.top_k(scores.reshape(b, -1), k)
    iy = (idx // w).astype(jnp.float32)
    ix = (idx % w).astype(jnp.float32)
    kpts = jnp.stack([ix, iy], axis=-1)
    valid = kscores > conf.detection_threshold
    valid &= jnp.isfinite(kscores)
    return kpts, jnp.where(valid, kscores, 0.0), valid


def forward(
    params: nn.Params,
    conf: DISKConfig,
    image: jnp.ndarray,
    image_size: Optional[jnp.ndarray] = None,
) -> Features:
    """(B, H, W, C) -> static-k Features. H, W multiples of 16."""
    if image.shape[-1] == 1:
        image = jnp.repeat(image, 3, axis=-1)
    if conf.mp:
        image = image.astype(jnp.bfloat16)
    z = unet_trunk(params, image)
    # materialize the trunk ONCE: it feeds both the heatmap and the
    # at-keypoint descriptor gather, and XLA otherwise duplicates the
    # producing chain into each consumer (see aliked.forward)
    z = jax.lax.optimization_barrier(z)
    heatmap = _heatmap_tapmat(params, z, conf.desc_dim).astype(jnp.float32)
    kpts, kscores, valid = heatmap_to_keypoints(heatmap, conf, image_size)
    descs = _desc_at_keypoints(params, z, kpts, conf.desc_dim)
    # mp mode: only the K gathered rows are promoted; the norm runs fp32
    descs = nn.l2_normalize(descs.astype(jnp.float32), axis=-1)
    return Features(
        keypoints=kpts,
        keypoint_scores=kscores,
        descriptors=jnp.where(valid[..., None], descs, 0.0),
        valid=valid,
    )
