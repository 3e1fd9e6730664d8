"""SuperPoint detector+descriptor, TPU-native.

Re-design of the reference (lightglue/superpoint.py:98-227) in NHWC JAX:
the VGG-style encoder and both heads are XLA convolutions; NMS is the same
iterative max-pool algorithm; the dynamic ``torch.where`` threshold +
per-image top-k (superpoint.py:188-207) becomes one static-shape global
top-k with a validity mask; descriptor lookup is a gather-based bilinear
sampler instead of ``grid_sample``.

Weights: convert the reference release checkpoint with
``weights.convert_superpoint`` (OIHW -> HWIO).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .. import nn
from ..configs import SuperPointConfig
from ..ops.sampling import bilinear_sample, simple_nms, top_k_keypoints

RGB_TO_GRAY = (0.299, 0.587, 0.114)


class Features(NamedTuple):
    """Extractor output; ``valid`` marks real keypoint slots (static k)."""

    keypoints: jnp.ndarray  # (B, K, 2) (x, y) pixels
    keypoint_scores: jnp.ndarray  # (B, K)
    descriptors: jnp.ndarray  # (B, K, D)
    valid: jnp.ndarray  # (B, K) bool
    image_size: Optional[jnp.ndarray] = None  # (B, 2) (w, h)
    scales: Optional[jnp.ndarray] = None  # (B, K) — SIFT-family only
    oris: Optional[jnp.ndarray] = None  # (B, K)


def init_params(key, conf: SuperPointConfig = SuperPointConfig()) -> nn.Params:
    """Random init with the reference layer shapes (superpoint.py:121-142)."""
    c1, c2, c3, c4, c5 = 64, 64, 128, 128, 256
    specs = {
        "conv1a": (1, c1, 3), "conv1b": (c1, c1, 3),
        "conv2a": (c1, c2, 3), "conv2b": (c2, c2, 3),
        "conv3a": (c2, c3, 3), "conv3b": (c3, c3, 3),
        "conv4a": (c3, c4, 3), "conv4b": (c4, c4, 3),
        "convPa": (c4, c5, 3), "convPb": (c5, 65, 1),
        "convDa": (c4, c5, 3), "convDb": (c5, conf.descriptor_dim, 1),
    }
    keys = jax.random.split(key, len(specs))
    return {
        name: nn.conv2d_init(k, ci, co, ks)
        for k, (name, (ci, co, ks)) in zip(keys, specs.items())
    }


def rgb_to_grayscale(image: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) -> (B, H, W, 1), ITU-R 601 weights (kornia-compatible)."""
    w = jnp.asarray(RGB_TO_GRAY, image.dtype)
    return jnp.sum(image * w, axis=-1, keepdims=True)


def dense_forward(
    params: nn.Params,
    image: jnp.ndarray,
    mp: bool = False,
    fused_stem: bool = True,
):
    """Shared encoder + both heads on (B, H, W, C) images; returns the
    full-res NMS'd score map (B, H, W) and the dense descriptor map
    (B, H/8, W/8, D), L2-normalized (superpoint.py:158-215).

    ``mp``: run convs in bfloat16 (fp32 accumulation via
    preferred_element_type; softmax + descriptor norm stay fp32).

    Layout note: the VGG trunk stays as plain direct convs on purpose —
    2x2 space-to-depth repackings of block 1/2 (phases conv + lane-wise
    phase max-pool, im2col first conv) were each measured SLOWER in full
    composition on v5e (direct 2.82 ms/img vs 3.09-3.95 for the packed
    variants at 768x1024 B8) even though they win in isolation: XLA fuses
    the direct chain better than any hand repacking."""
    if image.shape[-1] == 3:
        image = rgb_to_grayscale(image)
    x = image.astype(jnp.bfloat16) if mp else image

    def cbr(name, x):  # conv + relu
        return jax.nn.relu(nn.conv2d(params[name], x))

    from . import lightglue as _lg  # _on_tpu, no cycle at import time
    from ..ops import stem as _stem
    from ..ops import stem2 as _stem2

    h, w = image.shape[1:3]
    use_stem = fused_stem and _lg._on_tpu() and _stem.stem_pallas_ok(h, w)
    use_block2 = use_stem and _stem2.block2_pallas_ok(h, w)
    if use_stem:
        # Fused conv1a+conv1b+pool1 Pallas strip kernel: the full-res
        # stretch is 1.61 of 2.59 ms/img composed from XLA convs; the
        # kernel does it in 0.83 ms (B8 768x1024 bf16, v5e) and unlike
        # the ALIKED score-head case (aliked.py:222) its NHWC output
        # needs no relayout, so the win survives composition. When the
        # block-2 kernel can also engage, the stem emits channel-plane
        # layout directly (no NHWC transpose between the two kernels).
        x = _stem.fused_stem_pallas(
            {"conv1a": params["conv1a"], "conv1b": params["conv1b"]},
            image, mp=mp,
            out_layout="cplane" if use_block2 else "nhwc",
        )
    else:
        x = cbr("conv1a", x)
        x = cbr("conv1b", x)
        x = nn.max_pool(x, 2)
    if use_block2:
        # Fused conv2a+conv2b+pool2 at H/2 (ops/stem2.py): the remaining
        # full-ish-res stretch of the encoder, same strip-kernel design.
        x = _stem2.fused_block2_pallas(
            {"conv2a": params["conv2a"], "conv2b": params["conv2b"]},
            x, h2=h // 2, w2=w // 2, mp=mp,
        )
    else:
        x = cbr("conv2a", x)
        x = cbr("conv2b", x)
        x = nn.max_pool(x, 2)
    x = cbr("conv3a", x)
    x = cbr("conv3b", x)
    x = nn.max_pool(x, 2)
    x = cbr("conv4a", x)
    x = cbr("conv4b", x)

    # detector head: 65-ch softmax, drop dustbin, 8x8 pixel shuffle
    cpa = cbr("convPa", x)
    logits = nn.conv2d(params["convPb"], cpa)  # (B, h, w, 65)
    scores = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[..., :-1]
    b, h, w, _ = scores.shape
    scores = scores.reshape(b, h, w, 8, 8)
    scores = scores.transpose(0, 1, 3, 2, 4).reshape(b, h * 8, w * 8)

    # descriptor head
    cda = cbr("convDa", x)
    desc = nn.conv2d(params["convDb"], cda)
    desc = nn.l2_normalize(desc.astype(jnp.float32), axis=-1)
    return scores, desc


def sample_descriptors(
    keypoints: jnp.ndarray, desc_map: jnp.ndarray, s: int = 8
) -> jnp.ndarray:
    """Bilinear descriptor lookup at full-res keypoint locations
    (superpoint.py:78-95). keypoints (B, K, 2) in pixels; desc_map
    (B, h, w, D) at stride s."""
    b, hh, ww, d = desc_map.shape
    kp = keypoints - s / 2 + 0.5
    denom = jnp.asarray(
        [ww * s - s / 2 - 0.5, hh * s - s / 2 - 0.5], keypoints.dtype
    )
    kp = kp / denom[None, None]
    kp = kp * 2 - 1
    sampled = bilinear_sample(desc_map, kp, align_corners=True)
    return nn.l2_normalize(sampled, axis=-1)


def forward(
    params: nn.Params,
    conf: SuperPointConfig,
    image: jnp.ndarray,
    image_size: Optional[jnp.ndarray] = None,
) -> Features:
    """Full extraction: (B, H, W, C) image -> static-k Features.

    H and W must be multiples of 8 (the reference's pixel-shuffle implicitly
    requires the same; pad via utils.image.pad_to_multiple). ``image_size``
    (B, 2) as (w, h) gives the true extent when the image was padded —
    detections in the pad band are suppressed (the reference instead crops
    per-image, sift.py:207-210).
    """
    scores, desc_map = dense_forward(
        params, image, mp=conf.mp, fused_stem=conf.fused_stem
    )
    # materialize once — XLA otherwise may duplicate the shared VGG trunk
    # into the detector and descriptor consumers (see aliked.forward)
    scores, desc_map = jax.lax.optimization_barrier((scores, desc_map))
    scores = simple_nms(scores, conf.nms_radius)
    # border removal (superpoint.py:181-186): set border band to -1,
    # measured from the true image extent when padded
    pad = conf.remove_borders
    b, h, w = scores.shape
    ys = jnp.arange(h)[None, :, None].astype(jnp.float32)
    xs = jnp.arange(w)[None, None, :].astype(jnp.float32)
    if image_size is not None:
        tw = image_size[:, 0][:, None, None].astype(jnp.float32)
        th = image_size[:, 1][:, None, None].astype(jnp.float32)
    else:
        tw = jnp.full((b, 1, 1), float(w))
        th = jnp.full((b, 1, 1), float(h))
    if pad or image_size is not None:
        border = (ys < pad) | (ys >= th - pad) | (xs < pad) | (xs >= tw - pad)
        scores = jnp.where(border, -1.0, scores)
    kpts, kscores, valid = top_k_keypoints(
        scores, conf.max_num_keypoints, conf.detection_threshold,
        approx_recall=conf.approx_topk, twolevel=conf.twolevel_topk,
    )
    descs = sample_descriptors(kpts, desc_map, 8)
    return Features(
        keypoints=kpts,
        keypoint_scores=jnp.where(valid, kscores, 0.0),
        descriptors=jnp.where(valid[..., None], descs, 0.0),
        valid=valid,
    )
