"""HardNet patch descriptor + LAF-based patch extraction (DoGHardNet path).

The reference computes SIFT keypoints, then describes 32x32 affine-warped
patches with kornia's HardNet CNN (reference dog_hardnet.py:13-39, via
``LAFDescriptor(HardNet)`` and ``laf_from_center_scale_ori``). kornia's
HardNet is the architecture of Mishchuk et al., "Working hard to know your
neighbor's margins" (NeurIPS 2017): seven 3x3/8x8 conv-BN(affine=False)-ReLU
stages on 1x32x32 input-normalized patches, output L2-normalized 128-d.

Here: the CNN in NHWC JAX; patch extraction as affine bilinear sampling at
LAF = scale * R(ori) about the keypoint center (kornia
``laf_from_center_scale_ori`` semantics with scale = 6 * sift_scale).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import nn


# conv stages: (in, out, kernel, stride)
_STAGES = [
    (1, 32, 3, 1),
    (32, 32, 3, 1),
    (32, 64, 3, 2),
    (64, 64, 3, 1),
    (64, 128, 3, 2),
    (128, 128, 3, 1),
]


def init_params(key) -> nn.Params:
    keys = jax.random.split(key, 8)
    p = {}
    for i, (ci, co, ks, _) in enumerate(_STAGES):
        p[f"conv{i}"] = nn.conv2d_init(keys[i], ci, co, ks, bias=False)
        p[f"bn{i}"] = nn.batch_norm_init(co)
    # final 8x8 VALID conv to 128 (kornia HardNet features.21)
    p["conv6"] = nn.conv2d_init(keys[6], 128, 128, 8, bias=False)
    p["bn6"] = nn.batch_norm_init(128)
    return p


def _input_norm(patches: jnp.ndarray) -> jnp.ndarray:
    """Per-patch standardization (kornia HardNet input norm; torch.std is
    UNBIASED — ddof=1)."""
    mean = jnp.mean(patches, axis=(1, 2, 3), keepdims=True)
    std = jnp.std(patches, axis=(1, 2, 3), keepdims=True, ddof=1)
    return (patches - mean) / (std + 1e-6)


def describe_patches(p: nn.Params, patches: jnp.ndarray) -> jnp.ndarray:
    """patches: (N, 32, 32, 1) -> (N, 128) L2-normalized."""
    x = _input_norm(patches)
    for i, (_, _, ks, stride) in enumerate(_STAGES):
        x = nn.conv2d(p[f"conv{i}"], x, stride=stride, padding=1)
        x = nn.batch_norm(p[f"bn{i}"], x)
        x = jax.nn.relu(x)
    x = nn.conv2d(p["conv6"], x, padding="VALID")  # (N, 1, 1, 128)
    x = nn.batch_norm(p["bn6"], x)
    desc = x.reshape(x.shape[0], -1)
    return nn.l2_normalize(desc, axis=-1)


def extract_laf_patches(
    image: jnp.ndarray,
    centers: jnp.ndarray,
    scales: jnp.ndarray,
    oris: jnp.ndarray,
    patch_size: int = 32,
) -> jnp.ndarray:
    """Affine patch extraction at LAFs (kornia laf_from_center_scale_ori +
    patch sampling semantics).

    image: (H, W) grayscale; centers (K, 2) pixel (x, y); scales (K) = LAF
    scale (6 * sift scale in the DoGHardNet pipeline); oris (K) radians.
    Patch sample grid: x(u,v) = c + (scale/2) * R(ori) @ (u, v) for
    u, v in linspace(-1, 1, ps). Returns (K, ps, ps, 1).
    """
    return extract_laf_patches_batch(
        image[None], centers[None], scales[None], oris[None], patch_size
    )[0]


def extract_laf_patches_batch(
    images: jnp.ndarray,
    centers: jnp.ndarray,
    scales: jnp.ndarray,
    oris: jnp.ndarray,
    patch_size: int = 32,
) -> jnp.ndarray:
    """Batched ``extract_laf_patches``: images (B, H, W), centers (B, K, 2),
    scales/oris (B, K) -> (B, K, ps, ps, 1).

    The batch axis is folded into the gather's FLAT row index (one shared
    (B*H*W, 4) quad table + per-image offsets) instead of vmapping the
    single-image gather: a vmapped take is a 2-coordinate XLA gather, the
    measured catastrophic pattern on TPU (memory: tpu-op-costs), while the
    flat 1-D row take stays on the fast path."""
    b, h, w = images.shape
    ps = patch_size
    lin = jnp.linspace(-1.0, 1.0, ps)
    uu, vv = jnp.meshgrid(lin, lin)  # vv rows (y), uu cols (x)
    grid = jnp.stack([uu, vv], -1).reshape(-1, 2)  # (ps*ps, 2) as (u, v)

    cos = jnp.cos(oris)
    sin = jnp.sin(oris)
    # kornia LAF: [[s*cos, -s*sin], [s*sin, s*cos]] / 2 applied to (u, v)
    half = scales[..., None, None] / 2.0
    rot = jnp.stack(
        [jnp.stack([cos, -sin], -1), jnp.stack([sin, cos], -1)], -2
    )  # (B, K, 2, 2)
    pts = centers[..., None, :] + half * jnp.einsum(
        "bkij,pj->bkpi", rot, grid
    )  # (B, K, ps*ps, 2) pixel coords (x, y)

    # bilinear sample with border clamp (align_corners grid in pixels)
    fx = jnp.clip(pts[..., 0], 0.0, w - 1.0)
    fy = jnp.clip(pts[..., 1], 0.0, h - 1.0)
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = fx - x0
    wy = fy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    # quad-table bilinear (same trick as the ALIKED deform conv): stack
    # each pixel's 4 bilinear corners as a 4-wide row, then ONE row gather
    # per sample replaces 4 scalar gathers — scalar-gather element count
    # was the wall (4.2M scalars = 30 ms; row gathers pay per ROW)
    pe = jnp.pad(images, ((0, 0), (0, 1), (0, 1)), mode="edge")
    quad = jnp.stack(
        [pe[:, :-1, :-1], pe[:, :-1, 1:], pe[:, 1:, :-1], pe[:, 1:, 1:]], -1
    ).reshape(b * h * w, 4)
    # the +1 corner edge clamps match the 'edge' pad duplicate exactly
    base = (jnp.arange(b, dtype=jnp.int32) * (h * w))[:, None, None]
    idx = base + y0i * w + x0i  # (B, K, ps*ps) flat rows
    v = jnp.take(quad, idx.reshape(-1), axis=0).reshape(*idx.shape, 4)
    v00, v01, v10, v11 = v[..., 0], v[..., 1], v[..., 2], v[..., 3]
    vals = (v00 * (1 - wx) + v01 * wx) * (1 - wy) + (
        v10 * (1 - wx) + v11 * wx
    ) * wy
    return vals.reshape(b, -1, ps, ps, 1)


def forward(params, conf, images: jnp.ndarray, sizes=None):
    """Device-side DoGHardNet: TPU SIFT detection + HardNet descriptors on
    LAF patches, one program (reference dog_hardnet.py:27-39 runs this as a
    host loop around OpenCV + kornia). ``conf`` is a SIFTConfig; ``params``
    the HardNet param pytree. images: (B, H, W) gray or (B, H, W, 1) float
    [0, 1]. Returns Features (scales/oris populated, no RootSIFT)."""
    from . import sift_jax
    from .superpoint import Features

    if images.ndim == 4:
        if images.shape[-1] == 3:  # reference rgb_to_grayscale weights
            images = images @ jnp.asarray([0.299, 0.587, 0.114], images.dtype)
        else:
            images = images[..., 0]
    det = sift_jax.extract_batch(images, conf)
    # LAF scale = 6 * kpt.size (reference dog_hardnet.py:35)
    patches = extract_laf_patches_batch(
        images, det["keypoints"], 6.0 * det["scales"], det["oris"]
    )
    b, k = patches.shape[:2]
    desc = describe_patches(
        params, patches.reshape(b * k, *patches.shape[2:])
    ).reshape(b, k, -1)
    desc = jnp.where(det["valid"][..., None], desc, 0.0)
    return Features(
        keypoints=det["keypoints"],
        keypoint_scores=det["keypoint_scores"],
        descriptors=desc,
        valid=det["valid"],
        image_size=sizes,
        scales=det["scales"],
        oris=det["oris"],
    )
