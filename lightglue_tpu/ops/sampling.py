"""Bilinear point sampling (grid_sample replacement) and detection helpers.

The reference relies on ``torch.nn.functional.grid_sample`` (CUDA kernel) for
descriptor lookup (superpoint.py:78-95, aliked.py) and on boolean
``torch.where`` thresholding for keypoint extraction (superpoint.py:189),
which produces dynamic shapes. On TPU both become gather-based, static-shape
ops: bilinear interpolation is 4 gathers + lerp (XLA fuses this well), and
detection is a global top-k with a validity mask.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..utils import diagnostics


def bilinear_sample(
    fmap: jnp.ndarray,
    pts: jnp.ndarray,
    align_corners: bool = True,
    row_l2_normalize: bool = False,
) -> jnp.ndarray:
    """Sample ``fmap`` (B, H, W, C) at normalized points ``pts`` (B, K, 2) in
    [-1, 1] (x, y) — semantics of grid_sample(mode='bilinear',
    align_corners=True) with zero padding.

    ``row_l2_normalize`` L2-normalizes each gathered corner row before the
    lerp — identical to sampling an L2-normalized map (lerp of normalized
    corners) without ever materializing it densely.

    Returns (B, K, C).
    """
    b, h, w, c = fmap.shape
    x, y = pts[..., 0], pts[..., 1]
    if align_corners:
        fx = (x + 1.0) * 0.5 * (w - 1)
        fy = (y + 1.0) * 0.5 * (h - 1)
    else:
        fx = (x + 1.0) * 0.5 * w - 0.5
        fy = (y + 1.0) * 0.5 * h - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = fx - x0
    wy = fy - y0

    def gather(yi, xi):
        # zero padding outside
        inside = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        flat = fmap.reshape(b, h * w, c)
        idx = yc * w + xc  # (B, K)
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
        if row_l2_normalize:
            f32 = vals.astype(jnp.float32)
            n = jnp.linalg.norm(f32, axis=-1, keepdims=True)
            vals = (f32 / jnp.maximum(n, 1e-12)).astype(vals.dtype)
        return jnp.where(inside[..., None], vals, 0.0)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    wx = wx[..., None].astype(fmap.dtype)
    wy = wy[..., None].astype(fmap.dtype)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


class _NMSDispatch:
    """Process-wide switch for the fused Pallas NMS path (ops/nms.py)."""

    enabled = True


def _nms_use_pallas(h: int, w: int, nms_radius: int) -> bool:
    if not _NMSDispatch.enabled:
        return False
    from ..models.lightglue import _on_tpu

    if not _on_tpu():
        return False
    from .nms import nms_pallas_ok

    return nms_pallas_ok(h, w, nms_radius)


def simple_nms(scores: jnp.ndarray, nms_radius: int) -> jnp.ndarray:
    """Iterative max-pool NMS over (B, H, W) score maps — exact port of the
    reference algorithm (superpoint.py:52-68): two suppression rounds.

    On TPU this dispatches to the fused Pallas strip kernel (ops/nms.py,
    bitwise-identical) for radius >= 3 only — at small radii the XLA path
    is cheap and the kernel hurts surrounding fusion (see nms_pallas_ok
    for the full-composition measurements)."""
    assert nms_radius >= 0
    b, h, w = scores.shape
    if _nms_use_pallas(h, w, nms_radius):
        from .nms import simple_nms_pallas

        return simple_nms_pallas(scores, nms_radius)
    s = scores[..., None]  # (B, H, W, 1)

    def max_pool(x):
        # separable: max over a (k x k) window == rows pass then cols pass
        # (exact; 2k taps/pixel instead of k^2 — at the reference's r=4
        # that is 18 vs 81 VPU compares over the full-res map per pool)
        k = 2 * nms_radius + 1
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, k, 1, 1), (1, 1, 1, 1), "SAME"
        )
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 1, k, 1), (1, 1, 1, 1), "SAME"
        )

    zeros = jnp.zeros_like(s)
    max_mask = s == max_pool(s)
    for _ in range(2):
        supp_mask = max_pool(max_mask.astype(s.dtype)) > 0
        supp_scores = jnp.where(supp_mask, zeros, s)
        new_max_mask = supp_scores == max_pool(supp_scores)
        max_mask = max_mask | (new_max_mask & (~supp_mask))
    return jnp.where(max_mask, s, zeros)[..., 0]


def top_k_keypoints(
    scores: jnp.ndarray, k: int, threshold: float,
    approx_recall: float = 0.0, twolevel: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Static-shape keypoint selection replacing the reference's dynamic
    ``torch.where(scores > threshold)`` + per-image top-k
    (superpoint.py:188-207).

    scores: (B, H, W). Returns (keypoints (B, k, 2) as (x, y) fp32,
    kscores (B, k), valid (B, k) bool). Invalid slots have score<=threshold
    (they hold whatever sorted below the cut — callers must respect ``valid``).

    ``approx_recall`` > 0 uses the TPU-optimized ``lax.approx_max_k``
    (e.g. 0.95 is ~8x faster than exact top-k at 1M candidates; observed
    recall on sparse post-NMS maps is ~0.998) — only the weakest detections
    near the cut can differ from exact selection.

    ``twolevel`` selects the EXACT row-capped two-level form
    (ops/topk.py::topk2d): its lax.cond fallback costs ~+2.5 ms of graph
    pessimization per program at B=1 (why it is off by default), but in
    batched extraction the penalty is per PROGRAM while the ~6x top-k
    saving is per IMAGE.
    """
    b, h, w = scores.shape
    flat = scores.reshape(b, h * w)
    if twolevel and approx_recall <= 0:
        from .topk import topk2d

        kscores, idx = topk2d(scores, k)
        ys = (idx // w).astype(jnp.float32)
        xs = (idx % w).astype(jnp.float32)
        kpts = jnp.stack([xs, ys], axis=-1)
        return kpts, kscores, kscores > threshold
    if approx_recall > 0:
        diagnostics.warn_once(
            "approx-topk",
            f"approximate top-k active (recall_target={approx_recall}): "
            "keypoint selection near the score cut may differ from exact "
            "top-k. Set approx_topk=0 for reference-exact selection.",
        )
        kscores, idx = jax.lax.approx_max_k(
            flat, k, recall_target=approx_recall
        )
    else:
        kscores, idx = jax.lax.top_k(flat, k)
    ys = (idx // w).astype(jnp.float32)
    xs = (idx % w).astype(jnp.float32)
    kpts = jnp.stack([xs, ys], axis=-1)
    valid = kscores > threshold
    return kpts, kscores, valid
