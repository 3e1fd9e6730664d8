"""SIFT keypoints + descriptors.

The reference wraps OpenCV's C++ SIFT (or pycolmap) per image on the host
(lightglue/sift.py:97-216). Here there are two backends:

* ``backend="opencv"`` — host-side cv2.SIFT exactly like the reference,
  including duplicate filtering (``filter_dog_point``) and RootSIFT, padded
  to a static keypoint count for the TPU matcher.
* ``backend="jax"`` — TPU-native Gaussian scale-space DoG pipeline
  (models/sift_jax.py): conv pyramid + 26-neighbor extrema + quadratic
  refinement + orientation histograms + 4x4x8 descriptors, all static-shape
  under jit.

Both emit the extra ``scales``/``oris`` arrays consumed by LightGlue's
scale/orientation-aware positional encoding (reference lightglue.py:495-501).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ..configs import SIFTConfig

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def filter_dog_point(
    points: np.ndarray,
    scales: np.ndarray,
    angles: np.ndarray,
    image_shape,
    nms_radius: int,
    scores: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Remove duplicate DoG detections and apply NMS; returns kept indices
    (exact port of reference sift.py:17-50)."""
    h, w = image_shape
    ij = np.round(points - 0.5).astype(int).T[::-1]

    # remove duplicate points (identical coordinates); pick highest scale or
    # score
    s = scales if scores is None else scores
    buffer = np.zeros((h, w))
    np.maximum.at(buffer, tuple(ij), s)
    keep = np.where(buffer[tuple(ij)] == s)[0]

    # pick lowest angle (arbitrary tie-break)
    ij = ij[:, keep]
    buffer[:] = np.inf
    o_abs = np.abs(angles[keep])
    np.minimum.at(buffer, tuple(ij), o_abs)
    mask = buffer[tuple(ij)] == o_abs
    ij = ij[:, mask]
    keep = keep[mask]

    if nms_radius > 0:
        buffer[:] = 0
        buffer[tuple(ij)] = s[keep]
        # dilate with a (2r+1) max filter (the reference uses max_pool2d)
        from scipy.ndimage import maximum_filter

        local_max = maximum_filter(buffer, size=2 * nms_radius + 1,
                                   mode="constant")
        is_local_max = buffer == local_max
        keep = keep[is_local_max[tuple(ij)]]
    return keep


def sift_to_rootsift(x: np.ndarray, eps: float = 1e-6) -> np.ndarray:
    """L1-normalize -> sqrt -> L2-normalize (reference sift.py:53-56)."""
    x = x / np.maximum(
        np.linalg.norm(x, ord=1, axis=-1, keepdims=True), eps
    )
    x = np.sqrt(np.clip(x, eps, None))
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), eps)


def run_opencv_sift(features, image: np.ndarray):
    """Detect + describe with cv2 (reference sift.py:59-76)."""
    detections, descriptors = features.detectAndCompute(image, None)
    points = np.array([k.pt for k in detections], dtype=np.float32)
    scores = np.array([k.response for k in detections], dtype=np.float32)
    scales = np.array([k.size for k in detections], dtype=np.float32)
    angles = np.deg2rad(
        np.array([k.angle for k in detections], dtype=np.float32)
    )
    return points, scores, scales, angles, descriptors


def extract_single_image_opencv(
    image: np.ndarray, conf: SIFTConfig
) -> Dict[str, np.ndarray]:
    """Host-side single-image extraction (reference sift.py:140-196 for the
    opencv backend). ``image``: (H, W) float [0, 1]."""
    if cv2 is None:
        raise ImportError("opencv backend requires cv2")
    sift = cv2.SIFT_create(
        contrastThreshold=conf.detection_threshold,
        nfeatures=conf.max_num_keypoints,
        edgeThreshold=conf.edge_threshold,
        nOctaveLayers=conf.num_octaves,
    )
    keypoints, scores, scales, angles, descriptors = run_opencv_sift(
        sift, (image * 255.0).astype(np.uint8)
    )
    if len(keypoints) == 0:
        return {
            "keypoints": np.zeros((0, 2), np.float32),
            "scales": np.zeros((0,), np.float32),
            "oris": np.zeros((0,), np.float32),
            "descriptors": np.zeros((0, 128), np.float32),
            "keypoint_scores": np.zeros((0,), np.float32),
        }
    pred = {
        "keypoints": keypoints,
        "scales": scales,
        "oris": angles,
        "descriptors": descriptors,
        "keypoint_scores": scores,
    }
    if conf.nms_radius is not None:
        keep = filter_dog_point(
            pred["keypoints"], pred["scales"], pred["oris"], image.shape,
            conf.nms_radius, scores=pred["keypoint_scores"],
        )
        pred = {k: v[keep] for k, v in pred.items()}
    # keep top-k by score
    k = conf.max_num_keypoints
    if k is not None and len(pred["keypoints"]) > k:
        indices = np.argsort(-pred["keypoint_scores"])[:k]
        pred = {k_: v[indices] for k_, v in pred.items()}
    return pred


def pad_features(
    pred: Dict[str, np.ndarray], k: int
) -> Dict[str, np.ndarray]:
    """Pad a ragged single-image prediction to k slots + validity mask."""
    n = len(pred["keypoints"])
    out = {}
    valid = np.zeros((k,), bool)
    valid[: min(n, k)] = True
    for key, v in pred.items():
        v = v[:k]
        widths = [(0, k - len(v))] + [(0, 0)] * (v.ndim - 1)
        out[key] = np.pad(v, widths, constant_values=0.0 if key != "scales" else 1.0)
    out["valid"] = valid
    return out
