"""SIFT opencv-backend parity vs the torch reference (both drive cv2)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
cv2 = pytest.importorskip("cv2")

from ref_loader import load_ref_module  # noqa: E402

ref_sift_mod = load_ref_module("sift")

from lightglue_tpu.pipeline import SIFT  # noqa: E402
from lightglue_tpu.models import sift as sift_model  # noqa: E402
from lightglue_tpu.utils.image import load_image  # noqa: E402

ASSET = "/root/reference/assets/sacre_coeur1.jpg"


def test_rootsift_parity():
    rng = np.random.default_rng(0)
    x = np.abs(rng.standard_normal((10, 128)).astype(np.float32))
    ref = ref_sift_mod.sift_to_rootsift(torch.from_numpy(x.copy())).numpy()
    got = sift_model.sift_to_rootsift(x)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_filter_dog_point_parity():
    """The sparse lexsort/KDTree re-derivation must select exactly the same
    indices as the reference's dense scatter-buffer version (sift.py:17-50),
    including pixel collisions, score/angle ties, and radius NMS."""
    rng = np.random.default_rng(3)
    n, h, w = 400, 60, 80
    # force many integer-pixel collisions by snapping half the points
    pts = rng.uniform(0.5, [w - 1.0, h - 1.0], (n, 2)).astype(np.float32)
    pts[: n // 2] = np.round(pts[: n // 2])
    scales = rng.uniform(1, 4, n).astype(np.float32)
    angles = rng.uniform(-np.pi, np.pi, n).astype(np.float32)
    scores = rng.choice([0.1, 0.2, 0.3, 0.5], n).astype(np.float32)  # ties
    for nms_radius in (0, 2, 5):
        for sc in (scores, None):
            ref = ref_sift_mod.filter_dog_point(
                pts, scales, angles, (h, w), nms_radius, scores=sc
            )
            got = sift_model.filter_dog_point(
                pts, scales, angles, (h, w), nms_radius, scores=sc
            )
            np.testing.assert_array_equal(np.sort(ref), got)


def test_pycolmap_backend_surface():
    """Backend dispatch parity (reference sift.py:96-138): pycolmap configs
    are accepted and fail with a clear ImportError when the dep is absent;
    unknown backends raise ValueError."""
    for backend in ("pycolmap", "pycolmap_cpu", "pycolmap_cuda"):
        ours = SIFT(backend=backend, resize=None)
        try:
            import pycolmap  # noqa: F401

            has_pycolmap = True
        except ImportError:
            has_pycolmap = False
        if not has_pycolmap:
            with pytest.raises(ImportError, match="pycolmap"):
                ours.extract(np.zeros((32, 32), np.float32))
    with pytest.raises(ValueError, match="Unknown SIFT backend"):
        SIFT(backend="bogus", resize=None).extract(
            np.zeros((32, 32), np.float32)
        )


def test_extract_parity_vs_reference():
    image = load_image(ASSET, resize=320)  # pre-resize so both skip resizing
    gray = image @ np.array([0.299, 0.587, 0.114], np.float32)

    ref = ref_sift_mod.SIFT(max_num_keypoints=256)
    ref_feats = ref.extract(
        torch.from_numpy(gray[None]), resize=None
    )  # (1, K, ...)
    ours = SIFT(max_num_keypoints=256, resize=None)
    got = ours.extract(gray)

    rk = ref_feats["keypoints"][0].numpy()
    gk = got["keypoints"][0][got["valid"][0]]
    assert len(rk) == len(gk)
    order_r = np.lexsort((rk[:, 0], rk[:, 1]))
    order_g = np.lexsort((gk[:, 0], gk[:, 1]))
    np.testing.assert_allclose(gk[order_g], rk[order_r], atol=1e-4)
    rd = ref_feats["descriptors"][0].numpy()
    gd = got["descriptors"][0][got["valid"][0]]
    np.testing.assert_allclose(gd[order_g], rd[order_r], atol=1e-4)
    ro = ref_feats["oris"][0].numpy()
    go = got["oris"][0][got["valid"][0]]
    np.testing.assert_allclose(go[order_g], ro[order_r], atol=1e-5)
