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
