"""TPU-native JAX SIFT: statistical parity vs OpenCV on a real image.

Exact OpenCV parity is impossible (different sampling schemes); assert the
quality bar documented in models/sift_jax.py: most cv2 keypoints recovered,
descriptors strongly correlated, orientations/scales matched.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lightglue_tpu.configs import SIFTConfig
from lightglue_tpu.models import sift_jax
from lightglue_tpu.models import sift as sift_cv
from lightglue_tpu.utils.image import load_image

cv2 = pytest.importorskip("cv2")


@pytest.mark.slow
def test_jax_sift_vs_opencv_statistics():
    img = load_image("/root/reference/assets/sacre_coeur1.jpg", resize=128)
    gray = img @ np.array([0.299, 0.587, 0.114], np.float32)
    conf = SIFTConfig(max_num_keypoints=512)
    out = jax.jit(sift_jax.extract_single, static_argnames=("conf",))(
        jnp.asarray(gray), conf
    )
    out = {k: np.asarray(v) for k, v in out.items()}
    ref = sift_cv.extract_single_image_opencv(
        gray, SIFTConfig(max_num_keypoints=128)
    )
    gk = out["keypoints"][out["valid"]]
    rk = ref["keypoints"]
    assert len(gk) > 50 and len(rk) > 20
    d2 = ((rk[:, None, :] - gk[None, :, :]) ** 2).sum(-1)
    nn = d2.min(1) ** 0.5
    match_idx = d2.argmin(1)
    assert (nn < 2.0).mean() > 0.6, f"recall@2px {(nn < 2.0).mean():.2f}"
    close = nn < 1.0
    if close.sum() >= 10:
        gd = out["descriptors"][out["valid"]][match_idx[close]]
        rd = ref["descriptors"][close]
        gd = gd / np.maximum(np.linalg.norm(gd, axis=-1, keepdims=True), 1e-9)
        rd = rd / np.maximum(np.linalg.norm(rd, axis=-1, keepdims=True), 1e-9)
        cos = (gd * rd).sum(-1)
        assert np.median(cos) > 0.9, f"descriptor cosine median {np.median(cos):.3f}"
        go = out["oris"][out["valid"]][match_idx[close]]
        ro = ref["oris"][close] % (2 * np.pi)
        diff = np.abs(np.angle(np.exp(1j * (go - ro))))
        assert np.median(diff) < 0.1


@pytest.mark.slow
def test_jax_backend_pipeline():
    from lightglue_tpu.pipeline import SIFT

    ex = SIFT(backend="jax", max_num_keypoints=128, resize=96)
    img = load_image("/root/reference/assets/sacre_coeur1.jpg")
    feats = ex.extract(img)
    assert feats["keypoints"].shape == (1, 128, 2)
    assert feats["valid"].sum() > 10
    d = feats["descriptors"][0][feats["valid"][0]]
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-3)
