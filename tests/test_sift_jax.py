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
    # the reference feeds OpenCV uint8-truncated pixels (sift.py:186);
    # match its input exactly
    gray_q = np.floor(gray * 255.0).astype(np.float32) / 255.0
    out = jax.jit(sift_jax.extract_single, static_argnames=("conf",))(
        jnp.asarray(gray_q), conf
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
    # measured 2026-08 (128px sacre_coeur): recall 1.000 @1px once the
    # pyramid matches the reference's effective nOctaveLayers
    assert (nn < 2.0).mean() > 0.95, f"recall@2px {(nn < 2.0).mean():.2f}"
    assert (nn < 1.0).mean() > 0.9, f"recall@1px {(nn < 1.0).mean():.2f}"
    close = nn < 1.0
    assert close.sum() >= 10
    gd = out["descriptors"][out["valid"]][match_idx[close]]
    rd = ref["descriptors"][close]
    gd = gd / np.maximum(np.linalg.norm(gd, axis=-1, keepdims=True), 1e-9)
    rd = rd / np.maximum(np.linalg.norm(rd, axis=-1, keepdims=True), 1e-9)
    cos = (gd * rd).sum(-1)
    # measured 0.992 median (2026-08) — matched pyramid + exact refine
    assert np.median(cos) > 0.95, f"descriptor cosine median {np.median(cos):.3f}"
    go = out["oris"][out["valid"]][match_idx[close]]
    ro = ref["oris"][close] % (2 * np.pi)
    diff = np.abs(np.angle(np.exp(1j * (go - ro))))
    assert np.median(diff) < 0.05
    # response ORDERING must agree near the top-k cut (rank correlation)
    gs = out["keypoint_scores"][out["valid"]][match_idx[close]]
    rs = ref["keypoint_scores"][close]
    from scipy.stats import spearmanr

    assert spearmanr(gs, rs).statistic > 0.95


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


@pytest.mark.slow
def test_extract_batch_matches_single():
    import numpy as np

    from lightglue_tpu.configs import SIFTConfig
    from lightglue_tpu.models import sift_jax

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 1, (2, 64, 96)).astype(np.float32))
    conf = SIFTConfig(max_num_keypoints=32)
    batched = jax.jit(
        sift_jax.extract_batch, static_argnames=("conf",)
    )(imgs, conf)
    for b in range(2):
        single = jax.jit(
            sift_jax.extract_single, static_argnames=("conf",)
        )(imgs[b], conf)
        for k in single:
            np.testing.assert_allclose(
                np.asarray(batched[k][b]), np.asarray(single[k]),
                atol=1e-5, err_msg=k,
            )
