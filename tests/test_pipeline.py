"""End-to-end pipeline tests on the bundled reference assets (real images)."""

import numpy as np
import pytest

from lightglue_tpu.pipeline import LightGlue, SuperPoint, match_pair, rbd
from lightglue_tpu.utils.image import load_image

ASSET0 = "/root/reference/assets/sacre_coeur1.jpg"
ASSET1 = "/root/reference/assets/sacre_coeur2.jpg"


@pytest.fixture(scope="module")
def pair_result():
    extractor = SuperPoint(max_num_keypoints=256, resize=320)
    matcher = LightGlue(
        "superpoint", depth_confidence=-1.0, width_confidence=-1.0
    )
    image0 = load_image(ASSET0)
    image1 = load_image(ASSET1)
    feats0, feats1, matches01 = match_pair(extractor, matcher, image0, image1)
    return image0, image1, feats0, feats1, matches01


def test_feats_format(pair_result):
    image0, _, feats0, _, _ = pair_result
    assert feats0["keypoints"].shape == (256, 2)
    assert feats0["descriptors"].shape == (256, 256)
    assert feats0["keypoint_scores"].shape == (256,)
    h, w = image0.shape[:2]
    np.testing.assert_array_equal(feats0["image_size"], [w, h])
    # keypoints in original pixel coords
    kp = feats0["keypoints"][feats0["valid"]]
    assert (kp[:, 0] >= 0).all() and (kp[:, 0] < w).all()
    assert (kp[:, 1] >= 0).all() and (kp[:, 1] < h).all()


def test_match_output_format(pair_result):
    *_, matches01 = pair_result
    assert matches01["matches0"].shape == (256,)
    assert matches01["matches"].ndim == 2 and matches01["matches"].shape[1] == 2
    assert len(matches01["scores"]) == len(matches01["matches"])
    assert matches01["stop"] == 9
    # compact list is consistent with per-point arrays
    for i, j in matches01["matches"]:
        assert matches01["matches0"][i] == j


def test_adaptive_pipeline_runs():
    extractor = SuperPoint(max_num_keypoints=128, resize=192)
    matcher = LightGlue("superpoint")  # default adaptive
    image0 = load_image(ASSET0)
    image1 = load_image(ASSET1)
    _, _, matches01 = match_pair(extractor, matcher, image0, image1)
    assert 1 <= matches01["stop"] <= 9
    assert matches01["prune0"].min() >= 1


def test_grayscale_and_uint8_inputs():
    from lightglue_tpu.utils.image import read_image

    extractor = SuperPoint(max_num_keypoints=64, resize=192)
    img_u8 = read_image(ASSET0)  # uint8 RGB
    feats_rgb = extractor.extract(img_u8)
    img_gray = read_image(ASSET0, grayscale=True)  # uint8 (H, W)
    feats_gray = extractor.extract(img_gray)
    assert feats_rgb["keypoints"].shape == feats_gray["keypoints"].shape


def test_aliked_pipeline():
    from lightglue_tpu.pipeline import ALIKED

    extractor = ALIKED(
        model_name="aliked-t16", max_num_keypoints=128, resize=192,
        detection_threshold=0.005,
    )
    matcher = LightGlue(
        "aliked", input_dim=64, depth_confidence=-1.0, width_confidence=-1.0
    )  # t16 descriptors are 64-d
    image0 = load_image(ASSET0)
    image1 = load_image(ASSET1)
    feats0, feats1, matches01 = match_pair(extractor, matcher, image0, image1)
    assert feats0["keypoints"].shape == (128, 2)
    assert feats0["descriptors"].shape == (128, 64)  # t16 dim
    assert matches01["matches0"].shape == (128,)


def test_sift_pipeline():
    from lightglue_tpu.pipeline import SIFT

    extractor = SIFT(max_num_keypoints=256, resize=320)
    matcher = LightGlue("sift", depth_confidence=-1.0, width_confidence=-1.0)
    image0 = load_image(ASSET0)
    image1 = load_image(ASSET1)
    feats0, feats1, matches01 = match_pair(extractor, matcher, image0, image1)
    assert feats0["keypoints"].shape == (256, 2)
    assert feats0["descriptors"].shape == (256, 128)
    assert "scales" in feats0 and "oris" in feats0
    assert feats0["valid"].sum() > 50  # real image has plenty of DoG points
    # rootsift: descriptors unit-norm
    d = feats0["descriptors"][feats0["valid"]]
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-4)


def test_doghardnet_pipeline():
    from lightglue_tpu.pipeline import DoGHardNet

    extractor = DoGHardNet(max_num_keypoints=128, resize=256)
    matcher = LightGlue(
        "doghardnet", depth_confidence=-1.0, width_confidence=-1.0
    )
    image0 = load_image(ASSET0)
    feats0 = extractor.extract(image0)
    assert feats0["descriptors"].shape == (1, 128, 128)
    d = feats0["descriptors"][0][feats0["valid"][0]]
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-3)
    image1 = load_image(ASSET1)
    _, _, m01 = match_pair(extractor, matcher, image0, image1)
    assert m01["matches0"].shape == (128,)


def test_disk_pipeline():
    from lightglue_tpu.pipeline import DISK

    extractor = DISK(max_num_keypoints=128, resize=192, detection_threshold=0.0)
    matcher = LightGlue("disk", depth_confidence=-1.0, width_confidence=-1.0)
    image0 = load_image(ASSET0)
    image1 = load_image(ASSET1)
    feats0, feats1, matches01 = match_pair(extractor, matcher, image0, image1)
    assert feats0["descriptors"].shape == (128, 128)
    assert matches01["matches0"].shape == (128,)
    # NMS spacing: valid keypoints at least window//2 apart... at least
    # assert no duplicate positions
    kp = feats0["keypoints"][feats0["valid"]]
    assert len(np.unique(kp, axis=0)) == len(kp)


def test_extract_batch():
    rng = np.random.default_rng(9)
    imgs = rng.uniform(0, 1, (3, 96, 120, 3)).astype(np.float32)
    extractor = SuperPoint(max_num_keypoints=64, detection_threshold=0.0005)
    out = extractor.extract_batch(imgs)
    assert out["keypoints"].shape == (3, 64, 2)
    assert out["descriptors"].shape == (3, 64, 256)
    # must equal per-image extraction (no resize path)
    single = extractor.extract(imgs[1], resize=None)
    np.testing.assert_allclose(
        out["keypoints"][1], single["keypoints"][0], atol=1e-4
    )


def test_compile_buckets_match_unpadded():
    """compile(static_lengths) pads to buckets without changing results
    (reference compile semantics, lightglue.py:439-454 + pad strip at
    590-591) and reuses one program per bucket."""
    import jax

    from lightglue_tpu.models import lightglue as lg

    rng = np.random.default_rng(0)

    def feats(n, w=640.0, h=480.0, seed=0):
        r = np.random.default_rng(seed)
        return {
            "keypoints": r.uniform(0, min(w, h), (1, n, 2)).astype(np.float32),
            "descriptors": r.standard_normal((1, n, 256)).astype(np.float32),
            "image_size": np.asarray([[w, h]], np.float32),
        }

    plain = LightGlue(
        "superpoint", depth_confidence=-1.0, width_confidence=-1.0
    )
    compiled = LightGlue(
        "superpoint", params=plain.params, conf=plain.conf
    ).compile(static_lengths=(64, 128))

    d = {"image0": feats(100, seed=1), "image1": feats(90, seed=2)}
    ref = plain(d)
    got = compiled(d)
    np.testing.assert_array_equal(got["matches0"], ref["matches0"])
    np.testing.assert_allclose(
        got["matching_scores0"], ref["matching_scores0"], atol=1e-5
    )
    assert got["matches0"].shape == (1, 100)
    assert got["matches1"].shape == (1, 90)

    # a second length in the same bucket must NOT retrace
    n_before = compiled._jit_forward._cache_size()
    compiled({"image0": feats(97, seed=3), "image1": feats(70, seed=4)})
    assert compiled._jit_forward._cache_size() == n_before


def test_match_sequence_windowed():
    """pipeline.match_sequence == independent extract_batch + matcher on
    every windowed pair, with per-image features reassembled correctly."""
    from lightglue_tpu.pipeline import match_sequence

    extractor = SuperPoint(max_num_keypoints=64)
    matcher = LightGlue(
        "superpoint", depth_confidence=-1.0, width_confidence=-1.0,
        filter_threshold=0.0,
    )
    rng = np.random.default_rng(0)
    b, h, w = 4, 64, 80
    imgs = rng.uniform(0, 1, (b, h, w, 1)).astype(np.float32)

    feats, pairs = match_sequence(extractor, matcher, imgs, window=2)
    # pairs: (0,1) (1,2) (2,3) then (0,2) (1,3)
    assert list(pairs["i0"]) == [0, 1, 2, 0, 1]
    assert list(pairs["i1"]) == [1, 2, 3, 2, 3]
    assert pairs["matches0"].shape == (5, 64)
    assert len(pairs["matches"]) == 5

    ref = extractor.extract_batch(imgs)
    np.testing.assert_allclose(
        feats["keypoints"], ref["keypoints"], atol=1e-5
    )
    for p, (a, c) in enumerate(zip(pairs["i0"], pairs["i1"])):
        side = lambda i: {
            "keypoints": ref["keypoints"][i : i + 1],
            "descriptors": ref["descriptors"][i : i + 1],
            "valid": ref["valid"][i : i + 1],
            "image_size": ref["image_size"][i : i + 1],
        }
        expect = matcher({"image0": side(a), "image1": side(c)})
        np.testing.assert_array_equal(
            pairs["matches0"][p], expect["matches0"][0]
        )

    # a second call reuses the cached program (no retrace)
    feats2, pairs2 = match_sequence(extractor, matcher, imgs, window=2)
    np.testing.assert_array_equal(pairs2["matches0"], pairs["matches0"])


def test_device_sift_extractor_and_sequence():
    """SIFTDevice behind the Extractor surface + match_sequence with the
    scale/ori-aware matcher config (device DoG path end to end)."""
    from lightglue_tpu.pipeline import SIFTDevice, match_sequence

    ex = SIFTDevice(max_num_keypoints=64, resize=96)
    img = load_image(ASSET0)
    feats = ex.extract(img)
    assert feats["keypoints"].shape == (1, 64, 2)
    assert feats["scales"].shape == (1, 64)
    assert feats["oris"].shape == (1, 64)
    assert feats["valid"].sum() > 0

    matcher = LightGlue(
        "sift", depth_confidence=-1.0, width_confidence=-1.0,
        filter_threshold=0.0,
    )
    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 1, (3, 64, 80)).astype(np.float32)
    f, pairs = match_sequence(ex, matcher, imgs, window=2)
    assert list(pairs["i0"]) == [0, 1, 0]
    assert f["scales"].shape == (3, 64)
    assert np.isfinite(pairs["matching_scores0"]).all()
