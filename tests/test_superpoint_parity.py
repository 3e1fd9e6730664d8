"""SuperPoint parity vs the torch reference (random weights, same image)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lightglue_tpu.configs import SuperPointConfig
from lightglue_tpu.models import superpoint as sp
from lightglue_tpu.ops.sampling import bilinear_sample, simple_nms
from lightglue_tpu import weights as w

from ref_loader import load_ref_module, torch_state_dict_to_numpy

torch = pytest.importorskip("torch")
ref_sp_mod = load_ref_module("superpoint")


def t2n(x):
    return x.detach().cpu().numpy()


def test_simple_nms_parity():
    rng = np.random.default_rng(0)
    scores = rng.uniform(0, 1, (2, 32, 40)).astype(np.float32)
    ref = t2n(ref_sp_mod.simple_nms(torch.from_numpy(scores), 4))
    got = np.asarray(simple_nms(jnp.asarray(scores), 4))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_bilinear_sample_vs_grid_sample():
    rng = np.random.default_rng(1)
    fmap = rng.standard_normal((2, 16, 20, 8)).astype(np.float32)
    pts = rng.uniform(-1.2, 1.2, (2, 33, 2)).astype(np.float32)  # incl. outside
    ref = torch.nn.functional.grid_sample(
        torch.from_numpy(fmap.transpose(0, 3, 1, 2)),
        torch.from_numpy(pts.reshape(2, 1, -1, 2)),
        mode="bilinear", align_corners=True,
    )
    ref = t2n(ref)[:, :, 0].transpose(0, 2, 1)  # (B, K, C)
    got = np.asarray(bilinear_sample(jnp.asarray(fmap), jnp.asarray(pts)))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_sample_descriptors_parity():
    rng = np.random.default_rng(2)
    dmap = rng.standard_normal((1, 8, 10, 16)).astype(np.float32)
    kpts = rng.uniform(0, 70, (1, 12, 2)).astype(np.float32)
    ref = ref_sp_mod.sample_descriptors(
        torch.from_numpy(kpts),
        torch.from_numpy(dmap.transpose(0, 3, 1, 2)), 8,
    )
    ref = t2n(ref).transpose(0, 2, 1)  # (B, K, C)
    got = np.asarray(sp.sample_descriptors(jnp.asarray(kpts), jnp.asarray(dmap), 8))
    np.testing.assert_allclose(got, ref, atol=1e-5)


@pytest.fixture(scope="module")
def models():
    torch.manual_seed(3)
    ref = ref_sp_mod.SuperPoint(max_num_keypoints=64)
    ref.eval()
    sd = torch_state_dict_to_numpy(ref)
    params = w.convert_superpoint(sd)
    conf = SuperPointConfig(max_num_keypoints=64, detection_threshold=0.0005)
    return ref, params, conf


def test_forward_parity(models):
    ref, params, conf = models
    rng = np.random.default_rng(4)
    img = rng.uniform(0, 1, (1, 64, 80, 1)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref({"image": torch.from_numpy(img.transpose(0, 3, 1, 2))})
    out = jax.jit(sp.forward, static_argnames=("conf",))(
        params, conf, jnp.asarray(img)
    )
    ref_k = t2n(ref_out["keypoints"])[0]  # (Kr, 2)
    ref_s = t2n(ref_out["keypoint_scores"])[0]
    ref_d = t2n(ref_out["descriptors"])[0]
    got_valid = np.asarray(out.valid)[0]
    got_k = np.asarray(out.keypoints)[0][got_valid]
    got_s = np.asarray(out.keypoint_scores)[0][got_valid]
    got_d = np.asarray(out.descriptors)[0][got_valid]

    # reference returned at most 64; we must agree on the set of keypoints
    assert len(ref_k) == len(got_k)
    order_ref = np.lexsort((ref_k[:, 0], ref_k[:, 1], -ref_s))
    order_got = np.lexsort((got_k[:, 0], got_k[:, 1], -got_s))
    np.testing.assert_array_equal(got_k[order_got], ref_k[order_ref])
    np.testing.assert_allclose(got_s[order_got], ref_s[order_ref], atol=5e-4)
    np.testing.assert_allclose(
        got_d[order_got], ref_d[order_ref], atol=2e-3
    )


def test_forward_parity_rgb_batched(models):
    ref, params, conf = models
    rng = np.random.default_rng(5)
    img = rng.uniform(0, 1, (2, 48, 48, 3)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref({"image": torch.from_numpy(img.transpose(0, 3, 1, 2))})
    out = jax.jit(sp.forward, static_argnames=("conf",))(
        params, conf, jnp.asarray(img)
    )
    for b in range(2):
        ref_k = t2n(ref_out["keypoints"][b])
        got_valid = np.asarray(out.valid)[b]
        got_k = np.asarray(out.keypoints)[b][got_valid]
        got_s = np.asarray(out.keypoint_scores)[b][got_valid]
        ref_s = t2n(ref_out["keypoint_scores"][b])
        assert len(ref_k) == len(got_k)
        order_ref = np.lexsort((ref_k[:, 0], ref_k[:, 1], -ref_s))
        order_got = np.lexsort((got_k[:, 0], got_k[:, 1], -got_s))
        np.testing.assert_array_equal(got_k[order_got], ref_k[order_ref])


def test_forward_parity_threshold_only_max_none(models):
    """Reference-default ``max_num_keypoints=None`` (keep ALL points above
    detection_threshold, superpoint.py:108-117,189-207): the pipeline
    resolves None to an area-derived static bucket whose validity mask is
    exactly the threshold selection (pipeline._auto_kpts_bucket)."""
    from lightglue_tpu import pipeline as pl

    ref, params, conf = models
    ref_none = ref_sp_mod.SuperPoint(max_num_keypoints=None)
    ref_none.load_state_dict(ref.state_dict())
    ref_none.eval()

    rng = np.random.default_rng(7)
    img = rng.uniform(0, 1, (64, 80, 1)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_none(
            {"image": torch.from_numpy(img.transpose(2, 0, 1)[None])}
        )
    ext = pl.SuperPoint(params=params, max_num_keypoints=None)
    feats = ext.extract(img, resize=None)
    got_valid = feats["valid"][0]
    got_k = feats["keypoints"][0][got_valid]
    got_s = feats["keypoint_scores"][0][got_valid]

    ref_k = t2n(ref_out["keypoints"])[0]
    ref_s = t2n(ref_out["keypoint_scores"])[0]
    assert len(ref_k) == len(got_k)  # every above-threshold point kept
    # threshold-only selection -> the SETS are identical; sort purely by
    # coordinates (score-keyed sorts are unstable across frameworks at
    # <5e-4 score deltas)
    order_ref = np.lexsort((ref_k[:, 0], ref_k[:, 1]))
    order_got = np.lexsort((got_k[:, 0], got_k[:, 1]))
    np.testing.assert_array_equal(got_k[order_got], ref_k[order_ref])
    np.testing.assert_allclose(got_s[order_got], ref_s[order_ref], atol=5e-4)
