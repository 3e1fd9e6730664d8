"""Zero-keypoint robustness (reference lightglue.py:568-588 bails out when
either image has no keypoints; the TPU paths must instead degrade gracefully
through all-invalid masks: all matches -1, zero scores, no NaNs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightglue_tpu.configs import lightglue_config
from lightglue_tpu.models import lightglue as lg


def _inputs(m=32, n=32, d=256, seed=0):
    rng = np.random.default_rng(seed)
    return dict(
        kpts0=jnp.asarray(rng.uniform(0, 640, (1, m, 2)).astype(np.float32)),
        kpts1=jnp.asarray(rng.uniform(0, 480, (1, n, 2)).astype(np.float32)),
        desc0=jnp.asarray(rng.standard_normal((1, m, d)).astype(np.float32)),
        desc1=jnp.asarray(rng.standard_normal((1, n, d)).astype(np.float32)),
    )


def _check_empty_side(out, m, n, empty0, empty1):
    for field in out:
        assert not np.any(np.isnan(np.asarray(field))), "NaN in output"
    m0 = np.asarray(out.matches0)
    m1 = np.asarray(out.matches1)
    assert (m0 == -1).all(), "no matches possible with an empty side"
    assert (m1 == -1).all()
    assert (np.asarray(out.matching_scores0) == 0).all()
    assert (np.asarray(out.matching_scores1) == 0).all()


@pytest.mark.parametrize("which", ["img0", "img1", "both"])
@pytest.mark.parametrize("path", ["fixed", "adaptive"])
def test_all_invalid_mask(which, path):
    if path == "fixed":
        conf = lightglue_config(
            "superpoint", depth_confidence=-1.0, width_confidence=-1.0
        )
    else:
        conf = lightglue_config("superpoint")
    params = lg.init_params(jax.random.key(0), conf)
    kw = _inputs()
    m, n = kw["kpts0"].shape[1], kw["kpts1"].shape[1]
    empty0 = which in ("img0", "both")
    empty1 = which in ("img1", "both")
    kw["mask0"] = jnp.zeros((1, m), bool) if empty0 else jnp.ones((1, m), bool)
    kw["mask1"] = jnp.zeros((1, n), bool) if empty1 else jnp.ones((1, n), bool)
    out = jax.jit(lg.forward, static_argnames=("conf",))(params, conf, **kw)
    _check_empty_side(out, m, n, empty0, empty1)


def test_all_invalid_no_size_bbox_path():
    """size=None routes normalize_keypoints through the bbox path, which uses
    +-1e9 sentinels under the mask — must stay finite with zero valid."""
    conf = lightglue_config(
        "superpoint", depth_confidence=-1.0, width_confidence=-1.0
    )
    params = lg.init_params(jax.random.key(0), conf)
    kw = _inputs()
    kw["mask0"] = jnp.zeros((1, 32), bool)
    kw["mask1"] = jnp.zeros((1, 32), bool)
    out = jax.jit(lg.forward, static_argnames=("conf",))(
        params, conf, **kw
    )  # no size0/size1
    _check_empty_side(out, 32, 32, True, True)


def test_batch_matcher_empty_pair():
    """BatchMatcher with one empty-keypoint pair among real pairs."""
    from lightglue_tpu.parallel.batching import BatchMatcher

    conf = lightglue_config(
        "superpoint", depth_confidence=-1.0, width_confidence=-1.0
    )
    params = lg.init_params(jax.random.key(0), conf)
    rng = np.random.default_rng(1)

    def feats(k):
        return {
            "keypoints": rng.uniform(0, 640, (k, 2)).astype(np.float32),
            "descriptors": rng.standard_normal((k, 256)).astype(np.float32),
            "image_size": np.array([640.0, 480.0], np.float32),
        }

    pairs = [(feats(40), feats(40)), (feats(0), feats(40))]
    results = BatchMatcher(conf, params, buckets=(64,)).match_pairs(pairs)
    assert results[1]["matches"].shape == (0, 2)
    assert (results[1]["matches0"] == -1).all() if results[1][
        "matches0"
    ].size else True
    assert not np.any(np.isnan(results[0]["matching_scores0"]))
