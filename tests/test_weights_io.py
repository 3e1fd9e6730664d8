"""Checkpoint persistence: flat npz + orbax roundtrips, pipeline loading."""

import numpy as np
import jax

from lightglue_tpu import weights as w
from lightglue_tpu.configs import lightglue_config
from lightglue_tpu.models import lightglue as lg


def test_npz_roundtrip(tmp_path):
    conf = lightglue_config("superpoint")
    params = lg.init_params(jax.random.key(0), conf)
    path = str(tmp_path / "lg.npz")
    w.save_params(path, params)
    back = w.load_params(path)
    flat_a = w.flatten_tree(params)
    flat_b = w.flatten_tree(back)
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(flat_a[k], flat_b[k])


def test_pipeline_loads_npz(tmp_path):
    from lightglue_tpu.pipeline import LightGlue

    conf = lightglue_config("superpoint", depth_confidence=-1.0,
                            width_confidence=-1.0)
    params = lg.init_params(jax.random.key(0), conf)
    path = str(tmp_path / "lg.npz")
    w.save_params(path, params)
    matcher = LightGlue("superpoint", params=path, depth_confidence=-1.0,
                        width_confidence=-1.0)
    rng = np.random.default_rng(0)
    feats = lambda n: {
        "keypoints": rng.uniform(0, 512, (1, n, 2)).astype(np.float32),
        "descriptors": rng.standard_normal((1, n, 256)).astype(np.float32),
        "image_size": np.array([[512.0, 384.0]], np.float32),
    }
    out = matcher({"image0": feats(32), "image1": feats(32)})
    assert out["matches0"].shape == (1, 32)


def test_map_tensor_and_batch_to_device():
    from lightglue_tpu.pipeline import batch_to_device, map_tensor

    data = {"a": np.ones((2, 3)), "b": [np.zeros((1,)), "keep"], "c": 5}
    doubled = map_tensor(data, lambda t: t * 2)
    np.testing.assert_array_equal(doubled["a"], 2 * np.ones((2, 3)))
    assert doubled["b"][1] == "keep" and doubled["c"] == 5
    dev = batch_to_device(data)
    assert dev["a"].devices() == {jax.devices()[0]}
