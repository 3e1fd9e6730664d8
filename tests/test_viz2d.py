"""viz2d smoke tests (Agg backend)."""

import matplotlib

matplotlib.use("Agg")

import numpy as np

from lightglue_tpu.utils import viz2d


def test_plot_matches_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    im0 = rng.uniform(0, 1, (48, 64, 3))
    im1 = rng.uniform(0, 1, (48, 64, 3))
    k0 = rng.uniform(0, 48, (20, 2))
    k1 = rng.uniform(0, 48, (20, 2))
    viz2d.plot_images([im0, im1], titles=["a", "b"])
    viz2d.plot_keypoints([k0, k1])
    viz2d.plot_matches(k0[:10], k1[:10], color="lime")
    viz2d.add_text(0, "stop after 9 layers")
    out = tmp_path / "viz.png"
    viz2d.save_plot(str(out))
    assert out.exists() and out.stat().st_size > 1000


def test_colormaps():
    x = np.linspace(0, 1, 5)
    assert viz2d.cm_RdGn(x).shape == (5, 3)
    assert viz2d.cm_BlRdGn(x * 2 - 1).shape == (5, 4)
    prune = np.array([1, 5, 9, 10, 10])
    c = viz2d.cm_prune(prune)
    assert c.shape == (5, 4)
