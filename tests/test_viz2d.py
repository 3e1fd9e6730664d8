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


def test_plot_matches_gradient_default_and_axis_freeze():
    rng = np.random.default_rng(1)
    im0 = rng.uniform(0, 1, (32, 48, 3))
    im1 = rng.uniform(0, 1, (32, 48, 3))
    fig, axs = viz2d.plot_images([im0, im1])
    k0 = rng.uniform(0, 32, (8, 2))
    k1 = rng.uniform(0, 32, (8, 2))
    xlim_before = axs[0].get_xlim()
    viz2d.plot_matches(k0, k1)  # color=None -> cm_grad2d default
    assert axs[0].get_xlim() == xlim_before  # autoscale frozen
    assert not axs[0].get_autoscale_on()
    import matplotlib.pyplot as plt

    plt.close(fig)


def test_colormaps():
    x = np.linspace(0, 1, 5)
    assert viz2d.cm_RdGn(x).shape == (5, 3)
    assert viz2d.cm_BlRdGn(x * 2 - 1).shape == (5, 4)
    prune = np.array([1, 5, 9, 10, 10])
    c = viz2d.cm_prune(prune)
    assert c.shape == (5, 4)


def test_cm_grad2d_corners():
    corners = np.array([[0.0, 0], [1, 0], [0, 1], [1, 1]])
    got = viz2d.cm_grad2d(corners)
    want = np.array([[1.0, 1, 0], [0, 1, 0], [1, 0, 0], [0, 0, 1]])
    np.testing.assert_allclose(got, want)
    # out-of-range inputs are clipped, interior is a blend
    assert viz2d.cm_grad2d(np.array([[2.0, -1.0]])).shape == (1, 3)
    mid = viz2d.cm_grad2d(np.array([0.5, 0.5]))
    np.testing.assert_allclose(mid, [0.5, 0.5, 0.25])
