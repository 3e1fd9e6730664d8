"""Single-program extract->match pipeline."""

import numpy as np
import jax.numpy as jnp
import jax
import pytest

from lightglue_tpu.configs import SuperPointConfig, lightglue_config
from lightglue_tpu.end_to_end import make_end_to_end, make_sequence_end_to_end
from lightglue_tpu.models import lightglue as lg
from lightglue_tpu.models import superpoint as sp
from lightglue_tpu.utils.image import load_image, resize_image, pad_to_multiple


def test_sequence_e2e_consecutive_pairs():
    """Extract-once sequence pipeline: B images -> B-1 pair results that
    match the independent pairwise program exactly."""
    sp_conf = SuperPointConfig(max_num_keypoints=64)
    sp_params = sp.init_params(jax.random.key(0), sp_conf)
    lg_conf = lightglue_config(
        "superpoint", depth_confidence=-1.0, width_confidence=-1.0,
        filter_threshold=0.0,
    )
    lg_params = lg.init_params(jax.random.key(1), lg_conf)
    seq = make_sequence_end_to_end(
        sp.forward, sp_params, sp_conf, lg_params, lg_conf
    )
    pair = make_end_to_end(sp.forward, sp_params, sp_conf, lg_params, lg_conf)

    rng = np.random.default_rng(0)
    b, h, w = 3, 64, 80
    imgs = jnp.asarray(rng.uniform(0, 1, (b, h, w, 1)).astype(np.float32))
    sizes = jnp.asarray(np.tile([[float(w), float(h)]], (b, 1)))
    out = seq(imgs, sizes)
    assert out.matches.matches0.shape == (b - 1, 64)

    ref01 = pair(imgs[0:1], imgs[1:2], sizes[0:1], sizes[1:2])
    np.testing.assert_array_equal(
        np.asarray(out.matches.matches0[0]),
        np.asarray(ref01.matches.matches0[0]),
    )
    ref12 = pair(imgs[1:2], imgs[2:3], sizes[1:2], sizes[2:3])
    np.testing.assert_array_equal(
        np.asarray(out.matches.matches0[1]),
        np.asarray(ref12.matches.matches0[0]),
    )


def test_windowed_sequence_e2e_pairs():
    """Windowed sequence pipeline (hloc sequential pairing): every (i, i+w)
    pair's matches equal the independent pairwise program exactly."""
    from lightglue_tpu.end_to_end import (
        make_windowed_sequence_end_to_end, sequence_window_pairs,
    )

    sp_conf = SuperPointConfig(max_num_keypoints=64)
    sp_params = sp.init_params(jax.random.key(0), sp_conf)
    lg_conf = lightglue_config(
        "superpoint", depth_confidence=-1.0, width_confidence=-1.0,
        filter_threshold=0.0,
    )
    lg_params = lg.init_params(jax.random.key(1), lg_conf)
    win = make_windowed_sequence_end_to_end(
        sp.forward, sp_params, sp_conf, lg_params, lg_conf, window=2
    )
    pair = make_end_to_end(sp.forward, sp_params, sp_conf, lg_params, lg_conf)

    rng = np.random.default_rng(0)
    b, h, w = 4, 64, 80
    imgs = jnp.asarray(rng.uniform(0, 1, (b, h, w, 1)).astype(np.float32))
    sizes = jnp.asarray(np.tile([[float(w), float(h)]], (b, 1)))
    out = win(imgs, sizes)
    i0, i1 = sequence_window_pairs(b, 2)
    assert out.matches.matches0.shape == (len(i0), 64)
    np.testing.assert_array_equal(i0, [0, 1, 2, 0, 1])
    np.testing.assert_array_equal(i1, [1, 2, 3, 2, 3])
    for p, (a, c) in enumerate(zip(i0, i1)):
        ref = pair(
            imgs[a : a + 1], imgs[c : c + 1],
            sizes[a : a + 1], sizes[c : c + 1],
        )
        np.testing.assert_array_equal(
            np.asarray(out.matches.matches0[p]),
            np.asarray(ref.matches.matches0[0]),
        )


def test_windowed_sequence_e2e_sharded_over_mesh():
    """Full extract+match pipeline with images SHARDED over an 8-device
    data-parallel mesh: the windowed pairing gathers features across shard
    boundaries (XLA inserts the collectives), and results equal the
    unsharded program exactly."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from lightglue_tpu.end_to_end import make_windowed_sequence_end_to_end
    from lightglue_tpu.parallel import mesh as mesh_lib

    assert len(jax.devices()) >= 8, "conftest should provide 8 virtual devices"

    sp_conf = SuperPointConfig(max_num_keypoints=32)
    sp_params = sp.init_params(jax.random.key(0), sp_conf)
    lg_conf = lightglue_config(
        "superpoint", depth_confidence=-1.0, width_confidence=-1.0,
        filter_threshold=0.0,
    )
    lg_params = lg.init_params(jax.random.key(1), lg_conf)
    run = make_windowed_sequence_end_to_end(
        sp.forward, sp_params, sp_conf, lg_params, lg_conf, window=2
    )

    rng = np.random.default_rng(0)
    b, h, w = 8, 48, 64
    imgs = jnp.asarray(rng.uniform(0, 1, (b, h, w, 1)).astype(np.float32))
    sizes = jnp.asarray(np.tile([[float(w), float(h)]], (b, 1)))
    ref = run(imgs, sizes)

    mesh = mesh_lib.make_mesh(8)
    data = NamedSharding(mesh, P("data"))
    imgs_s = jax.device_put(imgs, data)
    sizes_s = jax.device_put(sizes, data)
    with mesh:
        out = run(imgs_s, sizes_s)
    np.testing.assert_array_equal(
        np.asarray(out.matches.matches0), np.asarray(ref.matches.matches0)
    )
    np.testing.assert_allclose(
        np.asarray(out.matches.matching_scores0),
        np.asarray(ref.matches.matching_scores0), atol=1e-5,
    )


def test_e2e_superpoint_match():
    sp_conf = SuperPointConfig(max_num_keypoints=128)
    sp_params = sp.init_params(jax.random.key(0), sp_conf)
    lg_conf = lightglue_config(
        "superpoint", depth_confidence=-1.0, width_confidence=-1.0,
        filter_threshold=0.0,
    )
    lg_params = lg.init_params(jax.random.key(1), lg_conf)
    run = make_end_to_end(sp.forward, sp_params, sp_conf, lg_params, lg_conf)

    im0 = load_image("/root/reference/assets/sacre_coeur1.jpg")
    im1 = load_image("/root/reference/assets/sacre_coeur2.jpg")
    im0, _ = resize_image(im0, 160)
    im1, _ = resize_image(im1, 160)
    # common padded canvas
    h = max(im0.shape[0], im1.shape[0])
    w = max(im0.shape[1], im1.shape[1])
    h += (-h) % 8
    w += (-w) % 8
    def canvas(im):
        out = np.zeros((h, w, 3), np.float32)
        out[: im.shape[0], : im.shape[1]] = im
        return out, (im.shape[1], im.shape[0])
    c0, s0 = canvas(im0)
    c1, s1 = canvas(im1)
    out = run(
        jnp.asarray(c0)[None], jnp.asarray(c1)[None],
        jnp.asarray([list(s0)], jnp.float32), jnp.asarray([list(s1)], jnp.float32),
    )
    assert out.feats0.keypoints.shape == (1, 128, 2)
    m0 = np.asarray(out.matches.matches0)
    valid0 = np.asarray(out.feats0.valid)
    assert valid0.sum() > 30
    # every reported match points at a valid keypoint in image1
    valid1 = np.asarray(out.feats1.valid)
    for i in np.nonzero(m0[0] >= 0)[0]:
        assert valid0[0, i]
        assert valid1[0, m0[0, i]]


@pytest.mark.tier2
def test_e2e_sift_device_match():
    """Device SIFT e2e: detection+RootSIFT on device feeding the scale/ori-
    aware matcher in one program.

    tier2: ~15 s of JAX-SIFT scale-space compile; the same device-SIFT →
    matcher composition runs in the default tier via
    test_pipeline.py::test_device_sift_extractor_and_sequence."""
    from lightglue_tpu.configs import SIFTConfig
    from lightglue_tpu.models import sift_jax

    conf = SIFTConfig(max_num_keypoints=64, backend="jax")
    lg_conf = lightglue_config(
        "sift", depth_confidence=-1.0, width_confidence=-1.0,
        filter_threshold=0.0,
    )
    lg_params = lg.init_params(jax.random.key(1), lg_conf)
    run = make_end_to_end(sift_jax.forward, None, conf, lg_params, lg_conf)

    im = load_image("/root/reference/assets/sacre_coeur1.jpg")
    im, _ = resize_image(im, 96)
    gray = np.asarray(im).mean(-1).astype(np.float32)
    img0 = jnp.asarray(gray)[None]
    img1 = jnp.asarray(gray[::-1].copy())[None]
    sizes = jnp.asarray(
        [[float(gray.shape[1]), float(gray.shape[0])]], jnp.float32
    )
    out = run(img0, img1, sizes, sizes)
    assert out.feats0.keypoints.shape == (1, 64, 2)
    assert out.feats0.scales is not None and out.feats0.oris is not None
    assert np.asarray(out.feats0.valid).sum() > 5
    assert out.matches.matches0.shape == (1, 64)


def test_e2e_doghardnet_device_match():
    """Device DoGHardNet e2e: SIFT detection + HardNet LAF descriptors +
    matcher, one program."""
    from lightglue_tpu.configs import SIFTConfig
    from lightglue_tpu.models import hardnet

    conf = SIFTConfig(max_num_keypoints=48, backend="jax")
    hn_params = hardnet.init_params(jax.random.key(2))
    lg_conf = lightglue_config(
        "doghardnet", depth_confidence=-1.0, width_confidence=-1.0,
        filter_threshold=0.0,
    )
    lg_params = lg.init_params(jax.random.key(1), lg_conf)
    run = make_end_to_end(hardnet.forward, hn_params, conf, lg_params, lg_conf)

    im = load_image("/root/reference/assets/sacre_coeur1.jpg")
    im, _ = resize_image(im, 96)
    gray = np.asarray(im).mean(-1).astype(np.float32)
    img = jnp.asarray(gray)[None]
    sizes = jnp.asarray(
        [[float(gray.shape[1]), float(gray.shape[0])]], jnp.float32
    )
    out = run(img, img, sizes, sizes)
    desc = np.asarray(out.feats0.descriptors)
    valid = np.asarray(out.feats0.valid)[0]
    assert desc.shape == (1, 48, 128)
    # descriptors L2-normalized where valid
    norms = np.linalg.norm(desc[0][valid], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)
    # identical images: every valid keypoint should match itself
    m0 = np.asarray(out.matches.matches0)[0]
    idx = np.where(valid)[0]
    assert (m0[idx] == idx).mean() > 0.9
