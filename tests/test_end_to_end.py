"""Single-program extract->match pipeline."""

import numpy as np
import jax.numpy as jnp
import jax

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
