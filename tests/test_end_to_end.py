"""Single-program extract->match pipeline."""

import numpy as np
import jax.numpy as jnp
import jax

from lightglue_tpu.configs import SuperPointConfig, lightglue_config
from lightglue_tpu.end_to_end import make_end_to_end
from lightglue_tpu.models import lightglue as lg
from lightglue_tpu.models import superpoint as sp
from lightglue_tpu.utils.image import load_image, resize_image, pad_to_multiple


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
