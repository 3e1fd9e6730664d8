"""Synthetic training subsystem (lightglue_tpu/train.py).

Fast tests cover the data generator and loss math; the end-to-end
train-step (jit grad compile is minutes on the 1-core CPU host) is -m slow.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lightglue_tpu import train as T
from lightglue_tpu.configs import lightglue_config


def test_synthetic_batch_geometry():
    b = T.synthetic_batch(jax.random.key(0), 4, 64, desc_dim=64)
    assert b.kpts0.shape == (4, 64, 2)
    assert b.desc1.shape == (4, 64, 64)
    gt = np.asarray(b.gt_matches0)
    matched = gt >= 0
    # difficulty jitter keeps match rate within the generator envelope
    assert 0.05 < matched.mean() < 0.95
    # descriptors are unit norm
    nrm = np.linalg.norm(np.asarray(b.desc0), axis=-1)
    np.testing.assert_allclose(nrm, 1.0, atol=1e-5)
    # matched descriptors correlate far above distractors
    d0 = np.asarray(b.desc0)
    d1 = np.asarray(b.desc1)
    cos = np.einsum("bmd,bmd->bm", d0, d1[np.arange(4)[:, None], np.clip(gt, 0, 63)])
    assert cos[matched].mean() > 0.5
    assert abs(cos[~matched].mean()) < 0.2
    # gt is a partial injection: no two rows map to the same column
    for i in range(4):
        tgt = gt[i][matched[i]]
        assert len(set(tgt.tolist())) == len(tgt)
    # keypoints inside the frame
    k1 = np.asarray(b.kpts1)
    assert (k1 >= 0).all() and (k1[..., 0] < 1024).all() and (k1[..., 1] < 768).all()


def test_assignment_nll_prefers_correct_assignment():
    """NLL must be lower when the log-assignment puts mass on the planted
    matches than on a shuffled assignment."""
    b, m, n = 1, 8, 8
    gt = jnp.asarray([[1, 0, 3, 2, -1, -1, 7, 6]], jnp.int32)
    good = jnp.full((b, m + 1, n + 1), -10.0)
    for i, j in enumerate(np.asarray(gt)[0]):
        if j >= 0:
            good = good.at[0, i, j].set(-0.1)
        else:
            good = good.at[0, i, n].set(-0.1)
    good = good.at[0, m, 4].set(-0.1).at[0, m, 5].set(-0.1)
    bad = jnp.roll(good[:, :m], 1, axis=1)
    bad = jnp.concatenate([bad, good[:, m:]], axis=1)
    l_good = float(T.assignment_nll(good, gt))
    l_bad = float(T.assignment_nll(bad, gt))
    assert l_good < l_bad
    # pos 0.1 + 0.5 * (dustbin rows 0.1 + dustbin cols 0.1)
    assert l_good == pytest.approx(0.2, abs=1e-5)


def test_matcher_loss_finite_and_grads_nonzero():
    conf = lightglue_config("superpoint", n_layers=2).replace(
        flash=False, depth_confidence=-1.0, width_confidence=-1.0
    )
    from lightglue_tpu.models import lightglue as lg

    params = lg.init_params(jax.random.key(0), conf)
    data = T.synthetic_batch(jax.random.key(1), 2, 32)
    loss, aux = T.matcher_loss(params, conf, data)
    assert np.isfinite(float(loss))
    assert float(aux["nll"]) > 0

    grads = jax.grad(lambda p: T.matcher_loss(p, conf, data)[0])(params)
    gnorm = jax.tree.reduce(
        lambda a, g: a + float(jnp.sum(jnp.abs(g))), grads, 0.0
    )
    assert gnorm > 0


@pytest.mark.slow
def test_train_synthetic_learns():
    """A few dozen steps on a tiny config must reduce the assignment NLL."""
    conf = lightglue_config("superpoint", n_layers=2)
    params, tc, hist = T.train_synthetic(
        conf, steps=60, batch=4, m=64, lr=1e-3, log_every=59, verbose=False
    )
    assert hist[-1]["nll"] < hist[0]["nll"]
