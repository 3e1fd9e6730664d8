"""On-device two-stage adaptive compaction vs the single-program masked path.

With an aggressive width_confidence (keep threshold 0.6, random-weight
matchability ~sigmoid(N(0,1)) -> ~half the points pruned at each pruning
layer), compaction must reproduce the masked path's outputs exactly —
masking and physical removal are mathematically equivalent softmax subsets
— whenever the survivors fit the compaction bucket.
"""

import numpy as np
import jax
import jax.numpy as jnp

from lightglue_tpu.configs import lightglue_config
from lightglue_tpu.models import lightglue as lg


def _inputs(seed, b, m, n):
    rng = np.random.default_rng(seed)
    return dict(
        kpts0=jnp.asarray(rng.uniform(0, 640, (b, m, 2)).astype(np.float32)),
        kpts1=jnp.asarray(rng.uniform(0, 480, (b, n, 2)).astype(np.float32)),
        desc0=jnp.asarray(rng.standard_normal((b, m, 256)).astype(np.float32)),
        desc1=jnp.asarray(rng.standard_normal((b, n, 256)).astype(np.float32)),
        size0=jnp.asarray(np.tile([[640.0, 480.0]], (b, 1))),
        size1=jnp.asarray(np.tile([[640.0, 480.0]], (b, 1))),
    )


def test_twostage_device_compaction_equals_masked():
    conf = lightglue_config(
        "superpoint", depth_confidence=-1.0, width_confidence=0.4,
        pruning_min_kpts=-1, filter_threshold=0.0,
    )
    params = lg.init_params(jax.random.key(0), conf)
    inputs = _inputs(2, 2, 96, 96)
    masked = jax.jit(lg.forward, static_argnames=("conf",))(
        params, conf, **inputs
    )
    two = jax.jit(
        lg.forward_adaptive_twostage,
        static_argnames=("conf", "n_prefix", "bucket"),
    )(params, conf, 3, 64, **inputs)
    # survivors must fit the bucket for exact equivalence
    surv = (np.asarray(masked.prune0) == np.asarray(masked.prune0).max()).sum(1)
    assert surv.max() <= 64
    np.testing.assert_array_equal(
        np.asarray(two.matches0), np.asarray(masked.matches0)
    )
    np.testing.assert_array_equal(
        np.asarray(two.matches1), np.asarray(masked.matches1)
    )
    np.testing.assert_allclose(
        np.asarray(two.matching_scores0),
        np.asarray(masked.matching_scores0), atol=1e-4,
    )
    np.testing.assert_array_equal(
        np.asarray(two.prune0), np.asarray(masked.prune0)
    )


def test_forward_dispatch_to_twostage():
    conf = lightglue_config(
        "superpoint", depth_confidence=-1.0, width_confidence=0.4,
        pruning_min_kpts=-1, filter_threshold=0.0,
        compaction_bucket=64, compaction_prefix=3,
    )
    params = lg.init_params(jax.random.key(0), conf)
    inputs = _inputs(5, 1, 96, 96)
    via_forward = jax.jit(lg.forward, static_argnames=("conf",))(
        params, conf, **inputs
    )
    direct = jax.jit(
        lg.forward_adaptive_twostage,
        static_argnames=("conf", "n_prefix", "bucket"),
    )(params, conf, 3, 64, **inputs)
    np.testing.assert_array_equal(
        np.asarray(via_forward.matches0), np.asarray(direct.matches0)
    )
