"""Fused Pallas NMS kernel (ops/nms.py) vs the XLA reference formulation.

The kernel is pure max/compare arithmetic, so agreement must be BITWISE —
any mismatch is a halo/validity bug, not numerics.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lightglue_tpu.ops.nms import simple_nms_pallas
from lightglue_tpu.ops.sampling import simple_nms


def _xla_nms(scores, r):
    # the reference XLA path, bypassing the dispatch
    from lightglue_tpu.ops import sampling

    assert not sampling._nms_use_pallas(*scores.shape[1:], r)  # CPU tests
    return simple_nms(scores, r)


@pytest.mark.parametrize("radius", [2, 4])
@pytest.mark.parametrize("shape", [(2, 96, 128), (1, 128, 200)])
def test_agreement_dense_random(radius, shape):
    rng = np.random.default_rng(0)
    s = jnp.asarray(rng.uniform(0, 1, shape).astype(np.float32))
    ref = _xla_nms(s, radius)
    got = simple_nms_pallas(s, radius, tile_rows=32, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_agreement_sparse_peaks():
    """Post-softmax-like map: mostly near-zero with isolated peaks."""
    rng = np.random.default_rng(1)
    s = rng.uniform(0, 1e-4, (1, 160, 128)).astype(np.float32)
    ys = rng.integers(0, 160, 50)
    xs = rng.integers(0, 128, 50)
    s[0, ys, xs] = rng.uniform(0.1, 1.0, 50).astype(np.float32)
    s = jnp.asarray(s)
    ref = _xla_nms(s, 4)
    got = simple_nms_pallas(s, 4, tile_rows=64, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_agreement_negative_values():
    """DISK-style raw heatmaps can be negative; -inf border padding (not
    zero) is what keeps border behavior exact."""
    rng = np.random.default_rng(2)
    s = jnp.asarray(rng.standard_normal((2, 96, 160)).astype(np.float32))
    ref = _xla_nms(s, 2)
    got = simple_nms_pallas(s, 2, tile_rows=32, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_agreement_ties_plateau():
    """Constant plateaus exercise the equality-based max mask."""
    s = np.zeros((1, 96, 128), np.float32)
    s[0, 10:20, 10:30] = 0.5
    s[0, 40, 40] = 1.0
    s = jnp.asarray(s)
    ref = _xla_nms(s, 4)
    got = simple_nms_pallas(s, 4, tile_rows=32, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_tile_rows_larger_than_h():
    rng = np.random.default_rng(3)
    s = jnp.asarray(rng.uniform(0, 1, (1, 72, 128)).astype(np.float32))
    ref = _xla_nms(s, 2)
    got = simple_nms_pallas(s, 2, tile_rows=256, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
