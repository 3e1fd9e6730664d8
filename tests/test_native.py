"""C++ host runtime vs numpy fallbacks."""

import numpy as np

from lightglue_tpu import native


def test_native_available():
    assert native.available(), "liblg_host.so should build in this env"


def test_compact_matches_matches_fallback():
    rng = np.random.default_rng(0)
    m0 = rng.integers(-1, 50, (3, 64)).astype(np.int32)
    s0 = rng.uniform(0, 1, (3, 64)).astype(np.float32)
    nm, ns = native.compact_matches(m0, s0)
    # numpy reference
    for b in range(3):
        idx = np.nonzero(m0[b] > -1)[0]
        np.testing.assert_array_equal(nm[b][:, 0], idx)
        np.testing.assert_array_equal(nm[b][:, 1], m0[b][idx])
        np.testing.assert_allclose(ns[b], s0[b][idx])


def test_pack_ragged():
    rng = np.random.default_rng(1)
    arrays = [rng.standard_normal((n, 4)).astype(np.float32) for n in (3, 7, 5)]
    out, valid = native.pack_ragged(arrays, 6, pad_value=9.0)
    assert out.shape == (3, 6, 4)
    np.testing.assert_array_equal(valid.sum(1), [3, 6, 5])
    np.testing.assert_allclose(out[0, :3], arrays[0])
    np.testing.assert_allclose(out[1], arrays[1][:6])  # truncated to k
    assert (out[0, 3:] == 9.0).all()


def test_filter_matches_host_vs_device():
    import jax.numpy as jnp
    from lightglue_tpu.ops import assignment as asg

    rng = np.random.default_rng(2)
    scores = (rng.standard_normal((1, 21, 31)) * 2 - 3).astype(np.float32)
    # device version takes the (M+1, N+1) padded form
    m0_d, _, s0_d, _ = asg.filter_matches(jnp.asarray(scores), 0.1)
    m0_h, s0_h = native.filter_matches_host(scores[0, :-1, :-1], 0.1)
    np.testing.assert_array_equal(m0_h, np.asarray(m0_d)[0])
    np.testing.assert_allclose(s0_h, np.asarray(s0_d)[0], atol=1e-4)
