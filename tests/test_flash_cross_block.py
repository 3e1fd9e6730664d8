"""Fused cross-block kernel (ops/flash_cross_block.py) vs the composed XLA
path (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

import lightglue_tpu as lt
from lightglue_tpu.models import lightglue as lg
from lightglue_tpu.ops import flash_cross_block


def _setup(seed, b=1, m=128, n=128, d=256):
    key = jax.random.key(seed)
    p = lg._cross_block_init(key, d)
    rng = np.random.default_rng(seed)
    x0 = jnp.asarray(rng.standard_normal((b, m, d)).astype(np.float32))
    x1 = jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32))
    return p, x0, x1


def _ref(p, x0, x1, conf, mask0=None, mask1=None):
    """Composed path: flash disabled => XLA bidirectional attention."""
    return lg.cross_block(p, x0, x1, conf, mask0, mask1)


def test_fused_cross_block_unmasked():
    p, x0, x1 = _setup(0)
    conf = lt.lightglue_config("superpoint", flash=False, fused_ffn=False)
    r0, r1 = _ref(p, x0, x1, conf)
    g0, g1 = flash_cross_block.fused_cross_block(
        p, x0, x1, conf.num_heads, shift=0.0, interpret=True
    )
    np.testing.assert_allclose(np.asarray(g0), np.asarray(r0), atol=5e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(r1), atol=5e-5)


def test_fused_cross_block_rect_masked():
    p, x0, x1 = _setup(1, m=256, n=128)
    valid0 = jnp.asarray(np.arange(256)[None] < 200)
    valid1 = jnp.asarray(np.arange(128)[None] < 90)
    conf = lt.lightglue_config("superpoint", flash=False, fused_ffn=False)
    r0, r1 = _ref(p, x0, x1, conf, valid0, valid1)
    g0, g1 = flash_cross_block.fused_cross_block(
        p, x0, x1, conf.num_heads, valid0, valid1, shift=0.0, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(g0)[:, :200], np.asarray(r0)[:, :200], atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(g1)[:, :90], np.asarray(r1)[:, :90], atol=5e-5
    )


def test_fused_cross_block_batched_bf16():
    p, x0, x1 = _setup(2, b=2)
    conf = lt.lightglue_config("superpoint", flash=False, fused_ffn=False)
    x0b, x1b = x0.astype(jnp.bfloat16), x1.astype(jnp.bfloat16)
    r0, r1 = _ref(p, x0b, x1b, conf)
    g0, g1 = flash_cross_block.fused_cross_block(
        p, x0b, x1b, conf.num_heads, shift=0.0, interpret=True
    )
    assert g0.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(g0, np.float32), np.asarray(r0, np.float32), atol=0.15
    )
    np.testing.assert_allclose(
        np.asarray(g1, np.float32), np.asarray(r1, np.float32), atol=0.15
    )


def test_fused_cross_block_shift_nonzero():
    """A nonzero shift must not change results (softmax shift-invariance)."""
    p, x0, x1 = _setup(3)
    conf = lt.lightglue_config("superpoint", flash=False, fused_ffn=False)
    r0, r1 = _ref(p, x0, x1, conf)
    g0, g1 = flash_cross_block.fused_cross_block(
        p, x0, x1, conf.num_heads, shift=12.0, interpret=True
    )
    np.testing.assert_allclose(np.asarray(g0), np.asarray(r0), atol=5e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(r1), atol=5e-5)


def test_fused_cross_block_exact_no_shift():
    """shift=None: exact row softmax; column direction global-shift (same
    numerics class as ops/flash_cross.py's exact kernel)."""
    p, x0, x1 = _setup(4, m=256, n=128)
    conf = lt.lightglue_config("superpoint", flash=False, fused_ffn=False)
    r0, r1 = _ref(p, x0, x1, conf)
    g0, g1 = flash_cross_block.fused_cross_block(
        p, x0, x1, conf.num_heads, interpret=True
    )
    np.testing.assert_allclose(np.asarray(g0), np.asarray(r0), atol=5e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(r1), atol=5e-5)


def test_fused_cross_block_exact_masked():
    p, x0, x1 = _setup(5)
    valid0 = jnp.asarray(np.arange(128)[None] < 110)
    valid1 = jnp.asarray(np.arange(128)[None] < 70)
    conf = lt.lightglue_config("superpoint", flash=False, fused_ffn=False)
    r0, r1 = _ref(p, x0, x1, conf, valid0, valid1)
    g0, g1 = flash_cross_block.fused_cross_block(
        p, x0, x1, conf.num_heads, valid0, valid1, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(g0)[:, :110], np.asarray(r0)[:, :110], atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(g1)[:, :70], np.asarray(r1)[:, :70], atol=5e-5
    )
