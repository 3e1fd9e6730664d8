"""Fused self-block kernel (ops/flash_self.py) vs the composed XLA path
(interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

import lightglue_tpu as lt
from lightglue_tpu.models import lightglue as lg
from lightglue_tpu.ops import flash_self, rotary


def _setup(seed, b=1, n=128, d=256, heads=4):
    key = jax.random.key(seed)
    p = lg._self_block_init(key, d)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32))
    kn = jnp.asarray(rng.uniform(-1, 1, (b, n, 2)).astype(np.float32))
    penc = rotary.fourier_posenc_init(jax.random.key(seed + 1), 2, d // heads)
    enc = rotary.fourier_posenc(penc, kn)
    return p, x, enc


def _ref(p, x, enc, conf, mask=None):
    """Composed path: flash disabled => XLA sdpa + unfused FFN."""
    return lg.self_block(p, x, enc, conf, mask)


def test_fused_self_block_unmasked():
    p, x, enc = _setup(0)
    conf = lt.lightglue_config("superpoint", flash=False, fused_ffn=False)
    ref = _ref(p, x, enc, conf)
    got = flash_self.fused_self_block(p, x, enc, conf.num_heads,
                                      interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5)


def test_fused_self_block_masked():
    p, x, enc = _setup(1)
    valid = jnp.asarray(np.arange(128)[None] < 100)
    conf = lt.lightglue_config("superpoint", flash=False, fused_ffn=False)
    ref = _ref(p, x, enc, conf, valid)
    got = flash_self.fused_self_block(p, x, enc, conf.num_heads, valid,
                                      interpret=True)
    # masked-key rows of ref/got may differ in the FFN residual garbage;
    # compare valid rows
    np.testing.assert_allclose(
        np.asarray(got)[:, :100], np.asarray(ref)[:, :100], atol=5e-5
    )


def test_fused_self_block_shift():
    p, x, enc = _setup(2)
    conf = lt.lightglue_config("superpoint", flash=False, fused_ffn=False)
    ref = _ref(p, x, enc, conf)
    got = flash_self.fused_self_block(p, x, enc, conf.num_heads, shift=0.0,
                                      interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5)


def test_fused_self_block_batched_blocks():
    p, x, enc = _setup(3, b=2, n=256)
    conf = lt.lightglue_config("superpoint", flash=False, fused_ffn=False)
    ref = _ref(p, x, enc, conf)
    got = flash_self.fused_self_block(p, x, enc, conf.num_heads, block_q=64,
                                      interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5)


def test_fused_self_block_bf16():
    p, x, enc = _setup(4)
    conf = lt.lightglue_config("superpoint", flash=False, fused_ffn=False)
    ref = _ref(p, x.astype(jnp.bfloat16), enc, conf)
    got = flash_self.fused_self_block(
        p, x.astype(jnp.bfloat16), enc, conf.num_heads, interpret=True
    )
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=0.15
    )
