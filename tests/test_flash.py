"""Pallas strip-softmax attention kernel vs the XLA reference path
(interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from lightglue_tpu.ops import attention as attn_ops
from lightglue_tpu.ops import flash


def _rand(shape, seed):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


def test_flash_sdpa_unmasked():
    q = jnp.asarray(_rand((2, 2, 128, 64), 0))
    k = jnp.asarray(_rand((2, 2, 128, 64), 1))
    v = jnp.asarray(_rand((2, 2, 128, 64), 2))
    ref = attn_ops.sdpa(q, k, v)
    got = flash.flash_sdpa(q, k, v, block_q=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_flash_sdpa_masked():
    q = jnp.asarray(_rand((1, 2, 128, 64), 3))
    k = jnp.asarray(_rand((1, 2, 128, 64), 4))
    v = jnp.asarray(_rand((1, 2, 128, 64), 5))
    valid = jnp.asarray(np.arange(128)[None] < 100)
    ref = attn_ops.sdpa(q, k, v, valid[:, None, None, :])
    got = flash.flash_sdpa(q, k, v, valid, block_q=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_flash_sdpa_all_masked():
    q = jnp.asarray(_rand((1, 2, 128, 64), 6))
    k = jnp.asarray(_rand((1, 2, 128, 64), 7))
    v = jnp.asarray(_rand((1, 2, 128, 64), 8))
    valid = jnp.zeros((1, 128), bool)
    got = flash.flash_sdpa(q, k, v, valid, block_q=64, interpret=True)
    assert np.allclose(np.asarray(got), 0.0)


def test_flash_cross_pair():
    qk0 = jnp.asarray(_rand((1, 2, 128, 64), 9))
    qk1 = jnp.asarray(_rand((1, 2, 128, 64), 10))
    v0 = jnp.asarray(_rand((1, 2, 128, 64), 11))
    v1 = jnp.asarray(_rand((1, 2, 128, 64), 12))
    valid0 = jnp.asarray(np.arange(128)[None] < 100)
    valid1 = jnp.asarray(np.arange(128)[None] < 90)
    mask = valid0[:, None, :, None] & valid1[:, None, None, :]
    ref0, ref1 = attn_ops.bidirectional_cross_attention(qk0, qk1, v0, v1, mask)
    got0, got1 = flash.flash_cross_pair(
        qk0, qk1, v0, v1, valid0, valid1, block_q=64, interpret=True
    )
    # ref zeroes masked-query rows; kernel leaves them garbage (they are
    # ignored downstream) — compare valid rows only
    ref0v = np.asarray(ref0)[:, :, :100]
    got0v = np.asarray(got0)[:, :, :100]
    np.testing.assert_allclose(got0v, ref0v, atol=2e-5)
    ref1v = np.asarray(ref1)[:, :, :90]
    got1v = np.asarray(got1)[:, :, :90]
    np.testing.assert_allclose(got1v, ref1v, atol=2e-5)


def test_flash_sdpa_bf16():
    q = jnp.asarray(_rand((1, 2, 128, 64), 13)).astype(jnp.bfloat16)
    k = jnp.asarray(_rand((1, 2, 128, 64), 14)).astype(jnp.bfloat16)
    v = jnp.asarray(_rand((1, 2, 128, 64), 15)).astype(jnp.bfloat16)
    ref = attn_ops.sdpa(q, k, v)
    got = flash.flash_sdpa(q, k, v, block_q=64, interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=3e-2
    )


def test_fused_cross_attention():
    from lightglue_tpu.ops import flash_cross

    qk0 = jnp.asarray(_rand((1, 2, 128, 64), 20))
    qk1 = jnp.asarray(_rand((1, 2, 128, 64), 21))
    v0 = jnp.asarray(_rand((1, 2, 128, 64), 22))
    v1 = jnp.asarray(_rand((1, 2, 128, 64), 23))
    valid0 = jnp.asarray(np.arange(128)[None] < 100)
    valid1 = jnp.asarray(np.arange(128)[None] < 90)
    mask = valid0[:, None, :, None] & valid1[:, None, None, :]
    ref0, ref1 = attn_ops.bidirectional_cross_attention(qk0, qk1, v0, v1, mask)
    g0, g1 = flash_cross.fused_cross_attention(
        qk0, qk1, v0, v1, valid0, valid1, block_q=64, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(g0)[:, :, :100], np.asarray(ref0)[:, :, :100], atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(g1)[:, :, :90], np.asarray(ref1)[:, :, :90], atol=2e-5
    )


def test_fused_cross_attention_nomask():
    from lightglue_tpu.ops import flash_cross

    qk0 = jnp.asarray(_rand((2, 2, 128, 64), 24))
    qk1 = jnp.asarray(_rand((2, 2, 192, 64), 25))
    v0 = jnp.asarray(_rand((2, 2, 128, 64), 26))
    v1 = jnp.asarray(_rand((2, 2, 192, 64), 27))
    ref0, ref1 = attn_ops.bidirectional_cross_attention(qk0, qk1, v0, v1)
    g0, g1 = flash_cross.fused_cross_attention(
        qk0, qk1, v0, v1, block_q=64, interpret=True
    )
    np.testing.assert_allclose(np.asarray(g0), np.asarray(ref0), atol=2e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(ref1), atol=2e-5)
