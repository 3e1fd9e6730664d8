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


def test_fused_assignment_filter():
    from lightglue_tpu import nn as lnn
    from lightglue_tpu.ops import assignment as asg
    from lightglue_tpu.ops import assignment_fused as fasg
    import jax

    rng = np.random.default_rng(30)
    B, M, N, D = 1, 128, 128, 64
    d0 = jnp.asarray(rng.standard_normal((B, M, D)).astype(np.float32))
    d1 = jnp.asarray(rng.standard_normal((B, N, D)).astype(np.float32))
    p = asg.match_assignment_init(jax.random.key(0), D)
    mask0 = jnp.asarray(np.arange(M)[None] < M - 9)
    mask1 = jnp.asarray(np.arange(N)[None] < N - 17)
    for masks in ((None, None), (mask0, mask1)):
        scores, _ = asg.match_assignment(p, d0, d1, *masks)
        rm0, rm1, rs0, rs1 = asg.filter_matches(scores, 0.1, *masks)
        inv = D**-0.25
        md0 = lnn.linear(p["final_proj"], d0) * inv
        md1 = lnn.linear(p["final_proj"], d1) * inv
        z0 = lnn.linear(p["matchability"], d0)[..., 0]
        z1 = lnn.linear(p["matchability"], d1)[..., 0]
        gm0, gm1, gs0, gs1 = fasg.fused_filter_matches(
            md0, md1, z0, z1, 0.1, *masks, block_q=64, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(gm0), np.asarray(rm0))
        np.testing.assert_array_equal(np.asarray(gm1), np.asarray(rm1))
        np.testing.assert_allclose(np.asarray(gs0), np.asarray(rs0), atol=1e-5)
        np.testing.assert_allclose(np.asarray(gs1), np.asarray(rs1), atol=1e-5)


def test_pick_block_indivisible_lengths():
    """Any multiple-of-128 length must tile (ADVICE r1: 384/640 crashed with
    the default block_q=256); odd lengths degrade to a legal divisor."""
    assert flash.pick_block(384, 256) == 128
    assert flash.pick_block(640, 256) == 128
    assert flash.pick_block(512, 256) == 256
    assert flash.pick_block(100, 256) == 100
    assert flash.pick_block(96, 64) == 32


def test_flash_sdpa_384():
    """Default block_q on a 384-length input (not a multiple of 256)."""
    q = jnp.asarray(_rand((1, 1, 384, 64), 20))
    k = jnp.asarray(_rand((1, 1, 384, 64), 21))
    v = jnp.asarray(_rand((1, 1, 384, 64), 22))
    ref = attn_ops.sdpa(q, k, v)
    got = flash.flash_sdpa(q, k, v, interpret=True)  # default block_q=256
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_fused_cross_and_assignment_384():
    from lightglue_tpu.ops import assignment as asg
    from lightglue_tpu.ops import assignment_fused as fasg
    from lightglue_tpu.ops import flash_cross

    qk0 = jnp.asarray(_rand((1, 1, 384, 64), 23))
    qk1 = jnp.asarray(_rand((1, 1, 384, 64), 24))
    v0 = jnp.asarray(_rand((1, 1, 384, 64), 25))
    v1 = jnp.asarray(_rand((1, 1, 384, 64), 26))
    ref0, ref1 = attn_ops.bidirectional_cross_attention(qk0, qk1, v0, v1)
    got0, got1 = flash_cross.fused_cross_attention(
        qk0, qk1, v0, v1, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got0), np.asarray(ref0), atol=2e-4)
    np.testing.assert_allclose(np.asarray(got1), np.asarray(ref1), atol=2e-4)

    md0 = jnp.asarray(_rand((1, 384, 64), 27))
    md1 = jnp.asarray(_rand((1, 384, 64), 28))
    z0 = jnp.asarray(_rand((1, 384), 29))
    z1 = jnp.asarray(_rand((1, 384), 30))
    out = fasg.fused_filter_matches(md0, md1, z0, z1, 0.1, interpret=True)
    assert out[0].shape == (1, 384)


def test_flash_sdpa_fixed_shift():
    """Constant-shift softmax (exp2 domain) matches the exact path."""
    q = jnp.asarray(_rand((2, 2, 128, 64), 31)) * 0.5
    k = jnp.asarray(_rand((2, 2, 128, 64), 32)) * 0.5
    v = jnp.asarray(_rand((2, 2, 128, 64), 33))
    valid = jnp.asarray(np.arange(128)[None] < 90).repeat(2, 0)
    ref = attn_ops.sdpa(q, k, v, valid[:, None, None, :])
    got = flash.flash_sdpa(q, k, v, valid, interpret=True, shift=8.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_single_pass_cross_fixed_shift():
    """True single-pass bidirectional cross kernel (one exp2, MXU sums)
    matches the XLA bidirectional reference, masked and multi-block."""
    from lightglue_tpu.ops import flash_cross

    B, H, M, N, D = 1, 2, 256, 192, 64
    qk0 = jnp.asarray(_rand((B, H, M, D), 34)) * 0.5
    qk1 = jnp.asarray(_rand((B, H, N, D), 35)) * 0.5
    v0 = jnp.asarray(_rand((B, H, M, D), 36))
    v1 = jnp.asarray(_rand((B, H, N, D), 37))
    valid0 = jnp.asarray(np.arange(M)[None] < M - 20)
    valid1 = jnp.asarray(np.arange(N)[None] < N - 30)
    mask = valid0[:, None, :, None] & valid1[:, None, None, :]
    r0, r1 = attn_ops.bidirectional_cross_attention(qk0, qk1, v0, v1, mask)
    g0, g1 = flash_cross.fused_cross_attention(
        qk0, qk1, v0, v1, valid0, valid1, interpret=True, shift=8.0
    )
    np.testing.assert_allclose(
        np.asarray(g0)[:, :, : M - 20], np.asarray(r0)[:, :, : M - 20],
        atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(g1)[:, :, : N - 30], np.asarray(r1)[:, :, : N - 30],
        atol=2e-5,
    )
    # multi-block accumulation path (block smaller than M)
    import lightglue_tpu.ops.flash as fl

    orig = fl.pick_block
    fl.pick_block = lambda n, b: 64
    try:
        g0b, g1b = flash_cross.fused_cross_attention(
            qk0, qk1, v0, v1, valid0, valid1, interpret=True, shift=8.0
        )
    finally:
        fl.pick_block = orig
    np.testing.assert_allclose(
        np.asarray(g0b)[:, :, : M - 20], np.asarray(r0)[:, :, : M - 20],
        atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(g1b)[:, :, : N - 30], np.asarray(r1)[:, :, : N - 30],
        atol=2e-5,
    )


def test_fused_ffn_residual():
    """Fused FFN+LN+GELU kernel matches the XLA _ffn composition."""
    import jax

    from lightglue_tpu import nn
    from lightglue_tpu.models import lightglue as lg
    from lightglue_tpu.ops import ffn as ffn_ops

    d = 256
    p = lg._ffn_init(jax.random.key(0), d)
    x = jnp.asarray(_rand((2, 384, d), 40))
    m = jnp.asarray(_rand((2, 384, d), 41))
    ref = x + lg._ffn(p, jnp.concatenate([x, m], axis=-1))
    got = ffn_ops.fused_ffn_residual(x, m, p, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)
    # non-default block divisor path
    got2 = ffn_ops.fused_ffn_residual(x, m, p, block_q=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref), atol=2e-5)
