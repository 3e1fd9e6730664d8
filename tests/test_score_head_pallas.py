"""Fused ALIKED score-head kernel (ops/score_head.py) vs the XLA tapmat
tail it replaces (models/aliked.py::_dense_raw fallback path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightglue_tpu import nn
from lightglue_tpu.models.aliked import selu
from lightglue_tpu.ops.score_head import score_head_pallas


def _xla_tail(sh, s0, mp):
    dt = jnp.bfloat16 if mp else jnp.float32
    s = selu(s0.astype(dt))
    s = selu(nn.conv2d_tapmat(sh["2"], s))
    s = selu(nn.conv2d_tapmat(sh["4"], s))
    s = nn.conv2d_tapmat(sh["6"], s)
    return jax.nn.sigmoid(s.astype(jnp.float32))[..., 0]


def _params(key):
    k = jax.random.split(key, 3)
    return {
        "2": nn.conv2d_init(k[0], 8, 4, 3, bias=False),
        "4": nn.conv2d_init(k[1], 4, 4, 3, bias=False),
        "6": nn.conv2d_init(k[2], 4, 1, 3, bias=False),
    }


@pytest.mark.tier2  # NHWC wrapper; the production cplane path is default
def test_agreement_fp32():
    sh = _params(jax.random.key(0))
    rng = np.random.default_rng(1)
    s0 = jnp.asarray(rng.standard_normal((2, 96, 128, 8)).astype(np.float32))
    ref = np.asarray(_xla_tail(sh, s0, False))
    got = np.asarray(
        score_head_pallas(sh, s0, mp=False, tile_rows=32, interpret=True)
    )
    # identical fp32 products, different fp32 accumulation order
    np.testing.assert_allclose(got, ref, atol=2e-6, rtol=0)


@pytest.mark.tier2
def test_mp_no_worse_than_xla_mp():
    """The kernel's bf16 mode keeps fp32 accumulation throughout (the XLA
    tapmat path rounds the 36-lane tap partials to bf16 between the matmul
    and the shift-sum), so vs the fp32 truth it must be at least as close
    as the XLA mp path — not bit-identical to it."""
    sh = _params(jax.random.key(0))
    rng = np.random.default_rng(1)
    s0 = jnp.asarray(rng.standard_normal((2, 96, 128, 8)).astype(np.float32))
    truth = np.asarray(_xla_tail(sh, s0, False))
    xla_mp = np.asarray(_xla_tail(sh, s0, True))
    got = np.asarray(
        score_head_pallas(sh, s0, mp=True, tile_rows=32, interpret=True)
    )
    np.testing.assert_allclose(got, xla_mp, atol=2e-2, rtol=0)
    assert np.abs(got - truth).mean() <= np.abs(xla_mp - truth).mean() * 1.05


def test_cplane_agreement_fp32():
    """The composition-safe channel-plane entry point (consumes (B,8,H,W)
    partial sums built by models/aliked._dense_raw's einsum ordering)."""
    from lightglue_tpu.ops.score_head import score_head_pallas_cplane

    sh = _params(jax.random.key(4))
    rng = np.random.default_rng(5)
    s0 = jnp.asarray(rng.standard_normal((2, 96, 128, 8)).astype(np.float32))
    ref = np.asarray(_xla_tail(sh, s0, False))
    got = np.asarray(
        score_head_pallas_cplane(
            sh, s0.transpose(0, 3, 1, 2), mp=False, tile_rows=32,
            interpret=True,
        )
    )
    np.testing.assert_allclose(got, ref, atol=2e-6, rtol=0)


def test_lazy_agreement_fp32():
    """Fully-fused lazy score head (native-res branch partials, in-kernel
    upsample + tail) vs the composed XLA path (branch partials ->
    _upsample lerp matmuls -> s0 -> tail)."""
    from lightglue_tpu.models.aliked import _upsample
    from lightglue_tpu.ops.score_head import score_head_pallas_lazy

    sh = _params(jax.random.key(6))
    rng = np.random.default_rng(7)
    h, w = 256, 128
    parts_nhwc = [
        jnp.asarray(
            rng.standard_normal((1, h // f, w // f, 8)).astype(np.float32)
        )
        for f in (1, 2, 8, 32)
    ]
    s0 = parts_nhwc[0]
    for si, f in zip(parts_nhwc[1:], (2, 8, 32)):
        s0 = s0 + _upsample(si, f)
    ref = np.asarray(_xla_tail(sh, s0, False))
    got = np.asarray(
        score_head_pallas_lazy(
            sh, *[p.transpose(0, 3, 1, 2) for p in parts_nhwc],
            mp=False, interpret=True,
        )
    )
    assert got.shape == ref.shape == (1, h, w)
    # fp32 association only (the lerp matmul order differs from XLA's)
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=0)


def test_lazy_gate():
    from lightglue_tpu.ops.score_head import score_head_lazy_ok

    assert score_head_lazy_ok(768, 1024)
    assert not score_head_lazy_ok(736, 1024)  # h not stride-tileable
    assert not score_head_lazy_ok(768, 4096)


def test_cplane_gate():
    from lightglue_tpu.ops.score_head import score_head_cplane_ok

    assert score_head_cplane_ok(768, 1024)
    assert score_head_cplane_ok(96, 128)
    assert not score_head_cplane_ok(768, 4096)  # strip scratch > VMEM gate
    assert not score_head_cplane_ok(16, 1024)


@pytest.mark.tier2
def test_agreement_unaligned_width():
    sh = _params(jax.random.key(2))
    rng = np.random.default_rng(3)
    s0 = jnp.asarray(rng.standard_normal((1, 80, 200, 8)).astype(np.float32))
    ref = np.asarray(_xla_tail(sh, s0, False))
    got = np.asarray(
        score_head_pallas(sh, s0, mp=False, tile_rows=32, interpret=True)
    )
    np.testing.assert_allclose(got, ref, atol=2e-6, rtol=0)
