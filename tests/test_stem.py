"""Fused SuperPoint stem kernel (ops/stem.py) vs the XLA conv path.

Interpret-mode Pallas on CPU; on-TPU agreement is tracked by bench.py's
kernel-agreement section under the ``fused_stem_vs_xla_bf16`` key
(benchmarks/kernel_agreement.json). Typical bf16 max-abs disagreement is
~4e-3; the assertion bound here is 2e-2."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightglue_tpu import nn
from lightglue_tpu.models import superpoint as sp
from lightglue_tpu.ops.stem import fused_stem_pallas, stem_pallas_ok


def _xla_stem(params, image, mp):
    x = image.astype(jnp.bfloat16) if mp else image
    x = jax.nn.relu(nn.conv2d(params["conv1a"], x))
    x = jax.nn.relu(nn.conv2d(params["conv1b"], x))
    return nn.max_pool(x, 2)


@pytest.fixture(scope="module")
def stem_params():
    params = sp.init_params(jax.random.key(0))
    return {"conv1a": params["conv1a"], "conv1b": params["conv1b"]}


@pytest.mark.parametrize("mp", [False, True])
@pytest.mark.parametrize("shape", [(2, 64, 256), (1, 80, 300)])
def test_stem_agrees_with_xla(stem_params, mp, shape):
    b, h, w = shape
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.uniform(0, 1, (b, h, w, 1)).astype(np.float32))
    got = np.asarray(
        fused_stem_pallas(stem_params, img, mp=mp, interpret=True).astype(
            jnp.float32
        )
    )
    want = np.asarray(_xla_stem(stem_params, img, mp).astype(jnp.float32))
    assert got.shape == want.shape == (b, h // 2, w // 2, 64)
    tol = 2e-2 if mp else 1e-5
    np.testing.assert_allclose(got, want, atol=tol)


def test_stem_gate():
    assert stem_pallas_ok(768, 1024)
    assert not stem_pallas_ok(768, 254)  # too narrow
    assert not stem_pallas_ok(50, 1024)  # too short
    assert not stem_pallas_ok(81, 1024)  # odd rows
    assert not stem_pallas_ok(768, 4100)  # a1 scratch would exceed VMEM


def test_fused_stem_config_switch():
    """SuperPointConfig.fused_stem=False must force the XLA conv path
    (ADVICE r4: reference-exact selection needs an off switch)."""
    from lightglue_tpu.configs import SuperPointConfig

    assert SuperPointConfig().fused_stem
    conf = SuperPointConfig(fused_stem=False)
    params = sp.init_params(jax.random.key(0), conf)
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.uniform(0, 1, (1, 64, 256, 1)).astype(np.float32))
    out = sp.forward(params, conf, img)
    assert out.keypoints.shape[0] == 1


def test_dense_forward_unchanged_on_cpu(stem_params):
    """The CPU/test path must keep using the XLA stem (gate is TPU-only)."""
    params = sp.init_params(jax.random.key(0))
    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.uniform(0, 1, (1, 64, 256, 1)).astype(np.float32))
    scores, desc = sp.dense_forward(params, img)
    assert scores.shape == (1, 64, 256)
    assert desc.shape == (1, 8, 32, 256)


class TestBlock2:
    """Fused block-2 kernel (ops/stem2.py) + the cplane stem layout."""

    @pytest.mark.parametrize("mp", [False, True])
    @pytest.mark.parametrize("shape", [(2, 64, 256), (1, 80, 300)])
    def test_block2_chain_agrees_with_xla(self, mp, shape):
        from lightglue_tpu.ops.stem2 import fused_block2_pallas

        params = sp.init_params(jax.random.key(0))
        b, h, w = shape
        rng = np.random.default_rng(7)
        img = jnp.asarray(rng.uniform(0, 1, (b, h, w, 1)).astype(np.float32))
        x = img.astype(jnp.bfloat16) if mp else img
        x = jax.nn.relu(nn.conv2d(params["conv1a"], x))
        x = jax.nn.relu(nn.conv2d(params["conv1b"], x))
        x = nn.max_pool(x, 2)
        x = jax.nn.relu(nn.conv2d(params["conv2a"], x))
        x = jax.nn.relu(nn.conv2d(params["conv2b"], x))
        want = np.asarray(nn.max_pool(x, 2).astype(jnp.float32))

        cp = fused_stem_pallas(
            {"conv1a": params["conv1a"], "conv1b": params["conv1b"]},
            img, mp=mp, interpret=True, out_layout="cplane",
        )
        wp2 = -(-cp.shape[3] // 128) * 128
        cp = jnp.pad(cp, ((0, 0), (0, 0), (0, 0), (0, wp2 - cp.shape[3])))
        got = np.asarray(
            fused_block2_pallas(
                {"conv2a": params["conv2a"], "conv2b": params["conv2b"]},
                cp, h2=h // 2, w2=w // 2, mp=mp, interpret=True,
            ).astype(jnp.float32)
        )
        assert got.shape == want.shape == (b, h // 4, w // 4, 64)
        # two 576-deep convs of dx-split partial sums compound the stem
        # envelope: ~1e-4 fp32 / ~1e-3 bf16 typical
        np.testing.assert_allclose(got, want, atol=4e-2 if mp else 5e-4)

    def test_cplane_layout_matches_nhwc(self):
        params = sp.init_params(jax.random.key(0))
        stem_p = {"conv1a": params["conv1a"], "conv1b": params["conv1b"]}
        rng = np.random.default_rng(8)
        img = jnp.asarray(rng.uniform(0, 1, (1, 64, 256, 1)).astype(np.float32))
        nhwc = fused_stem_pallas(stem_p, img, mp=False, interpret=True)
        cpl = fused_stem_pallas(
            stem_p, img, mp=False, interpret=True, out_layout="cplane"
        )
        assert cpl.shape == (1, 32, 64, 128)
        np.testing.assert_array_equal(
            np.asarray(nhwc), np.asarray(cpl.transpose(0, 1, 3, 2))
        )

    def test_block2_gate(self):
        from lightglue_tpu.ops.stem2 import block2_pallas_ok

        assert block2_pallas_ok(768, 1024)
        assert not block2_pallas_ok(768, 1000)  # w/2 not a lane multiple
        assert not block2_pallas_ok(80, 1024)  # h/2 not strip-tileable
        assert not block2_pallas_ok(768, 8192)  # strip scratch too large
