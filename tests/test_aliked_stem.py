"""Fused ALIKED block-1 kernel (ops/aliked_stem.py) vs the composed XLA
ops it replaces (models/aliked.py::_conv_block + _avg_pool + conv1 1x1).

Interpret-mode Pallas on CPU; on-TPU agreement is tracked by bench.py's
kernel-agreement section as ``aliked_stem_vs_xla_bf16``."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightglue_tpu import nn
from lightglue_tpu.configs import ALIKEDConfig
from lightglue_tpu.models import aliked
from lightglue_tpu.ops.aliked_stem import aliked_stem_ok, fused_aliked_stem


def _xla_ref(params, image):
    x1 = aliked._conv_block(params["block1"], image)
    y1 = aliked.selu(nn.conv2d(params["conv1"], x1))
    xp = aliked._avg_pool(x1, 2)
    return y1, xp


@pytest.mark.parametrize("mp", [False, True])
@pytest.mark.parametrize(
    "shape",
    [
        # the batched aligned shape is the expensive interpret run (~33 s
        # on the 1-core host): tier2; the unaligned single-image shape
        # covers the masking/padding logic in the default tier
        pytest.param((2, 64, 256), marks=pytest.mark.tier2),
        (1, 80, 300),
    ],
)
def test_agrees_with_xla(mp, shape):
    params = aliked.init_params(jax.random.key(0), ALIKEDConfig())
    b, h, w = shape
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.uniform(0, 1, (b, h, w, 3)).astype(np.float32))
    x = img.astype(jnp.bfloat16) if mp else img
    ref_y1, ref_xp = _xla_ref(params, x)
    got_y1, got_xp = fused_aliked_stem(
        {"block1": params["block1"], "conv1": params["conv1"]},
        x, mp=mp, interpret=True,
    )
    assert got_y1.shape == ref_y1.shape == (b, h, w, 32)
    assert got_xp.shape == ref_xp.shape == (b, h // 2, w // 2, 16)
    # fp32: association-only deltas; bf16: dx-split partial sums + rounded
    # BN/SELU intermediates (same envelope as the SuperPoint stem kernel)
    tol = 4e-2 if mp else 2e-5
    np.testing.assert_allclose(
        np.asarray(got_y1.astype(jnp.float32)),
        np.asarray(ref_y1.astype(jnp.float32)), atol=tol,
    )
    np.testing.assert_allclose(
        np.asarray(got_xp.astype(jnp.float32)),
        np.asarray(ref_xp.astype(jnp.float32)), atol=tol,
    )


def test_gate():
    assert aliked_stem_ok(768, 1024)
    assert not aliked_stem_ok(72, 1024)   # h not strip-tileable
    assert not aliked_stem_ok(768, 8192)  # W beyond the VMEM bound
