"""int8 descriptor cache quantization: accuracy + match-agreement."""

import numpy as np

import jax
import jax.numpy as jnp

from lightglue_tpu.configs import lightglue_config
from lightglue_tpu.models import lightglue as lg
from lightglue_tpu.ops.quant import dequantize_descriptors, quantize_descriptors


def test_quant_roundtrip_error():
    rng = np.random.default_rng(0)
    d = rng.standard_normal((4, 64, 128)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    q = quantize_descriptors(jnp.asarray(d))
    assert q.codes.dtype == jnp.int8
    back = np.asarray(dequantize_descriptors(q))
    err = np.abs(back - d).max()
    assert err <= 1.0 / 127.0 / 2.0 + 1e-6
    cos = (back * d).sum(-1)
    assert cos.min() > 0.998


def test_quant_match_agreement():
    conf = lightglue_config(
        "superpoint", n_layers=2, depth_confidence=-1.0, width_confidence=-1.0
    )
    params = lg.init_params(jax.random.key(0), conf)
    rng = np.random.default_rng(1)
    m = 64
    kw = dict(
        kpts0=jnp.asarray(rng.uniform(0, 512, (1, m, 2)).astype(np.float32)),
        kpts1=jnp.asarray(rng.uniform(0, 512, (1, m, 2)).astype(np.float32)),
        size0=jnp.asarray([[512.0, 512.0]]),
        size1=jnp.asarray([[512.0, 512.0]]),
    )
    d0 = rng.standard_normal((1, m, 256)).astype(np.float32)
    d1 = rng.standard_normal((1, m, 256)).astype(np.float32)
    d0 /= np.linalg.norm(d0, axis=-1, keepdims=True)
    d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)

    fwd = jax.jit(lg.forward, static_argnames=("conf",))
    ref = fwd(params, conf, desc0=jnp.asarray(d0), desc1=jnp.asarray(d1), **kw)
    dq0 = dequantize_descriptors(quantize_descriptors(jnp.asarray(d0)))
    dq1 = dequantize_descriptors(quantize_descriptors(jnp.asarray(d1)))
    got = fwd(params, conf, desc0=dq0, desc1=dq1, **kw)
    agree = (np.asarray(got.matches0) == np.asarray(ref.matches0)).mean()
    assert agree >= 0.95, agree
