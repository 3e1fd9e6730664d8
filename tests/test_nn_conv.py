"""Conv formulation equivalence: conv2d_im2col / conv2d_tapmat vs conv2d,
and DISK's lazy final-block heads vs the dense U-Net output.

The alternate formulations exist purely for TPU performance (lane-starved
small-channel convs; see nn.py docstrings) — they must be numerically
equivalent to the direct conv at fp32.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightglue_tpu import nn
from lightglue_tpu.configs import DISKConfig
from lightglue_tpu.models import disk


@pytest.mark.parametrize("kernel,cin,cout", [(5, 80, 1), (3, 8, 4), (3, 4, 1)])
def test_conv2d_tapmat_matches_conv2d(kernel, cin, cout):
    key = jax.random.key(0)
    p = nn.conv2d_init(key, cin, cout, kernel)
    x = jax.random.normal(jax.random.key(1), (2, 16, 20, cin), jnp.float32)
    ref = nn.conv2d(p, x)
    out = nn.conv2d_tapmat(p, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_conv2d_im2col_matches_conv2d():
    p = nn.conv2d_init(jax.random.key(0), 6, 8, 3)
    x = jax.random.normal(jax.random.key(1), (1, 12, 14, 6), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(nn.conv2d_im2col(p, x)), np.asarray(nn.conv2d(p, x)),
        atol=1e-5,
    )


def test_disk_lazy_heads_match_dense():
    """forward()'s tap-matmul heatmap and at-keypoint descriptors must equal
    slicing/gathering the dense unet_forward output."""
    conf = DISKConfig(max_num_keypoints=16, resize=0, detection_threshold=-1e9)
    params = disk.init_params(jax.random.key(0), conf)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (1, 32, 48, 3)).astype(np.float32))

    dense = disk.unet_forward(params, img)
    z = disk.unet_trunk(params, img)
    heat = disk._heatmap_tapmat(params, z, conf.desc_dim)
    np.testing.assert_allclose(
        np.asarray(heat), np.asarray(dense[..., conf.desc_dim]), atol=1e-4
    )

    kpts = jnp.asarray(
        np.stack(
            [rng.integers(0, 48, 16), rng.integers(0, 32, 16)], axis=-1
        )[None].astype(np.float32)
    )
    descs = disk._desc_at_keypoints(params, z, kpts, conf.desc_dim)
    idx = (kpts[..., 1].astype(jnp.int32) * 48 + kpts[..., 0].astype(jnp.int32))
    flat = dense[..., : conf.desc_dim].reshape(1, 32 * 48, conf.desc_dim)
    ref = jnp.take_along_axis(flat, idx[..., None], axis=1)
    np.testing.assert_allclose(np.asarray(descs), np.asarray(ref), atol=1e-4)


def test_disk_forward_matches_dense_pipeline():
    """Full forward (lazy path) equals the round-1 dense pipeline."""
    conf = DISKConfig(max_num_keypoints=24, resize=0)
    params = disk.init_params(jax.random.key(2), conf)
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
    size = jnp.asarray([[32.0, 32.0]])

    out = disk.forward(params, conf, img, size)

    dense = disk.unet_forward(params, img)
    heat = dense[..., conf.desc_dim].astype(jnp.float32)
    kpts, kscores, valid = disk.heatmap_to_keypoints(heat, conf, size)
    idx = (kpts[..., 1].astype(jnp.int32) * 32 + kpts[..., 0].astype(jnp.int32))
    flat = dense[..., : conf.desc_dim].reshape(1, 32 * 32, conf.desc_dim)
    descs = jnp.take_along_axis(flat, idx[..., None], axis=1)
    descs = nn.l2_normalize(descs.astype(jnp.float32), axis=-1)
    descs = jnp.where(valid[..., None], descs, 0.0)

    np.testing.assert_array_equal(np.asarray(out.keypoints), np.asarray(kpts))
    np.testing.assert_allclose(
        np.asarray(out.descriptors), np.asarray(descs), atol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(out.valid), np.asarray(valid))


@pytest.mark.parametrize("kernel,cin,cout", [(5, 3, 16), (3, 3, 16), (3, 16, 16)])
def test_conv2d_s2d_matches_conv2d(kernel, cin, cout):
    p = nn.conv2d_init(jax.random.key(0), cin, cout, kernel)
    x = jax.random.normal(jax.random.key(1), (2, 16, 24, cin), jnp.float32)
    ref = nn.conv2d(p, x)
    out = nn.depth_to_space2(nn.conv2d_s2d(p, nn.space_to_depth2(x)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_space_to_depth_roundtrip():
    x = jax.random.normal(jax.random.key(0), (1, 8, 10, 5), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(nn.depth_to_space2(nn.space_to_depth2(x))), np.asarray(x)
    )


@pytest.mark.parametrize("kernel,cin,cout", [(5, 3, 16), (3, 3, 8)])
def test_conv2d_phases_matches_conv2d(kernel, cin, cout):
    p = nn.conv2d_init(jax.random.key(0), cin, cout, kernel)
    x = jax.random.normal(jax.random.key(1), (2, 16, 24, cin), jnp.float32)
    ref = nn.space_to_depth2(nn.conv2d(p, x))
    out = nn.conv2d_phases(p, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
