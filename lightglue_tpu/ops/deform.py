"""Deformable convolution (DCNv1/v2) for TPU.

The reference ALIKED wraps ``torchvision.ops.deform_conv2d`` (a CUDA/C++ op,
reference aliked.py:291-349). On TPU this becomes a gather-based formulation
XLA handles well: build the per-tap sampling grid, bilinear-sample all kernel
taps (zero padding outside), and contract patches x weights on the MXU.

Offset channel layout follows torchvision: for kernel tap t (row-major
ki*kw+kj), channel 2*t is dy and 2*t+1 is dx.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .. import nn


def _bilinear_gather(x: jnp.ndarray, fy: jnp.ndarray, fx: jnp.ndarray):
    """Sample x (B, H, W, C) at float pixel coords fy/fx (B, ...), zero
    outside. Returns (B, ..., C).

    Quad-table formulation: TPU row gathers are the bottleneck (4 gathers
    per sample, each only C lanes wide). Instead, precompute a corner-quad
    table T[y, x] = [x(y,x), x(y,x+1), x(y+1,x), x(y+1,x+1)] over a
    zero-padded grid, so ONE 4C-wide (full-lane) gather fetches all four
    bilinear corners.

    Outside-the-image zeroing happens by CLAMPING the sample coordinate
    into [-1, size] before the floor/weight split instead of torchvision's
    per-corner validity masks: for coords already in [-1, size] the clamp
    is the identity (bitwise-identical weights); past it, every corner the
    clamped sample touches lies in the table's zero-pad ring, so the
    result is the same exact 0 the mask form produces — while the 8
    comparisons + 4 mask multiplies per sample disappear (measured
    block3: 1.66 -> 1.36 ms/img, v5e bf16 B1). The 4-corner combine
    stays fp32 even for bf16 inputs: an all-bf16 combine measured 2.1x
    SLOWER (3.5 ms — 16-bit packing overhead dominates the VPU chain;
    scripts/micro_deform_ab.py).
    """
    b, h, w, c = x.shape
    fy = jnp.clip(fy, -1.0, float(h))
    fx = jnp.clip(fx, -1.0, float(w))
    # floor(size) == size after the clamp; pull it back so wy/wx stay in
    # [0, 1] and the base corner stays inside the table range [-1, size-1]
    y0 = jnp.minimum(jnp.floor(fy), h - 1.0)
    x0 = jnp.minimum(jnp.floor(fx), w - 1.0)
    wy = (fy - y0)[..., None]
    wx = (fx - x0)[..., None]

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    hp, wp = h + 1, w + 1  # table covers base corners y in [-1, h-1]
    quad = jnp.concatenate(
        [
            xp[:, :hp, :wp],      # v00 = x[y, x]
            xp[:, :hp, 1:],       # v01 = x[y, x+1]
            xp[:, 1:, :wp],       # v10 = x[y+1, x]
            xp[:, 1:, 1:],        # v11 = x[y+1, x+1]
        ],
        axis=-1,
    ).reshape(b, hp * wp, 4 * c)

    idx = (y0.astype(jnp.int32) + 1) * wp + (x0.astype(jnp.int32) + 1)
    g = jnp.take_along_axis(quad, idx.reshape(b, -1)[..., None], axis=1)
    g = g.reshape(*y0.shape, 4, c)

    w00 = (1 - wy) * (1 - wx)
    w01 = (1 - wy) * wx
    w10 = wy * (1 - wx)
    w11 = wy * wx
    return (
        g[..., 0, :] * w00
        + g[..., 1, :] * w01
        + g[..., 2, :] * w10
        + g[..., 3, :] * w11
    )


def deform_conv2d(
    x: jnp.ndarray,
    offset: jnp.ndarray,
    weight: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    padding: int = 1,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Deformable conv, stride 1.

    x: (B, H, W, C); offset: (B, H, W, 2*kh*kw) torchvision layout;
    weight: (kh, kw, C, Cout) HWIO; mask: (B, H, W, kh*kw) modulation
    (DCNv2) or None. Output (B, H, W, Cout) (same spatial size, like the
    reference's padding=1, k=3 usage).
    """
    b, h, w, c = x.shape
    kh, kw = weight.shape[:2]
    k2 = kh * kw
    off = offset.reshape(b, h, w, k2, 2)
    dy, dx = off[..., 0], off[..., 1]

    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :, None]
    ki = jnp.arange(kh, dtype=jnp.float32)
    kj = jnp.arange(kw, dtype=jnp.float32)
    tap_y = jnp.repeat(ki, kw)[None, None, None, :]  # row-major taps
    tap_x = jnp.tile(kj, kh)[None, None, None, :]

    fy = ys - padding + tap_y + dy.astype(jnp.float32)
    fx = xs - padding + tap_x + dx.astype(jnp.float32)

    # lerp happens in fp32 (weight promotion); contract on the MXU in the
    # input dtype so bf16 mode stays bf16 end to end
    patches = _bilinear_gather(x, fy, fx).astype(x.dtype)  # (B, H, W, k2, C)
    if mask is not None:
        patches = patches * mask.reshape(b, h, w, k2, 1).astype(patches.dtype)
    out = jnp.einsum(
        "bhwkc,kco->bhwo",
        patches,
        weight.reshape(k2, c, -1).astype(patches.dtype),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def deformable_conv_block(
    p: nn.Params, x: jnp.ndarray, padding: int = 1, use_mask: bool = False
) -> jnp.ndarray:
    """The reference's DeformableConv2d module (aliked.py:291-349):
    a regular conv predicts offsets (clamped to +-max(h,w)/4), then the
    deformable conv applies ``regular_conv`` weights at the offset taps.

    params: {"offset_conv": conv params, "regular_conv": conv params}.
    """
    h, w = x.shape[1:3]
    max_offset = max(h, w) / 4.0
    kh = p["offset_conv"]["w"].shape[0]
    if padding == (kh - 1) // 2:
        # offset head has tiny cout (2*k^2=18): im2col matmul beats XLA conv
        out = nn.conv2d_im2col(p["offset_conv"], x)
    else:
        out = nn.conv2d(p["offset_conv"], x, padding=padding)
    if use_mask:
        k2 = out.shape[-1] // 3
        o1, o2, m = out[..., :k2], out[..., k2:2 * k2], out[..., 2 * k2:]
        offset = jnp.concatenate([o1, o2], axis=-1)
        mask = jax.nn.sigmoid(m)
    else:
        offset = out
        mask = None
    offset = jnp.clip(offset, -max_offset, max_offset)
    return deform_conv2d(
        x,
        offset,
        p["regular_conv"]["w"],
        p["regular_conv"].get("b"),
        padding=padding,
        mask=mask,
    )
