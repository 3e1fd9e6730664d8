"""Keypoint coordinate utilities (static-shape, mask-aware).

Reference semantics: lightglue/lightglue.py:31-55. The TPU versions accept an
optional validity mask so padded keypoint slots (required for static shapes
under jit) do not perturb the bbox-based normalization.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp


def normalize_keypoints(
    kpts: jnp.ndarray,
    size: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Shift/scale keypoints to ~[-1, 1] (reference: lightglue.py:31-43).

    kpts: (B, N, 2); size: (B, 2) as (w, h) or None; mask: (B, N) bool marks
    valid slots. With ``size=None`` the bbox of the (valid) keypoints is used:
    ``size = 1 + max - min``.
    """
    kpts = kpts.astype(jnp.float32)
    if size is None:
        if mask is not None:
            big = jnp.float32(1e9)
            m = mask[..., None]
            mx = jnp.max(jnp.where(m, kpts, -big), axis=-2)
            mn = jnp.min(jnp.where(m, kpts, big), axis=-2)
        else:
            mx = jnp.max(kpts, axis=-2)
            mn = jnp.min(kpts, axis=-2)
        # clamp guards the zero-valid-keypoint case (mx/mn sentinels would
        # make size hugely negative); the reference instead bails out before
        # reaching here (lightglue.py:568-588)
        size = jnp.maximum(1.0 + mx - mn, 1.0)
        # match reference: shift is size/2 about the origin, not the bbox
        # center (lightglue.py:36 uses only max-min, no min offset)
    else:
        size = jnp.asarray(size, jnp.float32)
    shift = size / 2.0
    scale = jnp.max(size, axis=-1) / 2.0
    return (kpts - shift[..., None, :]) / scale[..., None, None]


def pad_to_length(
    x: jnp.ndarray, length: int, axis: int = -2
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pad ``x`` along ``axis`` to ``length`` with ones; return (padded, mask)
    where mask (bool, same shape but size ``length`` on ``axis``, last dim 1)
    marks real entries (reference: lightglue.py:46-55). Host-side helper for
    bucketing inputs before jit; inside jit shapes are already static."""
    axis = axis % x.ndim
    n = x.shape[axis]
    if length < n:
        raise ValueError(f"pad_to_length: {length} < existing {n}")
    pad_widths = [(0, 0)] * x.ndim
    pad_widths[axis] = (0, length - n)
    y = jnp.pad(x, pad_widths, constant_values=1)
    mask_shape = list(y.shape)
    mask_shape[-1] = 1
    idx = jnp.arange(length)
    mask = (idx < n).reshape(
        [length if i == axis else 1 for i in range(x.ndim)]
    )
    mask = jnp.broadcast_to(mask, mask_shape)
    return y, mask
