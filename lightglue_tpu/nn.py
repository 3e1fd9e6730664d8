"""Minimal functional NN layer library over plain param pytrees.

Design: parameters are nested dicts of ``jnp.ndarray`` (a JAX pytree), and
layers are pure functions ``apply(params, x)``. This keeps the whole framework
transform-friendly (``jit``/``vmap``/``grad``/``shard_map`` all just work on
pytrees), makes checkpoint conversion a dict-to-dict key mapping, and avoids
any stateful-module machinery.

Weight layout conventions (chosen for TPU, not torch):
  * Linear weights are stored ``(in, out)`` so application is ``x @ w`` — the
    natural MXU layout (reference torch stores ``(out, in)``; the converter in
    ``weights.py`` transposes).
  * Convolutions are NHWC with HWIO kernels — XLA:TPU's preferred layout; the
    channel dim lands on the 128-wide lane dimension.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


Params = dict


# ---------------------------------------------------------------------------
# Initializers (match torch defaults so random-init behaves comparably;
# parity tests copy exact weights from the reference anyway).
# ---------------------------------------------------------------------------


def _fan_in_uniform(key, shape, fan_in, dtype=jnp.float32):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def linear_init(
    key, in_dim: int, out_dim: int, bias: bool = True, dtype=jnp.float32
) -> Params:
    kw, kb = jax.random.split(key)
    # kaiming-uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), 1/sqrt(fan_in)) scaled
    # by sqrt(3)*gain; torch's default reduces to U(+-sqrt(1/fan_in)*sqrt(3)*
    # sqrt(2/(1+5)) ) = U(+-1/sqrt(fan_in)).
    p = {"w": _fan_in_uniform(kw, (in_dim, out_dim), in_dim, dtype)}
    if bias:
        p["b"] = _fan_in_uniform(kb, (out_dim,), in_dim, dtype)
    return p


def linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    y = x @ p["w"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def layer_norm_init(dim: int, dtype=jnp.float32) -> Params:
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layer_norm(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    # fp32 statistics regardless of compute dtype (bf16-safe)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def conv2d_init(
    key,
    in_ch: int,
    out_ch: int,
    kernel: int | Tuple[int, int],
    bias: bool = True,
    groups: int = 1,
    dtype=jnp.float32,
) -> Params:
    if isinstance(kernel, int):
        kernel = (kernel, kernel)
    kw, kb = jax.random.split(key)
    fan_in = (in_ch // groups) * kernel[0] * kernel[1]
    p = {
        "w": _fan_in_uniform(
            kw, (kernel[0], kernel[1], in_ch // groups, out_ch), fan_in, dtype
        )
    }
    if bias:
        p["b"] = _fan_in_uniform(kb, (out_ch,), fan_in, dtype)
    return p


def conv2d(
    p: Params,
    x: jnp.ndarray,
    stride: int | Tuple[int, int] = 1,
    padding: str | int | Sequence[Tuple[int, int]] = "SAME",
    groups: int = 1,
    dilation: int | Tuple[int, int] = 1,
) -> jnp.ndarray:
    """NHWC conv with HWIO kernel."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    y = jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=stride,
        padding=padding,
        rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def conv2d_im2col(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Stride-1 SAME conv as an explicit im2col matmul.

    XLA's TPU conv is lane-starved when channel counts sit far below the
    128-lane width (small-channel full-resolution heads: measured 2-6x
    slower than this formulation). Building the (B, H, W, k^2*Cin) column
    tensor is a few cheap shifted copies; the contraction then runs as one
    dense MXU matmul. Numerically identical taps, fp32 accumulation.
    """
    kh, kw, cin, cout = p["w"].shape
    b, h, w, _ = x.shape
    ph, pw = (kh - 1) // 2, (kw - 1) // 2
    xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    cols = jnp.concatenate(
        [
            xp[:, dy : dy + h, dx : dx + w]
            for dy in range(kh)
            for dx in range(kw)
        ],
        axis=-1,
    )
    wmat = p["w"].reshape(kh * kw * cin, cout).astype(x.dtype)
    y = jax.lax.dot_general(
        cols, wmat, (((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def conv2d_tapmat(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Stride-1 SAME conv for SMALL output-channel counts, as one matmul
    plus a shift-sum.

    A direct conv with cout << 128 wastes most of the MXU's 128 output
    lanes (measured: 5x5 80->1 at 1024x768 is 4.5 ms as an XLA conv, 0.34
    ms in this formulation). Instead compute, at every pixel, the partial
    products of ALL taps at once: u = x @ W where W is (cin, kh*kw*cout)
    — a lane-efficient matmul as long as kh*kw*cout stays near/below 128 —
    then realize the spatial shifts by summing kh*kw shifted slices of u
    (one cheap VPU pass). Numerically identical taps, fp32 accumulation.
    """
    kh, kw, cin, cout = p["w"].shape
    b, h, w, _ = x.shape
    ph, pw = (kh - 1) // 2, (kw - 1) // 2
    # tap-major, cout-minor column layout
    wtap = p["w"].reshape(kh * kw, cin, cout)
    wtap = jnp.moveaxis(wtap, 1, 0).reshape(cin, kh * kw * cout).astype(x.dtype)
    u = jax.lax.dot_general(
        x, wtap, (((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    up = jnp.pad(u, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    acc = jnp.zeros((b, h, w, cout), jnp.float32)
    for t in range(kh * kw):
        dy, dx = t // kw, t % kw
        acc = acc + up[
            :, dy : dy + h, dx : dx + w, t * cout : (t + 1) * cout
        ].astype(jnp.float32)
    y = acc.astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def space_to_depth2(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/2, W/2, 4C), phase-major: output channel block
    (a*2+b)*C..+C holds x[:, a::2, b::2, :]."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, H/2, W/2, a, b, C)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space2(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of space_to_depth2."""
    b, h2, w2, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h2, w2, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, 2 * h2, 2 * w2, c)


def _s2d_kernel(w: jnp.ndarray):
    """Rearrange an odd (kh, kw, cin, cout) stride-1 SAME kernel into its
    2x2 space-to-depth equivalent (kh', kw', 4*cin, 4*cout) plus the
    asymmetric padding it needs."""
    kh, kw, cin, cout = w.shape
    ph, pw = (kh - 1) // 2, (kw - 1) // 2

    def span(p):
        lo = -((p + 1) // 2)  # floor(-p/2)
        hi = (p + 1) // 2
        return lo, hi

    mlo, mhi = span(ph)
    nlo, nhi = span(pw)
    wp = jnp.zeros(
        (mhi - mlo + 1, nhi - nlo + 1, 4 * cin, 4 * cout), w.dtype
    )
    for a in range(2):
        for dy in range(kh):
            u = a + dy - ph
            m, ain = u >> 1, u & 1
            for b_ in range(2):
                for dx in range(kw):
                    v = b_ + dx - pw
                    n, bin_ = v >> 1, v & 1
                    wp = wp.at[
                        m - mlo,
                        n - nlo,
                        (ain * 2 + bin_) * cin : (ain * 2 + bin_ + 1) * cin,
                        (a * 2 + b_) * cout : (a * 2 + b_ + 1) * cout,
                    ].set(w[dy, dx])
    return wp, ((-mlo, mhi), (-nlo, nhi))


def conv2d_phases(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Stride-1 SAME odd-kernel conv on an UNPACKED input, emitting the
    2x2 space-to-depth PACKED output directly: one stride-2 conv with a
    (kh+1, kw+1, cin, 4*cout) kernel holding all four output phases.

    Avoids both the lane-starved full-res conv (small cout) and any
    explicit input packing: out(i,j)[(a*2+b)*cout+o] = y(2i+a, 2j+b, o)
    where y = conv2d(p, x). Padding stays the symmetric SAME (ph, ph).
    """
    kh, kw, cin, cout = p["w"].shape
    ph, pw = (kh - 1) // 2, (kw - 1) // 2
    wp = jnp.zeros((kh + 1, kw + 1, cin, 4 * cout), p["w"].dtype)
    for a in range(2):
        for b_ in range(2):
            # taps of phase (a, b): ty = a + dy - ph shifted by +ph
            wp = wp.at[
                a : a + kh, b_ : b_ + kw, :,
                (a * 2 + b_) * cout : (a * 2 + b_ + 1) * cout,
            ].add(p["w"])
    y = jax.lax.conv_general_dilated(
        x, wp.astype(x.dtype), (2, 2), [(ph, ph), (pw, pw)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if "b" in p:
        y = y + jnp.tile(p["b"], 4).astype(y.dtype)
    return y


def conv2d_s2d(p: Params, x_packed: jnp.ndarray) -> jnp.ndarray:
    """Stride-1 SAME odd-kernel conv evaluated in 2x2 space-to-depth
    space: input and output are PACKED (B, H/2, W/2, 4C) tensors.

    Full-resolution convs with few channels starve the TPU's 128-wide
    lanes (a 5x5 3->16 conv at 1024x768 measures 1.8 ms). Packing 2x2
    phases into channels turns it into a 3x3 12->64 conv at quarter
    resolution — same FLOPs, 4x the lane occupancy (measured ~4x faster).
    Exact: the packed kernel is a reindexing of the original taps.

    Equivalent to space_to_depth2(conv2d(p, depth_to_space2(x_packed))).
    """
    wp, pad = _s2d_kernel(p["w"])
    y = jax.lax.conv_general_dilated(
        x_packed, wp.astype(x_packed.dtype), (1, 1), list(pad),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x_packed.dtype)
    if "b" in p:
        y = y + jnp.tile(p["b"], 4).astype(y.dtype)
    return y


def max_pool(x: jnp.ndarray, window: int, stride: Optional[int] = None) -> jnp.ndarray:
    """NHWC max pooling (VALID), matching torch's MaxPool2d(k, s) semantics."""
    stride = stride or window
    return jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        (1, window, window, 1),
        (1, stride, stride, 1),
        "VALID",
    )


def max_pool_same(x: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Max pool with kernel (2r+1), stride 1, SAME padding — the NMS dilation
    primitive (reference: lightglue/superpoint.py:56-59)."""
    k = 2 * radius + 1
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        (1, k, k, 1) if x.ndim == 4 else (k, k),
        (1, 1, 1, 1) if x.ndim == 4 else (1, 1),
        "SAME",
    )


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """InstanceNorm2d(affine=False) over NHWC: normalize per (batch, channel)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.var(xf, axis=(1, 2), keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def batch_norm_init(dim: int, dtype=jnp.float32) -> Params:
    return {
        "scale": jnp.ones((dim,), dtype),
        "bias": jnp.zeros((dim,), dtype),
        "mean": jnp.zeros((dim,), dtype),
        "var": jnp.ones((dim,), dtype),
    }


def batch_norm(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Inference-mode batch norm (running stats) over the trailing channel dim."""
    inv = jax.lax.rsqrt(p["var"].astype(jnp.float32) + eps)
    scale = (p["scale"].astype(jnp.float32) * inv).astype(x.dtype)
    bias = (
        p["bias"].astype(jnp.float32) - p["mean"].astype(jnp.float32) * p["scale"].astype(jnp.float32) * inv
    ).astype(x.dtype)
    return x * scale + bias


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    # torch nn.GELU default is the exact erf formulation
    return jax.nn.gelu(x, approximate=False)


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """Matches torch F.normalize(p=2): x / max(||x||, eps)."""
    n = jnp.linalg.norm(x.astype(jnp.float32), axis=axis, keepdims=True)
    return (x.astype(jnp.float32) / jnp.maximum(n, eps)).astype(x.dtype)


def stack_params(params_list) -> Params:
    """Stack a list of identically-structured param trees along a new leading
    axis — the layout used to scan/index transformer layers under
    ``lax.scan``/``lax.while_loop`` without Python-level layer lists."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, 0), *params_list)


def index_params(p: Params, i) -> Params:
    """Select layer ``i`` from stacked params (dynamic index OK under jit)."""
    return jax.tree_util.tree_map(lambda x: jax.lax.dynamic_index_in_dim(x, i, 0, keepdims=False), p)
