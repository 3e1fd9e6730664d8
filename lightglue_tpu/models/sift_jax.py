"""TPU-native SIFT: Gaussian scale-space DoG detection + descriptors in JAX.

Replaces OpenCV's C++ SIFT (reference sift.py:127-133) with an XLA
implementation following Lowe (IJCV 2004) and OpenCV's constants:

* scale space: ``num_scales`` layers/octave (OpenCV nOctaveLayers; the
  reference passes its ``num_octaves=4`` conf there, sift.py:132), sigma0
  1.6, initial image doubled (first_octave=-1) with assumed blur 0.5;
  separable Gaussian convolutions on the VPU/MXU.
* detection: 26-neighbor extrema of the DoG pyramid, quadratic sub-pixel
  refinement (one Newton step per iteration, 3 iterations with masked
  convergence), contrast threshold (OpenCV: contrastThreshold/nLayers,
  interpolated response x image scale 255), edge threshold via the 2x2
  Hessian ratio.
* orientation: 36-bin Gaussian-weighted gradient histogram (radius 3*1.5*s),
  circular smoothing, dominant peak + secondary peaks >= 0.8*max (up to
  ``MAX_ORI`` per point).
* descriptor: 4x4 spatial x 8 orientation histograms with trilinear
  interpolation over a rotated 16x16 sample grid, Gaussian weighting,
  0.2 clipping, renormalization to 512-scaled uint8-like floats
  (OpenCV convention), all vectorized over keypoints.

Static shapes: each octave contributes a fixed budget of candidates
(top-k by |DoG|); invalid slots carry validity masks to the end.
"""

from __future__ import annotations

import math
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import SIFTConfig
from ..ops.topk import topk2d

SIGMA0 = 1.6
INIT_BLUR = 0.5
MAX_ORI = 4  # keypoints duplicated for up to this many orientation peaks
ORI_HIST_BINS = 36
ORI_SIG_FCTR = 1.5
ORI_RADIUS_FCTR = 3.0 * ORI_SIG_FCTR
ORI_PEAK_RATIO = 0.8
DESC_WIDTH = 4
DESC_BINS = 8
DESC_SCL_FCTR = 3.0
DESC_MAG_THR = 0.2
INT_DESCR_FCTR = 512.0


def _gaussian_kernel(sigma: float) -> np.ndarray:
    radius = max(1, int(round(sigma * 4)))
    x = np.arange(-radius, radius + 1)
    k = np.exp(-(x**2) / (2 * sigma**2))
    return (k / k.sum()).astype(np.float32)


def _gaussian_blur(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable Gaussian on (H, W) with BORDER_REFLECT_101 padding (numpy
    'reflect' == OpenCV's default; border mismatches compound through the
    s+3 blurs per octave, so this must match exactly).

    Implemented as weighted shifted-slice sums, NOT convs: a 1-channel
    full-res conv wastes 127/128 MXU lanes (the conv formulation put the
    whole pyramid at ~68 ms; the fused VPU shift-sum chain is ~10x
    cheaper). Same taps and weights, fp32 accumulation."""
    if sigma <= 0:
        return img
    k = _gaussian_kernel(sigma)
    r = (len(k) - 1) // 2
    h, w = img.shape

    x = jnp.pad(img, ((r, r), (0, 0)), mode="reflect")
    y = sum(float(k[t]) * x[t : t + h, :] for t in range(2 * r + 1))
    x = jnp.pad(y, ((0, 0), (r, r)), mode="reflect")
    return sum(float(k[t]) * x[:, t : t + w] for t in range(2 * r + 1))


def _upsample2(img: jnp.ndarray) -> jnp.ndarray:
    h, w = img.shape
    return jax.image.resize(img, (2 * h, 2 * w), "bilinear")


def _downsample2(img: jnp.ndarray) -> jnp.ndarray:
    return img[::2, ::2]


def build_pyramid(
    image: jnp.ndarray, conf: SIFTConfig
) -> Tuple[List[List[jnp.ndarray]], List[List[jnp.ndarray]], int]:
    """Returns (gaussians[octave][layer], dogs[octave][layer], n_octaves).

    image: (H, W) float in [0, 1]; internally scaled by 255 to match OpenCV
    magnitudes.
    """
    img = image.astype(jnp.float32) * 255.0
    s = conf.num_scales_per_octave
    k = 2.0 ** (1.0 / s)
    if conf.first_octave == -1:
        img = _upsample2(img)
        base_blur = INIT_BLUR * 2
    else:
        base_blur = INIT_BLUR
    sig_diff = math.sqrt(max(SIGMA0**2 - base_blur**2, 0.01))
    img = _gaussian_blur(img, sig_diff)

    h, w = img.shape
    n_octaves = max(1, int(round(math.log2(min(h, w)))) - 2)  # OpenCV

    # per-layer incremental sigmas (OpenCV sift.cpp buildGaussianPyramid)
    sig = [SIGMA0]
    for i in range(1, s + 3):
        sig_prev = SIGMA0 * (k ** (i - 1))
        sig_total = sig_prev * k
        sig.append(math.sqrt(sig_total**2 - sig_prev**2))

    gaussians, dogs = [], []
    for o in range(n_octaves):
        octave = [img]
        for i in range(1, s + 3):
            octave.append(_gaussian_blur(octave[-1], sig[i]))
        gaussians.append(octave)
        dogs.append([octave[i + 1] - octave[i] for i in range(s + 2)])
        img = _downsample2(octave[s])  # layer s has blur 2*sigma0
    return gaussians, dogs, n_octaves


def _pool3(x: jnp.ndarray, op) -> jnp.ndarray:
    """Separable 3x3x3 neighborhood reduce (edge-padded): three 3-tap
    passes instead of 26 shifted copies — the roll-per-neighbor chain
    materialized the (L, H, W) volume 52 times; this touches it 6 times.
    Edge padding only differs from the roll version at volume borders,
    which the caller masks out (border >= 5, interior layers only)."""
    for axis in range(3):
        widths = [(0, 0)] * 3
        widths[axis] = (1, 1)
        p = jnp.pad(x, widths, mode="edge")
        n = x.shape[axis]
        sl = [slice(None)] * 3

        def take(off):
            s = list(sl)
            s[axis] = slice(off, off + n)
            return p[tuple(s)]

        x = op(op(take(0), take(1)), take(2))
    return x


def _extrema_candidates(dog_stack: jnp.ndarray, n_cand: int, thr: float):
    """dog_stack: (L, H, W). Find 26-neighbor extrema in layers 1..L-2 and
    return top-n_cand by |response|: (layer, y, x) int32 + validity."""
    l, h, w = dog_stack.shape
    center = dog_stack[1:-1]

    # center >= all 26 neighbors  <=>  center == max over the 3x3x3
    # neighborhood (which includes center); same for min. OpenCV's
    # comparisons are >=/<= so the equality form is exact.
    is_max = center == _pool3(dog_stack, jnp.maximum)[1:-1]
    is_min = center == _pool3(dog_stack, jnp.minimum)[1:-1]
    # OpenCV branches on sign: a "maximum" must be positive, a "minimum"
    # negative (sift.cpp findScaleSpaceExtrema)
    strong = jnp.abs(center) > thr
    cand = ((is_max & (center > 0)) | (is_min & (center < 0))) & strong
    # exclude the border (OpenCV SIFT_IMG_BORDER = 5)
    ys = jnp.arange(h)[None, :, None]
    xs = jnp.arange(w)[None, None, :]
    border = 5
    cand &= (ys >= border) & (ys < h - border) & (xs >= border) & (xs < w - border)
    resp = jnp.where(cand, jnp.abs(center), 0.0)
    flat = resp.reshape(-1)
    k_eff = min(n_cand, flat.shape[0])  # small late octaves
    # two-level row-capped top-k (ops/topk.py): the monolithic top_k over
    # the 19M-element doubled octave costs ~40 ms; rows here are single
    # scanlines of one DoG layer, so >cap extrema per row only happens on
    # degenerate (tie-heavy) inputs, where the exactness fallback kicks in
    vals, idx = topk2d(resp.reshape(1, (l - 2) * h, w), k_eff, cap=32)
    vals, idx = vals[0], idx[0]
    if k_eff < n_cand:
        vals = jnp.pad(vals, (0, n_cand - k_eff))
        idx = jnp.pad(idx, (0, n_cand - k_eff))
    li = idx // (h * w) + 1
    rem = idx % (h * w)
    yi = rem // w
    xi = rem % w
    valid = vals > 0
    return li.astype(jnp.int32), yi.astype(jnp.int32), xi.astype(jnp.int32), valid


def _refine(dog_stack: jnp.ndarray, li, yi, xi, valid, conf: SIFTConfig):
    """Quadratic sub-pixel refinement with iterative re-centering — OpenCV
    adjustLocalExtrema semantics: up to 5 Newton steps; converge when every
    |offset| < 0.5; points still moving after 5 steps or stepping outside
    the border are discarded. Returns (layer fp, y fp, x fp, response,
    valid)."""
    l, h, w = dog_stack.shape
    s = conf.num_scales_per_octave
    border = 5  # SIFT_IMG_BORDER

    # gather the 3x3x3 neighborhood as ONE (3,3,3) dynamic_slice per point
    # (vmapped -> a single XLA gather with slice_sizes): slice-gathers pay
    # per ROW while element gathers pay per ELEMENT — 27 scalar takes per
    # point per step were the refinement loop's wall (the even-worse
    # multi-coordinate advanced indexing form measured 800 ms at
    # 2048x1536). Live points always sit in [1, dim-2] on every axis
    # (extrema layers 1..L-2, border >= 5, and the loop re-clips), so the
    # slice never clamps for them and values are identical; dead/padded
    # slots may clamp differently but are masked out.
    def cube():
        def one(li_, yi_, xi_):
            return jax.lax.dynamic_slice(
                dog_stack, (li_ - 1, yi_ - 1, xi_ - 1), (3, 3, 3)
            )

        # (N, 27) in (dl, dy, dx) row-major order, matching at()
        return jax.vmap(one)(li, yi, xi).reshape(li.shape[0], 27)

    cube_v = None  # refreshed whenever li/yi/xi move

    def at(dl, dy, dx):
        return cube_v[:, (dl + 1) * 9 + (dy + 1) * 3 + (dx + 1)]

    def newton_step():
        d = at(0, 0, 0)
        dx1 = (at(0, 0, 1) - at(0, 0, -1)) * 0.5
        dy1 = (at(0, 1, 0) - at(0, -1, 0)) * 0.5
        ds1 = (at(1, 0, 0) - at(-1, 0, 0)) * 0.5
        dxx = at(0, 0, 1) + at(0, 0, -1) - 2 * d
        dyy = at(0, 1, 0) + at(0, -1, 0) - 2 * d
        dss = at(1, 0, 0) + at(-1, 0, 0) - 2 * d
        dxy = (at(0, 1, 1) - at(0, 1, -1) - at(0, -1, 1) + at(0, -1, -1)) * 0.25
        dxs = (at(1, 0, 1) - at(1, 0, -1) - at(-1, 0, 1) + at(-1, 0, -1)) * 0.25
        dys = (at(1, 1, 0) - at(1, -1, 0) - at(-1, 1, 0) + at(-1, -1, 0)) * 0.25
        # closed-form symmetric 3x3 solve (Cramer/adjugate): batched
        # jnp.linalg.det/solve lower to LU on TPU and cost ~160 ms PER
        # Newton step at N=4096 in this graph (measured: the linalg pair
        # alone took sift_jax from ~330 ms to 1.13 s/image); the adjugate
        # is a handful of fused VPU multiplies
        g = jnp.stack([dx1, dy1, ds1], -1)  # (N, 3)
        a00 = dyy * dss - dys * dys
        a01 = dys * dxs - dxy * dss
        a02 = dxy * dys - dxs * dyy
        a11 = dxx * dss - dxs * dxs
        a12 = dxy * dxs - dxx * dys
        a22 = dxx * dyy - dxy * dxy
        det = dxx * a00 + dxy * a01 + dxs * a02
        ok = jnp.abs(det) > 1e-12
        inv_det = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
        sx = a00 * dx1 + a01 * dy1 + a02 * ds1
        sy = a01 * dx1 + a11 * dy1 + a12 * ds1
        ss = a02 * dx1 + a12 * dy1 + a22 * ds1
        off = -jnp.stack([sx, sy, ss], -1) * inv_det[:, None]
        return jnp.where(ok[..., None], off, 0.0), d, g

    converged = jnp.zeros(li.shape, bool)
    alive = valid
    off_final = jnp.zeros((li.shape[0], 3))
    d_final = jnp.zeros(li.shape)
    g_final = jnp.zeros((li.shape[0], 3))
    for _ in range(5):  # SIFT_MAX_INTERP_STEPS
        cube_v = cube()
        off, d, g = newton_step()
        done_now = jnp.all(jnp.abs(off) < 0.5, axis=-1)
        newly = done_now & ~converged
        off_final = jnp.where(newly[:, None], off, off_final)
        d_final = jnp.where(newly, d, d_final)
        g_final = jnp.where(newly[:, None], g, g_final)
        converged |= done_now
        moving = alive & ~converged
        step = jnp.round(off).astype(jnp.int32)
        xi_n = xi + jnp.where(moving, step[:, 0], 0)
        yi_n = yi + jnp.where(moving, step[:, 1], 0)
        li_n = li + jnp.where(moving, step[:, 2], 0)
        out = (
            (li_n < 1) | (li_n > l - 2)
            | (xi_n < border) | (xi_n >= w - border)
            | (yi_n < border) | (yi_n >= h - border)
        )
        alive &= ~(out & moving)
        xi = jnp.clip(xi_n, 1, w - 2)
        yi = jnp.clip(yi_n, 1, h - 2)
        li = jnp.clip(li_n, 1, l - 2)

    off = off_final
    contr = d_final + 0.5 * jnp.sum(g_final * off, axis=-1)
    valid = alive & converged
    valid &= jnp.abs(contr) * s >= conf.detection_threshold * 255.0
    # edge response (2x2 spatial Hessian) at the final positions
    cube_v = cube()
    dxx = at(0, 0, 1) + at(0, 0, -1) - 2 * d
    dyy = at(0, 1, 0) + at(0, -1, 0) - 2 * d
    dxy = (at(0, 1, 1) - at(0, 1, -1) - at(0, -1, 1) + at(0, -1, -1)) * 0.25
    tr = dxx + dyy
    det2 = dxx * dyy - dxy * dxy
    e = conf.edge_threshold
    valid &= (det2 > 0) & (tr * tr * e < (e + 1) ** 2 * det2)
    fx = xi.astype(jnp.float32) + off[:, 0]
    fy = yi.astype(jnp.float32) + off[:, 1]
    fl = li.astype(jnp.float32) + off[:, 2]
    return fl, fy, fx, jnp.abs(contr), valid


def _gradients(g: jnp.ndarray):
    """Central-difference gradient components (dx, dy) of (H, W).

    Magnitude/orientation are NOT computed here: the dense sqrt + arctan2
    over every pyramid pixel (~25M at 1024x768 with the doubled first
    octave) is deferred to _mag_ori on the GATHERED samples only
    (~1.5M) — gathers commute with elementwise ops, so results are
    bit-identical while the VPU transcendental work drops ~20x."""
    dx = jnp.zeros_like(g).at[:, 1:-1].set((g[:, 2:] - g[:, :-2]) * 0.5)
    dy = jnp.zeros_like(g).at[1:-1, :].set((g[2:, :] - g[:-2, :]) * 0.5)
    return dx, dy


def _mag_ori(dx: jnp.ndarray, dy: jnp.ndarray):
    """Gradient magnitude / orientation [-pi, pi] from components.
    arctan2(0, 0) == 0, so zeroed borders keep mag = ori = 0 exactly as
    the dense formulation did."""
    return jnp.sqrt(dx * dx + dy * dy), jnp.arctan2(dy, dx)


def _orientation_hist(
    dxs: jnp.ndarray, dys: jnp.ndarray, li, fy, fx, sigma_rel,
    max_radius: int = 16,
):
    """36-bin orientation histogram per keypoint; returns (N, 36) smoothed.

    dxs/dys: (L, H, W) stacked per-layer gradient components; ``li``
    selects each keypoint's layer. Samples a fixed (2R+1)^2 window (masked
    by per-point radius), OpenCV calcOrientationHist semantics."""
    l, h, w = dxs.shape
    n = fy.shape[0]
    r = max_radius
    dyy = jnp.repeat(jnp.arange(-r, r + 1), 2 * r + 1)[None, :]
    dxx = jnp.tile(jnp.arange(-r, r + 1), 2 * r + 1)[None, :]
    cy = jnp.round(fy).astype(jnp.int32)[:, None]
    cx = jnp.round(fx).astype(jnp.int32)[:, None]
    yy = cy + dyy
    xx = cx + dxx
    inside = (yy >= 1) & (yy < h - 1) & (xx >= 1) & (xx < w - 1)
    # the window is CONTIGUOUS in x: gather (2r+1) row segments per point
    # via vmapped dynamic_slice on r-padded maps (one XLA gather with
    # slice_sizes) instead of (2r+1)^2 scalar gathers — row-gather
    # throughput on TPU is ~2 orders of magnitude higher than scalar
    # gathers. Out-of-range samples land in the zero pad and are masked
    # by `inside` anyway.
    side = 2 * r + 1
    pad = jnp.pad(
        jnp.stack([dxs, dys]), ((0, 0), (0, 0), (r, r), (r, r))
    )  # (2, L, H+2r, W+2r)

    def rows(li_, cy_, cx_):
        # (2, side, side) window, corner at (cy-r, cx-r) in padded coords
        return jax.lax.dynamic_slice(
            pad, (0, li_, cy_, cx_), (2, 1, side, side)
        )[:, 0]

    win = jax.vmap(rows)(li, cy[:, 0], cx[:, 0])  # (N, 2, side, side)
    m, o = _mag_ori(
        win[:, 0].reshape(n, side * side), win[:, 1].reshape(n, side * side)
    )
    radius = jnp.round(ORI_RADIUS_FCTR * sigma_rel).astype(jnp.int32)[:, None]
    sig = (ORI_SIG_FCTR * sigma_rel)[:, None]
    dist2 = (dyy**2 + dxx**2).astype(jnp.float32)
    wgt = jnp.exp(-dist2 / (2 * sig**2))
    keep = inside & (jnp.abs(dyy) <= radius) & (jnp.abs(dxx) <= radius)
    m = jnp.where(keep, m * wgt, 0.0)
    bins = jnp.round(o * (ORI_HIST_BINS / (2 * jnp.pi))).astype(jnp.int32)
    bins = jnp.mod(bins, ORI_HIST_BINS)
    # per-bin masked reduction instead of a scatter-add: 36 elementwise
    # mask+sum passes over the (N, window) tile are VPU-cheap, while a
    # multi-million-index scatter serializes on TPU (measured: the scatter
    # formulations put sift_jax at 2+ SECONDS/image)
    hist = jnp.stack(
        [jnp.sum(jnp.where(bins == b_, m, 0.0), axis=1)
         for b_ in range(ORI_HIST_BINS)],
        axis=1,
    )
    # circular smoothing [1, 4, 6, 4, 1] / 16 (OpenCV)
    def smooth(hh):
        prev2 = jnp.roll(hh, 2, -1)
        prev1 = jnp.roll(hh, 1, -1)
        next1 = jnp.roll(hh, -1, -1)
        next2 = jnp.roll(hh, -2, -1)
        return (prev2 + next2) * (1 / 16) + (prev1 + next1) * (4 / 16) + hh * (6 / 16)

    return smooth(smooth(hist))


def _hist_peaks(hist: jnp.ndarray):
    """Dominant + secondary orientation peaks with parabolic interpolation.
    Returns (N, MAX_ORI) angles radians + validity (N, MAX_ORI)."""
    nb = ORI_HIST_BINS
    prev = jnp.roll(hist, 1, -1)
    nxt = jnp.roll(hist, -1, -1)
    is_peak = (hist > prev) & (hist > nxt)
    mx = jnp.max(hist, axis=-1, keepdims=True)
    order = jnp.where(is_peak, hist, -jnp.inf)
    vals, idx = jax.lax.top_k(order, MAX_ORI)
    ok = vals >= ORI_PEAK_RATIO * mx
    ok &= jnp.isfinite(vals)
    l = jnp.take_along_axis(prev, idx, -1)
    r = jnp.take_along_axis(nxt, idx, -1)
    c = vals
    denom = l - 2 * c + r
    shift = jnp.where(jnp.abs(denom) > 1e-12, 0.5 * (l - r) / denom, 0.0)
    bin_f = (idx.astype(jnp.float32) + shift) % nb
    angle = bin_f * (2 * jnp.pi / nb)
    return angle, ok


def _descriptors(
    dxs: jnp.ndarray, dys: jnp.ndarray, li, fy, fx, sigma_rel, angles
) -> jnp.ndarray:
    """4x4x8 SIFT descriptors at given positions/orientations. Vectorized:
    16x16 rotated sample grid per keypoint, trilinear accumulation.
    dxs/dys: (L, H, W) stacked per-layer gradient components with ``li``
    selecting each keypoint's layer. Returns (N, 128) in OpenCV's 512-scaled
    convention (pre-normalization for RootSIFT happens downstream)."""
    l, h, w = dxs.shape
    d, nb = DESC_WIDTH, DESC_BINS
    hist_width = DESC_SCL_FCTR * sigma_rel  # (N,)
    n = fy.shape[0]
    grid = jnp.arange(-8, 8) + 0.5  # 16 samples per axis in hist-width units
    gy, gx = jnp.meshgrid(grid / 4.0 * d / 4.0, grid / 4.0 * d / 4.0)
    # sample offsets in rotated frame, in units of hist_width
    su = (jnp.arange(-8, 8) + 0.5) / 4.0  # [-1.875 .. 1.875] bins units
    uu, vv = jnp.meshgrid(su, su)  # (16, 16) cols=u(x), rows=v(y)
    u = uu.reshape(-1)
    v = vv.reshape(-1)  # bin units, center 0

    cos = jnp.cos(angles)[:, None]
    sin = jnp.sin(angles)[:, None]
    # rotate sample offsets into image frame, scale by hist_width
    dx_img = (u[None] * cos - v[None] * sin) * hist_width[:, None]
    dy_img = (u[None] * sin + v[None] * cos) * hist_width[:, None]
    sx = fx[:, None] + dx_img
    sy = fy[:, None] + dy_img
    inside = (sx >= 1) & (sx < w - 2) & (sy >= 1) & (sy < h - 2)
    xi = jnp.clip(jnp.round(sx), 1, w - 2).astype(jnp.int32)
    yi = jnp.clip(jnp.round(sy), 1, h - 2).astype(jnp.int32)
    idx = (li[:, None] * h + yi) * w + xi
    # one 2-wide row gather for (dx, dy) instead of two scalar takes —
    # gather cost is per element/row, and both maps use identical indices;
    # mag/ori are computed on the gathered samples only (see _gradients)
    mo = jnp.stack([dxs, dys], -1).reshape(l * h * w, 2)
    mov = jnp.take(mo, idx.reshape(-1), axis=0).reshape(*idx.shape, 2)
    m, o = _mag_ori(mov[..., 0], mov[..., 1])
    # gaussian weight over the window
    wgt = jnp.exp(-(u[None] ** 2 + v[None] ** 2) / (0.5 * d) ** 2 / 2)
    m = jnp.where(inside, m * wgt, 0.0)
    # rotated orientation relative to keypoint angle. NOTE the sign: our
    # gradient orientations are y-down (= negated OpenCV y-up angles), so
    # the relative angle is (angle - o) to spin bins the same direction as
    # OpenCV's (ori_cv - angle_cv).
    obin = (angles[:, None] - o) * (nb / (2 * jnp.pi))
    obin = jnp.mod(obin, nb)
    # spatial bins: u, v in [-d/2, d/2] -> bin coords [0, d)
    ub = u[None] + d / 2 - 0.5
    vb = v[None] + d / 2 - 0.5
    ub = jnp.broadcast_to(ub, m.shape)
    vb = jnp.broadcast_to(vb, m.shape)

    # trilinear binning as a separable triangular-weight contraction
    # instead of 8 scatter-add passes (TPU scatters serialize; this was
    # ~2 s/image). For kept cell cu in [0, d): the original assigns
    # weight fu to cell u0+1 and (1-fu) to cell u0, i.e. exactly
    # tri(ub, cu) = relu(1 - |ub - cu|); cells outside [0, d) were
    # accumulated into padding rows and discarded, which tri() drops for
    # free. The orientation axis wraps circularly. Bit-for-bit the same
    # summands as the scatter version, summed on the MXU.
    cu = jnp.arange(d, dtype=ub.dtype)
    au = jnp.maximum(0.0, 1.0 - jnp.abs(ub[..., None] - cu))  # (n, S, d)
    av = jnp.maximum(0.0, 1.0 - jnp.abs(vb[..., None] - cu))  # (n, S, d)
    co = jnp.arange(nb, dtype=obin.dtype)
    od = jnp.abs(obin[..., None] - co)
    ao = jnp.maximum(0.0, 1.0 - jnp.minimum(od, nb - od))     # (n, S, nb)
    vo = (av[..., :, None] * ao[..., None, :]).reshape(
        n, m.shape[1], d * nb
    )
    desc = jnp.einsum(
        "nsu,nsk->nuk", m[..., None] * au, vo,
        preferred_element_type=jnp.float32,
    )  # (n, u, v*o)
    # original layout is (v, u, o): transpose u <-> v
    desc = desc.reshape(n, d, d, nb).transpose(0, 2, 1, 3)
    desc = desc.reshape(n, d * d * nb)
    # clip + renormalize (OpenCV)
    norm = jnp.linalg.norm(desc, axis=-1, keepdims=True)
    desc = jnp.minimum(desc, DESC_MAG_THR * jnp.maximum(norm, 1e-12))
    norm = jnp.linalg.norm(desc, axis=-1, keepdims=True)
    desc = desc / jnp.maximum(norm, 1e-12) * INT_DESCR_FCTR
    return jnp.minimum(desc, 255.0)


def extract_single(
    image: jnp.ndarray, conf: SIFTConfig
):
    """Full single-image TPU SIFT. image: (H, W) float [0, 1].

    Returns dict of static-size arrays: keypoints (K, 2) at input-image
    scale, scales (K), oris (K), keypoint_scores (K), descriptors (K, 128),
    valid (K).
    """
    s = conf.num_scales_per_octave
    k_total = conf.max_num_keypoints
    gaussians, dogs, n_oct = build_pyramid(image, conf)
    first = conf.first_octave
    # OpenCV floors the prefilter threshold (sift.cpp: cvFloor(0.5 * ... *
    # 255)); without the floor, weak-but-kept extrema in (floor, exact] are
    # wrongly rejected
    thr_pre = float(math.floor(0.5 * conf.detection_threshold / s * 255.0))

    per_octave = []
    for o in range(n_oct):
        # generous per-octave candidate pool: refinement/contrast/edge tests
        # reject most raw extrema, and a too-small pool loses true keypoints
        # near the cut. The (doubled) first octave has by far the most raw
        # extrema; later octaves shrink 4x each.
        n_cand = max(256, (4 * k_total) >> o)
        # materialize once: the DoG stack feeds both extrema detection and
        # the 5-step refinement gathers, and XLA otherwise duplicates the
        # producing blur/subtract chain into each consumer (see
        # aliked.forward for the measured pattern)
        dog_stack = jax.lax.optimization_barrier(jnp.stack(dogs[o]))
        # every stage boundary is barriered: XLA otherwise re-derives the
        # producing chain per consumer — _refine alone has ~135 gathers
        # consuming these indices, and re-running the 26-neighbor NMS +
        # full-map top_k for each put sift_jax at 1.1 s/image (measured;
        # barriers here take the composed pipeline to the sum of its
        # stage costs)
        li, yi, xi, valid = jax.lax.optimization_barrier(
            _extrema_candidates(dog_stack, n_cand, thr_pre)
        )
        fl, fy, fx, resp, valid = jax.lax.optimization_barrier(
            _refine(dog_stack, li, yi, xi, valid, conf)
        )
        if n_cand > k_total:
            # compact survivors: the global top-k_total (by response) is a
            # subset of each octave's top-k_total candidates, so computing
            # orientations/descriptors for more than k_total per octave is
            # dead work (octave 0 pools 4x that many raw extrema)
            _, keep = jax.lax.top_k(jnp.where(valid, resp, -1.0), k_total)
            li, fl, fy, fx, resp, valid = jax.lax.optimization_barrier(
                tuple(a[keep] for a in (li, fl, fy, fx, resp, valid))
            )
            n_cand = k_total
        sigma_rel = SIGMA0 * (2.0 ** (fl / s))  # blur in octave units
        # per-keypoint gaussian layer nearest to fl; gradients precomputed
        # for the whole stacked octave and gathered with a 3D index
        lg_idx = jnp.clip(jnp.round(fl).astype(jnp.int32), 0, s + 2)
        gauss_layers = jnp.stack(gaussians[o])  # (s+3, H, W)
        dxs, dys = jax.lax.optimization_barrier(
            jax.vmap(_gradients)(gauss_layers)
        )

        hist = _orientation_hist(dxs, dys, lg_idx, fy, fx, sigma_rel)
        angles, aok = jax.lax.optimization_barrier(_hist_peaks(hist))

        # fold the orientation axis into the keypoint axis, then COMPACT
        # the (keypoint, orientation) instances to k_total before the
        # descriptor stage: the final output keeps at most k_total
        # instances globally, so per-octave descriptor work beyond k_total
        # is dead — and most instances are invalid anyway (secondary
        # orientation peaks are rare). Cuts descriptor gathers ~MAX_ORI x.
        rep = lambda v: jnp.repeat(v, MAX_ORI, axis=0)
        inst = dict(
            li=rep(lg_idx), fy=rep(fy), fx=rep(fx), sig=rep(sigma_rel),
            ang=angles.reshape(-1), resp=rep(resp),
            valid=(valid[:, None] & aok).reshape(-1),
        )
        n_inst = min(n_cand * MAX_ORI, k_total)
        if inst["resp"].shape[0] > n_inst:
            _, keep_i = jax.lax.top_k(
                jnp.where(inst["valid"], inst["resp"], -1.0), n_inst
            )
            inst = jax.lax.optimization_barrier(
                {key: a[keep_i] for key, a in inst.items()}
            )
        descs = _descriptors(
            dxs, dys, inst["li"], inst["fy"], inst["fx"], inst["sig"],
            inst["ang"],
        )

        octave_scale = 2.0 ** (o + first)
        per_octave.append(
            dict(
                x=inst["fx"] * octave_scale,
                y=inst["fy"] * octave_scale,
                # OpenCV kpt.size = sigma * 2
                size=inst["sig"] * octave_scale * 2.0,
                resp=inst["resp"],
                ori=inst["ang"],
                valid=inst["valid"],
                desc=descs,
            )
        )

    allc = {
        key: jnp.concatenate([p[key] for p in per_octave])
        for key in per_octave[0]
    }
    score = jnp.where(allc["valid"], allc["resp"], -1.0)
    top, sel = jax.lax.top_k(score, k_total)
    out_valid = top > 0
    kpts = jnp.stack([allc["x"][sel], allc["y"][sel]], -1)
    return {
        "keypoints": kpts,
        "scales": allc["size"][sel],
        "oris": jnp.mod(allc["ori"][sel], 2 * jnp.pi),  # [0, 2pi) like cv2
        "keypoint_scores": jnp.where(out_valid, top, 0.0),
        "descriptors": jnp.where(out_valid[:, None], allc["desc"][sel], 0.0),
        "valid": out_valid,
    }


def extract_batch(images: jnp.ndarray, conf: SIFTConfig):
    """Batched TPU SIFT over (B, H, W) images: ``lax.map`` of
    ``extract_single`` — one device program extracts the full batch (the
    reference's SIFT loops per image on the host, sift.py:205-212).

    ``lax.map`` rather than ``vmap``: each image's work is already
    wide enough to fill the chip, and under vmap the exactness ``lax.cond``
    in ops/topk.py::topk2d must bypass to the monolithic ``top_k`` over the
    ~19M-element doubled octave (~40 ms/image, see _extrema_candidates) —
    sequential per-image iterations keep every image on the fast
    single-image graph while still compiling once."""
    if images.shape[0] == 1:  # no loop machinery for the common B=1
        return jax.tree.map(
            lambda a: a[None], extract_single(images[0], conf)
        )
    return jax.lax.map(lambda im: extract_single(im, conf), images)


def rootsift(desc: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """RootSIFT on device: L1-normalize, sqrt, L2-normalize (reference
    sift_to_rootsift, sift.py:53-56 — there in numpy/torch on host)."""
    x = desc / jnp.maximum(
        jnp.sum(jnp.abs(desc), axis=-1, keepdims=True), eps
    )
    x = jnp.sqrt(jnp.maximum(x, 0.0))
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


def forward(params, conf: SIFTConfig, images: jnp.ndarray, sizes=None):
    """Extractor-forward surface matching models/{superpoint,...}.forward so
    SIFT plugs into the single-program end-to-end pipelines
    (end_to_end.py). ``params`` is unused (SIFT is handcrafted — kept for
    signature uniformity). images: (B, H, W) gray or (B, H, W, 1) float
    [0, 1]. Returns Features with scales/oris populated and RootSIFT
    descriptors (conf.rootsift)."""
    from .superpoint import Features

    if images.ndim == 4:
        if images.shape[-1] == 3:  # reference rgb_to_grayscale weights
            images = images @ jnp.asarray([0.299, 0.587, 0.114], images.dtype)
        else:
            images = images[..., 0]
    out = extract_batch(images, conf)
    desc = out["descriptors"]
    if conf.rootsift:
        desc = jnp.where(
            out["valid"][..., None], rootsift(desc), 0.0
        )
    return Features(
        keypoints=out["keypoints"],
        keypoint_scores=out["keypoint_scores"],
        descriptors=desc,
        valid=out["valid"],
        image_size=sizes,
        scales=out["scales"],
        oris=out["oris"],
    )
