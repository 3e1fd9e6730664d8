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
    s+3 blurs per octave, so this must match exactly)."""
    if sigma <= 0:
        return img
    k = jnp.asarray(_gaussian_kernel(sigma))
    r = (len(k) - 1) // 2
    x = jnp.pad(img, ((r, r), (0, 0)), mode="reflect")
    x = jax.lax.conv_general_dilated(
        x[None, :, :, None], k[:, None, None, None], (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[0, :, :, 0]
    x = jnp.pad(x, ((0, 0), (r, r)), mode="reflect")
    x = jax.lax.conv_general_dilated(
        x[None, :, :, None], k[None, :, None, None], (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[0, :, :, 0]
    return x


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


def _extrema_candidates(dog_stack: jnp.ndarray, n_cand: int, thr: float):
    """dog_stack: (L, H, W). Find 26-neighbor extrema in layers 1..L-2 and
    return top-n_cand by |response|: (layer, y, x) int32 + validity."""
    l, h, w = dog_stack.shape
    center = dog_stack[1:-1]

    def shift(arr, dl, dy, dx):
        return jnp.roll(arr, (dl, dy, dx), axis=(0, 1, 2))[1:-1]

    is_max = jnp.ones_like(center, bool)
    is_min = jnp.ones_like(center, bool)
    for dl in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dl == 0 and dy == 0 and dx == 0:
                    continue
                nb = shift(dog_stack, -dl, -dy, -dx)
                is_max &= center >= nb
                is_min &= center <= nb
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
    vals, idx = jax.lax.top_k(flat, k_eff)
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

    def at(dl, dy, dx):
        return dog_stack[
            jnp.clip(li + dl, 0, l - 1),
            jnp.clip(yi + dy, 0, h - 1),
            jnp.clip(xi + dx, 0, w - 1),
        ]

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
        hess = jnp.stack(
            [
                jnp.stack([dxx, dxy, dxs], -1),
                jnp.stack([dxy, dyy, dys], -1),
                jnp.stack([dxs, dys, dss], -1),
            ],
            -2,
        )  # (N, 3, 3)
        g = jnp.stack([dx1, dy1, ds1], -1)  # (N, 3)
        det = jnp.linalg.det(hess)
        ok = jnp.abs(det) > 1e-12
        hess_safe = jnp.where(ok[..., None, None], hess, jnp.eye(3)[None])
        off = -jnp.linalg.solve(hess_safe, g[..., None])[..., 0]
        return jnp.where(ok[..., None], off, 0.0), d, g

    converged = jnp.zeros(li.shape, bool)
    alive = valid
    off_final = jnp.zeros((li.shape[0], 3))
    d_final = jnp.zeros(li.shape)
    g_final = jnp.zeros((li.shape[0], 3))
    for _ in range(5):  # SIFT_MAX_INTERP_STEPS
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
    # edge response (2x2 spatial Hessian)
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
    """Central-difference gradient magnitude/orientation of (H, W)."""
    dx = jnp.zeros_like(g).at[:, 1:-1].set((g[:, 2:] - g[:, :-2]) * 0.5)
    dy = jnp.zeros_like(g).at[1:-1, :].set((g[2:, :] - g[:-2, :]) * 0.5)
    mag = jnp.sqrt(dx * dx + dy * dy)
    ori = jnp.arctan2(dy, dx)  # [-pi, pi]
    return mag, ori


def _orientation_hist(
    mags: jnp.ndarray, oris: jnp.ndarray, li, fy, fx, sigma_rel,
    max_radius: int = 16,
):
    """36-bin orientation histogram per keypoint; returns (N, 36) smoothed.

    mags/oris: (L, H, W) stacked per-layer gradients; ``li`` selects each
    keypoint's layer. Samples a fixed (2R+1)^2 window (masked by per-point
    radius), OpenCV calcOrientationHist semantics."""
    l, h, w = mags.shape
    n = fy.shape[0]
    r = max_radius
    dyy = jnp.repeat(jnp.arange(-r, r + 1), 2 * r + 1)[None, :]
    dxx = jnp.tile(jnp.arange(-r, r + 1), 2 * r + 1)[None, :]
    cy = jnp.round(fy).astype(jnp.int32)[:, None]
    cx = jnp.round(fx).astype(jnp.int32)[:, None]
    yy = cy + dyy
    xx = cx + dxx
    inside = (yy >= 1) & (yy < h - 1) & (xx >= 1) & (xx < w - 1)
    idx = (li[:, None] * h + jnp.clip(yy, 0, h - 1)) * w + jnp.clip(xx, 0, w - 1)
    m = jnp.take(mags.reshape(-1), idx)
    o = jnp.take(oris.reshape(-1), idx)
    radius = jnp.round(ORI_RADIUS_FCTR * sigma_rel).astype(jnp.int32)[:, None]
    sig = (ORI_SIG_FCTR * sigma_rel)[:, None]
    dist2 = (dyy**2 + dxx**2).astype(jnp.float32)
    wgt = jnp.exp(-dist2 / (2 * sig**2))
    keep = inside & (jnp.abs(dyy) <= radius) & (jnp.abs(dxx) <= radius)
    m = jnp.where(keep, m * wgt, 0.0)
    bins = jnp.round(o * (ORI_HIST_BINS / (2 * jnp.pi))).astype(jnp.int32)
    bins = jnp.mod(bins, ORI_HIST_BINS)
    # one flat scatter-add over (kpt, bin)
    kpt_ids = jnp.broadcast_to(jnp.arange(n)[:, None], bins.shape)
    flat = jnp.zeros((n * ORI_HIST_BINS,)).at[
        (kpt_ids * ORI_HIST_BINS + bins).reshape(-1)
    ].add(m.reshape(-1))
    hist = flat.reshape(n, ORI_HIST_BINS)
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
    mags: jnp.ndarray, oris_map: jnp.ndarray, li, fy, fx, sigma_rel, angles
) -> jnp.ndarray:
    """4x4x8 SIFT descriptors at given positions/orientations. Vectorized:
    16x16 rotated sample grid per keypoint, trilinear accumulation.
    mags/oris_map: (L, H, W) stacked per-layer gradients with ``li``
    selecting each keypoint's layer. Returns (N, 128) in OpenCV's 512-scaled
    convention (pre-normalization for RootSIFT happens downstream)."""
    l, h, w = mags.shape
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
    m = jnp.take(mags.reshape(-1), idx)
    o = jnp.take(oris_map.reshape(-1), idx)
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

    u0 = jnp.floor(ub)
    v0 = jnp.floor(vb)
    o0 = jnp.floor(obin)
    fu = ub - u0
    fv = vb - v0
    fo = obin - o0

    cells = (d + 2) * (d + 2) * nb
    flat = jnp.zeros((n * cells,))
    kpt_ids = jnp.broadcast_to(jnp.arange(n)[:, None], m.shape)
    for du in (0, 1):
        for dv in (0, 1):
            for do in (0, 1):
                wu = fu if du else (1 - fu)
                wv = fv if dv else (1 - fv)
                wo = fo if do else (1 - fo)
                weight = m * wu * wv * wo
                ui = jnp.clip(u0 + du + 1, 0, d + 1).astype(jnp.int32)
                vi = jnp.clip(v0 + dv + 1, 0, d + 1).astype(jnp.int32)
                oi = jnp.mod(o0 + do, nb).astype(jnp.int32)
                flat_idx = (
                    kpt_ids * cells + (vi * (d + 2) + ui) * nb + oi
                ).reshape(-1)
                flat = flat.at[flat_idx].add(weight.reshape(-1))
    desc = flat.reshape(n, d + 2, d + 2, nb)
    desc = desc[:, 1 : d + 1, 1 : d + 1, :].reshape(n, d * d * nb)
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
        dog_stack = jnp.stack(dogs[o])
        li, yi, xi, valid = _extrema_candidates(dog_stack, n_cand, thr_pre)
        fl, fy, fx, resp, valid = _refine(dog_stack, li, yi, xi, valid, conf)
        sigma_rel = SIGMA0 * (2.0 ** (fl / s))  # blur in octave units
        # per-keypoint gaussian layer nearest to fl; gradients precomputed
        # for the whole stacked octave and gathered with a 3D index
        lg_idx = jnp.clip(jnp.round(fl).astype(jnp.int32), 0, s + 2)
        gauss_layers = jnp.stack(gaussians[o])  # (s+3, H, W)
        mags, oris_map = jax.vmap(_gradients)(gauss_layers)

        hist = _orientation_hist(mags, oris_map, lg_idx, fy, fx, sigma_rel)
        angles, aok = _hist_peaks(hist)

        # fold the orientation axis into the keypoint axis: one descriptor
        # call per octave instead of MAX_ORI (halves trace/compile size)
        rep = lambda v: jnp.repeat(v, MAX_ORI, axis=0)
        descs = _descriptors(
            mags, oris_map, rep(lg_idx), rep(fy), rep(fx), rep(sigma_rel),
            angles.reshape(-1),
        ).reshape(n_cand, MAX_ORI, 128)

        octave_scale = 2.0 ** (o + first)
        kx = fx * octave_scale
        ky = fy * octave_scale
        ksize = sigma_rel * octave_scale * 2.0  # OpenCV kpt.size = sigma*2
        per_octave.append(
            dict(
                x=jnp.tile(kx[:, None], (1, MAX_ORI)).reshape(-1),
                y=jnp.tile(ky[:, None], (1, MAX_ORI)).reshape(-1),
                size=jnp.tile(ksize[:, None], (1, MAX_ORI)).reshape(-1),
                resp=jnp.tile(resp[:, None], (1, MAX_ORI)).reshape(-1),
                ori=angles.reshape(-1),
                valid=(valid[:, None] & aok).reshape(-1),
                desc=descs.reshape(-1, 128),
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
