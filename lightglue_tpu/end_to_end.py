"""Single-program extract->match pipeline.

BASELINE.json's north star: extractors re-implemented as JAX forward passes
so extract->match runs as ONE jit-compiled program — one dispatch per image
pair, no host round-trip between extraction and matching (the reference
crosses Python between the two models, utils.py:150-165).

Works with the JAX-native extractors (SuperPoint / ALIKED / DISK). Keypoints
stay in the preprocessed-image frame inside the program; coordinates are
rescaled to original pixels on output exactly like Extractor.extract
(utils.py:145-146).

Note on normalization parity: the matcher normalizes keypoints by the
(preprocessed) image size here, vs the original size in the two-step path.
Both describe the same relative geometry; values agree up to the sub-pixel
+-0.5 resampling offset.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import numpy as np

from . import nn
from .models import lightglue as lg
from .models.superpoint import Features


class E2EOutput(NamedTuple):
    feats0: Features
    feats1: Features
    matches: lg.MatchOutput


def make_end_to_end(
    extractor_forward: Callable,
    extractor_params: nn.Params,
    extractor_conf,
    matcher_params: nn.Params,
    matcher_conf,
):
    """Build a jitted (image0, image1, size0, size1) -> E2EOutput program.

    ``extractor_forward(params, conf, image, image_size) -> Features`` is any
    of models/{superpoint,aliked,disk}.forward. Images: (B, H, W, C) float
    [0, 1], pre-padded to the extractor's stride; ``size0/size1``: (B, 2)
    true (w, h) extents before padding.
    """

    @jax.jit
    def run(image0, image1, size0, size1):
        f0 = extractor_forward(extractor_params, extractor_conf, image0, size0)
        f1 = extractor_forward(extractor_params, extractor_conf, image1, size1)
        out = lg.forward(
            matcher_params, matcher_conf,
            kpts0=f0.keypoints, kpts1=f1.keypoints,
            desc0=f0.descriptors, desc1=f1.descriptors,
            size0=size0, size1=size1,
            mask0=f0.valid, mask1=f1.valid,
            **_scale_ori_kw(f0, f1),
        )
        return E2EOutput(f0, f1, out)

    return run


def _scale_ori_kw(f0, f1) -> dict:
    """scales/oris matcher kwargs for SIFT-family features (consumed when
    matcher_conf.add_scale_ori; reference lightglue.py:495-501)."""
    if f0.scales is None:
        return {}
    return dict(
        scales0=f0.scales, oris0=f0.oris, scales1=f1.scales, oris1=f1.oris
    )


def make_sequence_end_to_end(
    extractor_forward: Callable,
    extractor_params: nn.Params,
    extractor_conf,
    matcher_params: nn.Params,
    matcher_conf,
):
    """Extract-once / match-consecutive pipeline: ONE jit program taking
    (images (B, H, W, C), sizes (B, 2)) and returning matches for the B-1
    consecutive pairs (i, i+1).

    This is the production sequence/SLAM/video regime (and the hloc
    pattern the reference ecosystem uses: features extracted once per
    image, then matched across many pairs) — each image is extracted
    exactly once, so per-pair cost is 1x extraction + 1x matching instead
    of the 2x extraction of independent ``match_pair`` calls.
    """

    @jax.jit
    def run(images, sizes):
        f = extractor_forward(extractor_params, extractor_conf, images, sizes)
        sl0 = jax.tree.map(lambda a: a[:-1], f)
        sl1 = jax.tree.map(lambda a: a[1:], f)
        out = lg.forward(
            matcher_params, matcher_conf,
            kpts0=sl0.keypoints, kpts1=sl1.keypoints,
            desc0=sl0.descriptors, desc1=sl1.descriptors,
            size0=sizes[:-1], size1=sizes[1:],
            mask0=sl0.valid, mask1=sl1.valid,
            **_scale_ori_kw(sl0, sl1),
        )
        return E2EOutput(sl0, sl1, out)

    return run


def sequence_window_pairs(n_images: int, window: int):
    """Static pair index arrays (i0, i1) for windowed sequential matching:
    every (i, i+w) with 1 <= w <= window — the hloc ``pairs_from_sequential``
    overlap pattern. Returns two int arrays of length
    ``window*n - window*(window+1)/2``."""
    i0, i1 = [], []
    for w in range(1, window + 1):
        i0.extend(range(n_images - w))
        i1.extend(range(w, n_images))
    return np.asarray(i0, np.int32), np.asarray(i1, np.int32)


def make_windowed_sequence_end_to_end(
    extractor_forward: Callable,
    extractor_params: nn.Params,
    extractor_conf,
    matcher_params: nn.Params,
    matcher_conf,
    window: int = 4,
):
    """Extract-once / match-windowed pipeline: ONE jit program taking
    (images (B, H, W, C), sizes (B, 2)) and matching every pair (i, i+w)
    for w = 1..window.

    This is the standard sequential-mapping regime (hloc's sequential
    pairing with overlap windows, video SfM): each image is extracted
    exactly once and participates in up to 2*window pairs, so extraction
    cost amortizes ~window x per pair while matching stays one batched
    matcher call. Window 1 degenerates to ``make_sequence_end_to_end``.
    """

    @jax.jit
    def run(images, sizes):
        f = extractor_forward(extractor_params, extractor_conf, images, sizes)
        i0, i1 = sequence_window_pairs(images.shape[0], window)
        sl0 = jax.tree.map(lambda a: a[i0], f)
        sl1 = jax.tree.map(lambda a: a[i1], f)
        out = lg.forward(
            matcher_params, matcher_conf,
            kpts0=sl0.keypoints, kpts1=sl1.keypoints,
            desc0=sl0.descriptors, desc1=sl1.descriptors,
            size0=sizes[i0], size1=sizes[i1],
            mask0=sl0.valid, mask1=sl1.valid,
            **_scale_ori_kw(sl0, sl1),
        )
        return E2EOutput(sl0, sl1, out)

    return run
