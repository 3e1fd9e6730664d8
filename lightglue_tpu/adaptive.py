"""Two-phase adaptive matching with host-side width-pruning compaction.

The reference physically removes pruned points mid-network (index_select,
lightglue.py:551-566) so later layers run on fewer points. Static shapes
under jit can't shrink, so the in-device adaptive path (models/lightglue.py)
only masks pruned points — correct, but the N^2 attention cost stays.

This module harvests the FLOP savings the TPU way: run the first
``n_prefix`` layers in one jitted program, read back the survivor counts
(one small sync), compact survivors into the next smaller static bucket on
the host (C++-assisted gather), and run the remaining layers + assignment in
a second jitted program at the smaller size. Indices are scattered back to
the original numbering exactly like the reference (lightglue.py:606-614).

With trained weights pruning typically removes 30-60% of points by layer
2-3; attention cost scales with N^2, so the suffix runs ~2-4x faster.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import nn
from .configs import LightGlueConfig
from .models import lightglue as lg
from .parallel.batching import DEFAULT_BUCKETS, next_bucket

_prefix_jit = jax.jit(
    lg.forward_prefix, static_argnames=("conf", "n_prefix")
)
_suffix_jit = jax.jit(lg.forward_suffix, static_argnames=("conf",))


def _compact_side(desc, kn, prune, act, bucket):
    """Gather surviving rows into a (B, bucket, ...) block. Returns
    (desc_c, kn_c, prune_c, act_c, ind (B, bucket) original indices)."""
    b = desc.shape[0]
    ind = np.zeros((b, bucket), np.int64)
    act_c = np.zeros((b, bucket), bool)
    for i in range(b):
        idx = np.nonzero(act[i])[0][:bucket]
        ind[i, : len(idx)] = idx
        act_c[i, : len(idx)] = True
    take = lambda arr: np.take_along_axis(
        arr, ind.reshape(b, bucket, *([1] * (arr.ndim - 2))), axis=1
    ) if arr.ndim > 2 else np.take_along_axis(arr, ind, axis=1)
    return take(desc), take(kn), take(prune), act_c, ind


def match_adaptive_compact(
    params: nn.Params,
    conf: LightGlueConfig,
    n_prefix: int = 3,
    buckets: Sequence[int] = DEFAULT_BUCKETS,
    **inputs,
) -> lg.MatchOutput:
    """Adaptive matching with mid-network compaction.

    ``inputs``: kpts0/kpts1/desc0/desc1 (+ optional size/mask/scales/oris)
    as for models.lightglue.forward. Returns a MatchOutput in the ORIGINAL
    keypoint numbering (host numpy arrays wrapped as jnp for uniformity).
    """
    if not (conf.width_confidence > 0):
        raise ValueError("compaction requires width_confidence > 0")
    st = _prefix_jit(params, conf, n_prefix, **inputs)

    b, m = st.act0.shape
    n = st.act1.shape[1]
    act0 = np.asarray(st.act0)
    act1 = np.asarray(st.act1)
    stopped = bool(st.stop)
    c0 = int(act0.sum(1).max()) if b else 0
    c1 = int(act1.sum(1).max()) if b else 0
    bucket0 = next_bucket(max(c0, 1), buckets)
    bucket1 = next_bucket(max(c1, 1), buckets)

    if stopped or (bucket0 >= m and bucket1 >= n):
        # nothing to harvest: finish on the original state
        return _suffix_jit(params, conf, st)

    bucket0 = min(bucket0, m)
    bucket1 = min(bucket1, n)
    d0, kn0, p0, a0c, ind0 = _compact_side(
        np.asarray(st.desc0), np.asarray(st.kn0), np.asarray(st.prune0),
        act0, bucket0,
    )
    d1, kn1, p1, a1c, ind1 = _compact_side(
        np.asarray(st.desc1), np.asarray(st.kn1), np.asarray(st.prune1),
        act1, bucket1,
    )
    st_c = lg.PrefixState(
        i=st.i,
        desc0=jnp.asarray(d0), desc1=jnp.asarray(d1),
        act0=jnp.asarray(a0c), act1=jnp.asarray(a1c),
        prune0=jnp.asarray(p0), prune1=jnp.asarray(p1),
        stop=st.stop, kn0=jnp.asarray(kn0), kn1=jnp.asarray(kn1),
        num_points=st.num_points,
    )
    out = _suffix_jit(params, conf, st_c)

    # scatter back to original numbering (reference lightglue.py:606-614)
    m0c = np.asarray(out.matches0)
    m1c = np.asarray(out.matches1)
    ms0c = np.asarray(out.matching_scores0)
    ms1c = np.asarray(out.matching_scores1)
    pr0c = np.asarray(out.prune0)
    pr1c = np.asarray(out.prune1)

    m0 = np.full((b, m), -1, np.int32)
    m1 = np.full((b, n), -1, np.int32)
    ms0 = np.zeros((b, m), np.float32)
    ms1 = np.zeros((b, n), np.float32)
    pr0 = np.asarray(st.prune0).copy()
    pr1 = np.asarray(st.prune1).copy()
    for i in range(b):
        v0 = a0c[i]
        v1 = a1c[i]
        tgt0 = ind0[i][v0]
        tgt1 = ind1[i][v1]
        mm = m0c[i][v0]
        m0[i, tgt0] = np.where(mm >= 0, ind1[i][np.clip(mm, 0, bucket1 - 1)], -1)
        ms0[i, tgt0] = ms0c[i][v0]
        mm1 = m1c[i][v1]
        m1[i, tgt1] = np.where(mm1 >= 0, ind0[i][np.clip(mm1, 0, bucket0 - 1)], -1)
        ms1[i, tgt1] = ms1c[i][v1]
        pr0[i, tgt0] = pr0c[i][v0]
        pr1[i, tgt1] = pr1c[i][v1]

    return lg.MatchOutput(
        jnp.asarray(m0), jnp.asarray(m1), jnp.asarray(ms0), jnp.asarray(ms1),
        out.stop, jnp.asarray(pr0), jnp.asarray(pr1),
    )
