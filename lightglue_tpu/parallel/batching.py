"""Batched, bucketed, and multi-chip matching.

Throughput layer (SURVEY.md §7 step 7): many image pairs matched per device
program. Generalizes the reference's ``pad_to_length`` static buckets
(lightglue.py:46-55, 437-454): pairs are padded to a common bucket length
host-side, stacked on a leading batch axis, and the batch axis is sharded
across a device mesh (data parallelism over ICI). Parameters are replicated;
no collectives are needed in the forward path, so scaling is linear in chips.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import nn
from ..configs import LightGlueConfig
from ..models import lightglue as lg

DEFAULT_BUCKETS = (256, 512, 768, 1024, 1280, 1536, 2048, 4096)


def next_bucket(n: int, buckets: Sequence[int] = DEFAULT_BUCKETS) -> int:
    """Smallest bucket >= n (reference static_lengths selection,
    lightglue.py:514-516)."""
    for b in buckets:
        if b >= n:
            return b
    return n


def pad_features_to_bucket(
    feats: List[Dict[str, np.ndarray]],
    bucket: Optional[int] = None,
    buckets: Sequence[int] = DEFAULT_BUCKETS,
) -> Dict[str, np.ndarray]:
    """Stack per-pair feature dicts (unbatched arrays: keypoints (K_i, 2),
    descriptors (K_i, D), ...) into one batch padded to a common bucket.

    Returns dict with keypoints (B, K, 2), descriptors (B, K, D),
    valid (B, K), image_size (B, 2) [if present], scales/oris if present.
    """
    kmax = max(f["keypoints"].shape[0] for f in feats)
    k = bucket or next_bucket(kmax, buckets)
    out: Dict[str, List[np.ndarray]] = {}
    for f in feats:
        n = f["keypoints"].shape[0]
        pad = k - n
        valid = f.get("valid")
        if valid is None:
            valid = np.ones((n,), bool)
        out.setdefault("valid", []).append(
            np.pad(valid, (0, pad), constant_values=False)
        )
        for key in ("keypoints", "descriptors", "keypoint_scores", "scales", "oris"):
            if key in f:
                arr = f[key]
                widths = [(0, pad)] + [(0, 0)] * (arr.ndim - 1)
                out.setdefault(key, []).append(
                    np.pad(arr, widths, constant_values=1.0)
                )
        if "image_size" in f:
            out.setdefault("image_size", []).append(np.asarray(f["image_size"]))
    return {key: np.stack(v, 0) for key, v in out.items()}


@functools.lru_cache(maxsize=32)
def make_batched_matcher(
    conf: LightGlueConfig,
    mesh: Optional[Mesh] = None,
):
    """Build a jitted batched matching function (cached per (conf, mesh) so
    repeated calls reuse the jit cache instead of re-tracing).

    With a mesh, inputs are sharded on the batch axis and params replicated —
    pure data parallelism across chips; XLA inserts no collectives (adaptive
    early-stop sums confidences globally, which introduces one small psum).
    """
    in_shardings = None
    if mesh is not None:
        # batch axis spans ALL mesh axes (1-D ICI or 2-D DCN x ICI)
        data = NamedSharding(mesh, P(tuple(mesh.axis_names)))
        repl = NamedSharding(mesh, P())

    def fwd(params, kpts0, kpts1, desc0, desc1, mask0, mask1, size0, size1,
            scales0=None, oris0=None, scales1=None, oris1=None):
        return lg.forward(
            params, conf,
            kpts0=kpts0, kpts1=kpts1, desc0=desc0, desc1=desc1,
            size0=size0, size1=size1, mask0=mask0, mask1=mask1,
            scales0=scales0, oris0=oris0, scales1=scales1, oris1=oris1,
        )

    jitted = jax.jit(fwd)
    if mesh is None:
        return jitted

    def shard_args(params, *args):
        params = jax.device_put(params, repl)
        args = tuple(
            None if a is None else jax.device_put(a, data) for a in args
        )
        return params, args

    def run(params, *args, **kw):
        ordered = [
            kw.pop(k, None)
            for k in ("scales0", "oris0", "scales1", "oris1")
        ]
        params, all_args = shard_args(params, *args, *ordered)
        return jitted(params, *all_args)

    run.jitted = jitted
    run.data_sharding = data
    run.repl_sharding = repl
    return run


def match_feature_batch(
    params: nn.Params,
    conf: LightGlueConfig,
    feats0: Dict[str, np.ndarray],
    feats1: Dict[str, np.ndarray],
    mesh: Optional[Mesh] = None,
) -> lg.MatchOutput:
    """Match two stacked+padded feature batches (from
    ``pad_features_to_bucket``)."""
    matcher = make_batched_matcher(conf, mesh)
    def g(f, k):
        v = f.get(k)
        return None if v is None else jnp.asarray(v)
    args = (
        jnp.asarray(feats0["keypoints"]), jnp.asarray(feats1["keypoints"]),
        jnp.asarray(feats0["descriptors"]), jnp.asarray(feats1["descriptors"]),
        jnp.asarray(feats0["valid"]), jnp.asarray(feats1["valid"]),
        g(feats0, "image_size"), g(feats1, "image_size"),
    )
    kw = {}
    if conf.add_scale_ori:
        kw = dict(
            scales0=g(feats0, "scales"), oris0=g(feats0, "oris"),
            scales1=g(feats1, "scales"), oris1=g(feats1, "oris"),
        )
    if mesh is None:
        return matcher(params, *args, **{k: kw.get(k) for k in
                       ("scales0", "oris0", "scales1", "oris1")})
    return matcher(params, *args, **kw)


class BatchMatcher:
    """Serving runtime: match many ragged feature pairs with bounded
    compilation.

    Pairs are grouped by keypoint bucket (generalizing the reference's
    static_lengths, lightglue.py:437-454); each group is packed into a
    padded batch (C++ host runtime when available), batch sizes are rounded
    up to powers of two (dummy pairs padded in) so the jit cache stays
    small, and results are compacted back per pair in input order.
    """

    def __init__(
        self,
        conf: LightGlueConfig,
        params: nn.Params,
        mesh: Optional[Mesh] = None,
        buckets: Sequence[int] = DEFAULT_BUCKETS,
        max_batch: int = 16,
    ):
        self.conf = conf
        self.params = params
        self.mesh = mesh
        self.buckets = tuple(buckets)
        self.max_batch = max_batch
        self._matcher = make_batched_matcher(conf, mesh)

    def warmup(self, batches: Optional[Sequence[int]] = None) -> int:
        """AOT-compile every (bucket, batch) program this matcher can
        dispatch, before any traffic arrives.

        The reference exposes the same need as ``LightGlue.compile(...,
        static_lengths)`` (lightglue.py:439-454) — compiled per-length
        variants. Here each program is lowered from abstract
        ShapeDtypeStructs (no input data or device transfer) and compiled
        eagerly; combined with ``utils.compile_cache.enable_persistent_
        cache`` the binaries survive process restarts, so a serving replica
        restarts without paying any jit latency.

        Returns the number of programs compiled.
        """
        if batches is None:
            batches = [self.max_batch]
        sizes = sorted({self._round_batch(b, self.max_batch) for b in batches})
        jitted = getattr(self._matcher, "jitted", self._matcher)
        data = getattr(self._matcher, "data_sharding", None)
        repl = getattr(self._matcher, "repl_sharding", None)

        def struct(shape, dtype, sharding):
            if sharding is None:
                return jax.ShapeDtypeStruct(shape, dtype)
            return jax.ShapeDtypeStruct(shape, dtype, sharding=sharding)

        p_struct = jax.tree.map(
            lambda a: struct(a.shape, a.dtype, repl), self.params
        )
        dim = self.conf.input_dim
        n = 0
        for bucket in self.buckets:
            for b in sizes:
                kpts = struct((b, bucket, 2), jnp.float32, data)
                desc = struct((b, bucket, dim), jnp.float32, data)
                mask = struct((b, bucket), jnp.bool_, data)
                size = struct((b, 2), jnp.float32, data)
                so = struct((b, bucket), jnp.float32, data)
                extra = (so, so, so, so) if self.conf.add_scale_ori else (
                    None, None, None, None
                )
                # traffic may or may not carry image_size (pairs without it
                # normalize by the keypoint bbox) — both trace to distinct
                # programs, so warm both signatures
                for sz in (size, None):
                    jitted.lower(
                        p_struct, kpts, kpts, desc, desc, mask, mask, sz, sz,
                        *extra,
                    ).compile()
                    n += 1
        return n

    def _round_batch(self, n: int, max_batch: int) -> int:
        b = 1
        while b < n and b < max_batch:
            b *= 2
        if self.mesh is not None:
            # NamedSharding over the batch axis requires the batch to divide
            # evenly across the mesh; round up (dummy pairs fill the slack)
            nd = self.mesh.devices.size
            b = ((b + nd - 1) // nd) * nd
        return b

    def match_pairs(self, pairs):
        """pairs: list of (feats0, feats1) dicts with unbatched arrays
        (keypoints (K_i, 2), descriptors, optional valid/image_size/
        scales/oris). Returns a list of result dicts with matches (K, 2),
        scores, matches0/1, matching_scores0/1, stop."""
        from .. import native

        groups = {}
        for i, (f0, f1) in enumerate(pairs):
            n = max(f0["keypoints"].shape[0], f1["keypoints"].shape[0])
            groups.setdefault(next_bucket(n, self.buckets), []).append(i)

        results = [None] * len(pairs)
        for bucket, idxs in groups.items():
            for start in range(0, len(idxs), self.max_batch):
                chunk = idxs[start : start + self.max_batch]
                b = self._round_batch(len(chunk), self.max_batch)
                sel = [pairs[i] for i in chunk]
                # pad with a dummy pair to the rounded batch size
                while len(sel) < b:
                    sel.append(sel[0])
                feats0 = pad_features_to_bucket([p[0] for p in sel], bucket)
                feats1 = pad_features_to_bucket([p[1] for p in sel], bucket)
                out = match_feature_batch(
                    self.params, self.conf, feats0, feats1, mesh=self.mesh
                )
                m0 = np.asarray(out.matches0)
                ms0 = np.asarray(out.matching_scores0)
                m1 = np.asarray(out.matches1)
                ms1 = np.asarray(out.matching_scores1)
                cm, cs = native.compact_matches(m0, ms0)
                stop = int(out.stop)
                for j, i in enumerate(chunk):
                    n0 = pairs[i][0]["keypoints"].shape[0]
                    n1 = pairs[i][1]["keypoints"].shape[0]
                    results[i] = {
                        "matches": cm[j],
                        "scores": cs[j],
                        "matches0": m0[j, :n0],
                        "matches1": m1[j, :n1],
                        "matching_scores0": ms0[j, :n0],
                        "matching_scores1": ms1[j, :n1],
                        "stop": stop,
                    }
        return results
