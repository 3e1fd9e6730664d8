"""Exact two-level top-k over full-resolution score maps.

Detection heads (SuperPoint superpoint.py:189-207, ALIKED DKD
aliked.py:94-261, DISK/kornia heatmap top-n) all end with
``top_k(scores.reshape(B, -1), k)`` over an H*W map. On TPU a monolithic
top_k over ~786k lanes costs ~1 ms; restricting each ROW to its top-`cap`
candidates first and running the global top_k over the (H*cap) candidate
strip costs ~0.16 ms.

The row cap makes the result approximate only when some row contributes
more than `cap` of the global top-k. That is detectable after the fact:
every dropped element of row r is <= the row's cap-th value, so if the
selected k-th value strictly beats every row's cap-th value the candidate
set was provably complete (ties fall back, keeping index-order tie-break
semantics identical to the monolithic top_k). A ``lax.cond`` re-runs the
monolithic version in that rare case — detection stays EXACT while paying
the fast path on real score maps.

STATUS: NOT wired into the detection heads. In isolation the fast path
wins 6x (0.16 vs 0.96 ms @1024x768), but composed inside a full extractor
forward the HLO conditional pessimizes the surrounding graph by ~+2.5 ms
(measured on ALIKED and DISK, 2026-08) — scheduling/fusion around a TPU
conditional costs more than the top-k saves. Kept (with exactness tests)
for workloads where top-k dominates a smaller program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _is_vmapped(x) -> bool:
    """True when ``x`` carries a vmap batch dimension. Under vmap,
    ``lax.cond`` lowers to a ``select`` that executes BOTH branches, so the
    exactness fallback would run the monolithic top_k unconditionally —
    strictly slower than not using the two-level path at all. Callers under
    vmap get the monolithic form directly."""
    try:
        from jax._src.interpreters.batching import BatchTracer
    except ImportError:  # private module moved: be conservative
        return False
    return isinstance(x, BatchTracer)


def topk2d(scores: jnp.ndarray, k: int, cap: int = 32):
    """Exact equivalent of ``jax.lax.top_k(scores.reshape(B, -1), k)`` for
    (B, H, W) score maps, via a row-capped two-level reduction with a
    monolithic fallback.

    Returns (values (B, k), flat_indices (B, k)) with identical values and
    identical tie-break (lowest flat index first) as the monolithic form:
    candidates are row-major and within-row ranks are lowest-column-first,
    so candidate order equals flat order wherever values tie.
    """
    b, h, w = scores.shape
    cap = min(cap, w)
    if k > h * cap or _is_vmapped(scores):
        return jax.lax.top_k(scores.reshape(b, -1), k)

    # materialize the map once: it feeds both the fast path and the
    # fallback branch, and XLA otherwise duplicates the producing chain
    # (e.g. the NMS rounds) into each consumer
    scores = jax.lax.optimization_barrier(scores)
    vr, ir = jax.lax.top_k(scores, cap)  # (B, H, cap) per-row candidates
    v_fast, ci = jax.lax.top_k(vr.reshape(b, h * cap), k)
    row = ci // cap
    col = jnp.take_along_axis(ir.reshape(b, h * cap), ci, axis=1)
    i_fast = row * w + col

    # provably complete iff the k-th selected value strictly beats every
    # row's cap-th (= worst kept) value; ties conservatively fall back
    complete = jnp.all(vr[..., cap - 1, None] < v_fast[:, None, k - 1 :])

    return jax.lax.cond(
        complete,
        lambda _: (v_fast, i_fast),
        lambda _: tuple(jax.lax.top_k(scores.reshape(b, -1), k)),
        None,
    )
