"""Profiling and timing utilities.

The reference's only perf tooling is CUDA-event timing in benchmark.py
(reference benchmark.py:18-43). TPU equivalents: ``jax.profiler`` traces
(viewable in TensorBoard/XProf) and a trustworthy wall-clock helper that
forces a host value fetch — through the remote TPU tunnel,
``block_until_ready`` alone can return before execution completes (see
.claude/skills/verify/SKILL.md).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def trace(logdir: str = "/tmp/lightglue_tpu_trace"):
    """Capture a jax.profiler trace around a block.

    View with: tensorboard --logdir <logdir>  (or xprof).
    """
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def timed(fn: Callable, *args, repeat: int = 10, warmup: int = 3, **kw):
    """Median wall-clock seconds per call, forcing host materialization of
    the first leaf of the output each call (device-truthful)."""
    def fetch(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf)  # host copy == real completion

    for _ in range(warmup):
        fetch(fn(*args, **kw))
    times = []
    for _ in range(repeat):
        t0 = time.perf_counter()
        fetch(fn(*args, **kw))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def chained_timed(
    step_fn: Callable, carry0: jnp.ndarray, reps: int = 10
) -> float:
    """Seconds per step for ``step_fn(carry) -> carry`` chained ``reps``
    times inside ONE jitted program (amortizes dispatch + defeats tunnel
    async-completion lies)."""

    @jax.jit
    def chain(c):
        def body(c, _):
            return step_fn(c), ()
        c, _ = jax.lax.scan(body, c, None, length=reps)
        return jax.tree_util.tree_leaves(c)[0].sum()

    float(chain(carry0))  # compile + warm
    t0 = time.perf_counter()
    float(chain(carry0))
    return (time.perf_counter() - t0) / reps
