"""Persistent XLA compilation cache setup.

The matcher's bucketed serving runtime compiles one program per
(bucket, batch, config) combination (parallel/batching.py::BatchMatcher).
First-compile latency on TPU is tens of seconds per program; with a
persistent cache a restarted serving replica reuses the compiled binaries
from disk instead. (The reference's analogue is ``torch.compile`` warmup
per static length, lightglue.py:439-454, which recompiles every process.)

Usage (before the first jit call):

    from lightglue_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache("/var/cache/lightglue_tpu")
"""

from __future__ import annotations

import os


def enable_persistent_cache(
    cache_dir: str,
    min_compile_time_secs: float = 0.0,
    min_entry_size_bytes: int = 0,
) -> str:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    By default caches EVERY program (thresholds zeroed) — right for a
    serving replica with a bounded program set like BatchMatcher's
    bucket x batch grid. Raise the thresholds for interactive use.

    Returns the cache directory (created if missing).
    """
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", min_compile_time_secs
    )
    jax.config.update(
        "jax_persistent_cache_min_entry_size_bytes", min_entry_size_bytes
    )
    # don't kill serving if the cache volume has issues
    try:
        jax.config.update("jax_raise_persistent_cache_errors", False)
    except AttributeError:  # flag renamed/absent in some versions
        pass
    return cache_dir
