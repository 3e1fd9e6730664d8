"""Gather size sweep + measurement-overhead baseline."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, reps=16, tries=3):
    @jax.jit
    def chained(*a):
        def body(c, _):
            return c + fn(*a, c), None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=reps)
        return c

    float(chained(*args))
    best = float("inf")
    for _ in range(tries):
        t0 = time.perf_counter()
        float(chained(*args))
        best = min(best, time.perf_counter() - t0)
    return best / reps * 1e3


def main():
    rng = np.random.default_rng(0)
    n_rows = 12288
    tbl = jnp.asarray(
        rng.standard_normal((1, n_rows, 256)).astype(np.float32)
    ).astype(jnp.bfloat16)

    def empty(tbl, idx, c):
        return idx.astype(jnp.float32).sum() * 1e-20 + c * 1e-30

    idx0 = jnp.asarray(rng.integers(0, n_rows, (1, 1024)).astype(np.int32))
    print(f"empty body            : {timed(empty, tbl, idx0):7.3f} ms")

    for n_idx in [1024, 4096, 16384, 65536, 131072, 262144, 524288]:
        idx = jnp.asarray(
            rng.integers(0, n_rows, (1, n_idx)).astype(np.int32)
        )

        def g(tbl, idx, c):
            out = jnp.take_along_axis(tbl, (idx + jnp.int32(c * 0))[..., None], 1)
            return out.astype(jnp.float32).sum() * 1e-20

        ms = timed(g, tbl, idx)
        print(f"gather {n_idx:7d} x 256   : {ms:7.3f} ms ({n_idx/ms*1e-3:7.1f} Krows/ms)")

    # same but fp32 table
    tblf = tbl.astype(jnp.float32)
    idx = jnp.asarray(rng.integers(0, n_rows, (1, 131072)).astype(np.int32))

    def gf(tbl, idx, c):
        out = jnp.take_along_axis(tbl, (idx + jnp.int32(c * 0))[..., None], 1)
        return out.sum() * 1e-20

    print(f"gather 131072 fp32    : {timed(gf, tblf, idx):7.3f} ms")

    # without the big reduction: sum only a slice
    def gs(tbl, idx, c):
        out = jnp.take_along_axis(tbl, (idx + jnp.int32(c * 0))[..., None], 1)
        return out[:, ::64].astype(jnp.float32).sum() * 1e-20

    print(f"gather 131072 lite-sum: {timed(gs, tbl, idx):7.3f} ms")


if __name__ == "__main__":
    main()
