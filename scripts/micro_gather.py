"""Microbenchmark: XLA gather strategies on TPU (tunnel-truthful timing)."""

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
    n_rows = 12288  # block3 spatial size
    for n_idx, c, name in [
        (110592, 256, "quad  110K x 256 bf16"),
        (442368, 64, "orig  442K x 64  bf16"),
        (110592, 64, "      110K x 64  bf16"),
        (110592, 128, "      110K x 128 bf16"),
        (12288, 256, "      12K  x 256 bf16"),
    ]:
        tbl = jnp.asarray(
            rng.standard_normal((1, n_rows, c)).astype(np.float32)
        ).astype(jnp.bfloat16)
        idx = jnp.asarray(
            rng.integers(0, n_rows, (1, n_idx)).astype(np.int32)
        )

        def g(tbl, idx, c_):
            out = jnp.take_along_axis(
                tbl, (idx + jnp.int32(c_ * 0))[..., None], axis=1
            )
            return out.astype(jnp.float32).sum() * 1e-20

        ms = timed(g, tbl, idx)
        print(f"{name}: {ms:7.3f} ms  ({n_idx / (ms * 1e-3) / 1e6:8.1f} Mrows/s)")

    # sorted indices
    idx_s = jnp.asarray(
        np.sort(rng.integers(0, n_rows, (1, 110592)).astype(np.int32), axis=1)
    )
    tbl = jnp.asarray(
        rng.standard_normal((1, n_rows, 256)).astype(np.float32)
    ).astype(jnp.bfloat16)

    def g2(tbl, idx, c_):
        out = jnp.take_along_axis(tbl, (idx + jnp.int32(c_ * 0))[..., None], 1)
        return out.astype(jnp.float32).sum() * 1e-20

    print(f"sorted 110K x 256 bf16: {timed(g2, tbl, idx_s):7.3f} ms")

    # one-hot matmul gather for comparison (small table)
    def onehot(tbl, idx, c_):
        oh = jax.nn.one_hot(idx[0] + jnp.int32(c_ * 0), n_rows, dtype=jnp.bfloat16)
        out = oh @ tbl[0]
        return out.astype(jnp.float32).sum() * 1e-20

    idx16k = jnp.asarray(rng.integers(0, n_rows, (1, 16384)).astype(np.int32))
    print(f"onehot 16K x 256 (12K tbl): {timed(onehot, tbl, idx16k):7.3f} ms")

    # gather expressed as dynamic_slice scan over contiguous CHUNKS:
    # deform conv taps are contiguous in x! tap (ki,kj) at output (y,x)
    # samples y0 ~ y + ki + dy(y,x): for fixed tap, consecutive x share y0
    # only if dy smooth — not exploitable exactly. Skip.


if __name__ == "__main__":
    main()
