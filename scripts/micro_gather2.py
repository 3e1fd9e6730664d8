"""Gather variants round 2: 2D operand, lax.gather dims, Pallas in-VMEM."""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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


N_ROWS = 12288
N_IDX = 110592


def main():
    rng = np.random.default_rng(0)
    tbl2d = jnp.asarray(
        rng.standard_normal((N_ROWS, 256)).astype(np.float32)
    ).astype(jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, N_ROWS, (N_IDX,)).astype(np.int32))

    def take2d(tbl, idx, c):
        out = jnp.take(tbl, idx + jnp.int32(c * 0), axis=0)
        return out.astype(jnp.float32).sum() * 1e-20

    print(f"take 2D (HW,256) 110K     : {timed(take2d, tbl2d, idx):7.3f} ms")

    def takefill(tbl, idx, c):
        out = jnp.take(
            tbl, idx + jnp.int32(c * 0), axis=0, mode="fill", fill_value=0
        )
        return out.astype(jnp.float32).sum() * 1e-20

    print(f"take 2D mode=fill         : {timed(takefill, tbl2d, idx):7.3f} ms")

    # Pallas: table fully in VMEM (12288x256 bf16 = 6 MB), gather a block of
    # indices per grid step with a fori_loop of dynamic row reads
    BLK = 1024

    def pallas_gather_kernel(idx_ref, tbl_ref, out_ref):
        def body(i, _):
            out_ref[i, :] = tbl_ref[idx_ref[i], :]
            return 0

        jax.lax.fori_loop(0, BLK, body, 0)

    @functools.partial(jax.jit, static_argnames=())
    def pallas_gather(tbl, idx):
        return pl.pallas_call(
            pallas_gather_kernel,
            grid=(N_IDX // BLK,),
            in_specs=[
                pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.SMEM),
                pl.BlockSpec((N_ROWS, 256), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLK, 256), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N_IDX, 256), tbl.dtype),
        )(idx, tbl)

    def pg(tbl, idx, c):
        out = pallas_gather(tbl, idx + jnp.int32(c * 0))
        return out.astype(jnp.float32).sum() * 1e-20

    try:
        print(f"pallas fori row loop      : {timed(pg, tbl2d, idx):7.3f} ms")
    except Exception as e:
        print(f"pallas fori row loop FAIL: {str(e)[:300]}")

    # Pallas: one-hot matmul gather per block, table in VMEM
    def pallas_onehot_kernel(idx_ref, tbl_ref, out_ref):
        ids = idx_ref[:, 0]  # (BLK,) int32 in VMEM as (BLK,1)
        oh = (
            ids[:, None] == jax.lax.broadcasted_iota(jnp.int32, (BLK, N_ROWS), 1)
        ).astype(jnp.bfloat16)
        out_ref[:, :] = jax.lax.dot_general(
            oh, tbl_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.bfloat16,
        )

    @jax.jit
    def pallas_onehot(tbl, idx2d):
        return pl.pallas_call(
            pallas_onehot_kernel,
            grid=(N_IDX // BLK,),
            in_specs=[
                pl.BlockSpec((BLK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((N_ROWS, 256), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLK, 256), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N_IDX, 256), tbl.dtype),
        )(idx2d, tbl)

    idx2d = idx[:, None]

    def po(tbl, idx2d, c):
        out = pallas_onehot(tbl, idx2d + jnp.int32(c * 0))
        return out.astype(jnp.float32).sum() * 1e-20

    try:
        print(f"pallas onehot matmul      : {timed(po, tbl2d, idx2d):7.3f} ms")
    except Exception as e:
        print(f"pallas onehot matmul FAIL: {str(e)[:300]}")


if __name__ == "__main__":
    main()
