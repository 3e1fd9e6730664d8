"""Matcher throughput sweep on the real TPU (tunnel-truthful timing).

Measures pairs/s for the fixed, adaptive (masked), and two-stage-compaction
paths at a given keypoint count/batch, with optional single-pass cross
kernel (cross_softmax_shift). Run directly:

    python scripts/sweep_matcher.py [M] [BATCH]

Timing: work is chained inside one jitted lax.scan with a forced data
dependency; the clock stops at a host value fetch (block_until_ready lies
through the axon tunnel — CLAUDE.md).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def build_inputs(M, BATCH, seed=0):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    return dict(
        kpts0=jnp.asarray(rng.uniform(0, 1024, (BATCH, M, 2)).astype(np.float32)),
        kpts1=jnp.asarray(rng.uniform(0, 768, (BATCH, M, 2)).astype(np.float32)),
        desc0=jnp.asarray(rng.standard_normal((BATCH, M, 256)).astype(np.float32)),
        desc1=jnp.asarray(rng.standard_normal((BATCH, M, 256)).astype(np.float32)),
        size0=jnp.asarray(np.tile([[1024.0, 768.0]], (BATCH, 1))),
        size1=jnp.asarray(np.tile([[800.0, 600.0]], (BATCH, 1))),
    )


def time_config(conf, params, inputs, BATCH, reps=8, tries=3):
    import jax
    import jax.numpy as jnp

    from lightglue_tpu.models import lightglue as lg

    @jax.jit
    def chained(params, kpts0, kpts1, desc0, desc1, size0, size1):
        def body(carry, _):
            out = lg.forward(
                params, conf,
                kpts0=kpts0, kpts1=kpts1, desc0=carry, desc1=desc1,
                size0=size0, size1=size1,
            )
            return carry + out.matching_scores0.sum() * 1e-20, out.stop

        carry, stops = jax.lax.scan(body, inputs["desc0"], None, length=reps)
        # the carry must reach the output or XLA dead-code-eliminates the
        # entire matcher on paths where `stop` is a compile-time constant
        return stops.sum().astype(jnp.float32) + carry.sum() * 1e-20

    args = (
        params, inputs["kpts0"], inputs["kpts1"], inputs["desc0"],
        inputs["desc1"], inputs["size0"], inputs["size1"],
    )
    stops = int(chained(*args))  # compile + warm
    best = float("inf")
    for _ in range(tries):
        t0 = time.perf_counter()
        int(chained(*args))
        best = min(best, time.perf_counter() - t0)
    return BATCH * reps / best, stops / reps


def main():
    import jax

    from lightglue_tpu.configs import lightglue_config
    from lightglue_tpu.models import lightglue as lg

    M = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    base = lightglue_config("superpoint", mp=True)
    params = lg.init_params(jax.random.key(0), base)
    inputs = build_inputs(M, BATCH)

    configs = {
        "fixed": base.replace(depth_confidence=-1.0, width_confidence=-1.0),
        "fixed+1pass": base.replace(
            depth_confidence=-1.0, width_confidence=-1.0,
            cross_softmax_shift=12.0,
        ),
        "adaptive(masked)": base,
        "adaptive+1pass": base.replace(cross_softmax_shift=12.0),
    }
    for prefix in (2, 3, 4):
        for bucket in (256, 384, 512):
            if bucket >= M:
                continue
            configs[f"twostage p{prefix} b{bucket}+1pass"] = base.replace(
                compaction_bucket=bucket, compaction_prefix=prefix,
                cross_softmax_shift=12.0,
            )

    print(f"M={M} BATCH={BATCH} (pairs/s, higher better)")
    for name, conf in configs.items():
        try:
            pps, stop = time_config(conf, params, inputs, BATCH)
            print(f"{name:28s}: {pps:8.1f} pairs/s  (avg stop {stop:.1f})")
        except Exception as e:
            print(f"{name:28s}: FAIL {str(e)[:120]}")


if __name__ == "__main__":
    main()
