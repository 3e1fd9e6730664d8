"""Benchmark: LightGlue matcher throughput on one TPU chip.

Prints ONE JSON line: image pairs/sec at 1024 keypoints (SuperPoint preset),
vs the reference baseline of 150 pairs/s (RTX 3080, compiled+adaptive,
README.md:132 / BASELINE.md).

Timing methodology (see .claude/skills/verify/SKILL.md): the axon TPU
tunnel's block_until_ready can return before execution completes, so work is
chained inside ONE device program (lax.scan with a forced data dependency
between iterations) and timing ends at a host value fetch.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import numpy as np


def main(M=1024, BATCH=16, REPS=8):
    import jax
    import jax.numpy as jnp

    from lightglue_tpu.configs import lightglue_config
    from lightglue_tpu.models import lightglue as lg

    # defaults: M=1024 kpts, BATCH=16 (v5e sweet spot; larger batches hit
    # VMEM pressure), REPS=8 chained iterations inside one program

    # bf16 compute ("mp"), adaptive on: comparable to the reference's
    # headline config (fp16 flash + adaptive, README.md:132)
    conf = lightglue_config("superpoint", mp=True)
    params = lg.init_params(jax.random.key(0), conf)

    rng = np.random.default_rng(0)
    kpts0 = jnp.asarray(rng.uniform(0, 1024, (BATCH, M, 2)).astype(np.float32))
    kpts1 = jnp.asarray(rng.uniform(0, 768, (BATCH, M, 2)).astype(np.float32))
    desc0 = jnp.asarray(rng.standard_normal((BATCH, M, 256)).astype(np.float32))
    desc1 = jnp.asarray(rng.standard_normal((BATCH, M, 256)).astype(np.float32))
    size0 = jnp.asarray(np.tile([[1024.0, 768.0]], (BATCH, 1)))
    size1 = jnp.asarray(np.tile([[800.0, 600.0]], (BATCH, 1)))

    @jax.jit
    def chained(params, kpts0, kpts1, desc0, desc1, size0, size1):
        def body(carry, _):
            d0 = carry
            out = lg.forward(
                params, conf,
                kpts0=kpts0, kpts1=kpts1, desc0=d0, desc1=desc1,
                size0=size0, size1=size1,
            )
            d0 = d0 + out.matching_scores0.sum() * 1e-20
            return d0, out.matches0[0, 0]
        _, ms = jax.lax.scan(body, desc0, None, length=REPS)
        return ms.sum()

    args = (params, kpts0, kpts1, desc0, desc1, size0, size1)
    _ = int(chained(*args))  # compile + warm up (host fetch forces completion)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        _ = int(chained(*args))  # host fetch = true completion
        best = min(best, time.time() - t0)
    pairs_per_sec = BATCH * REPS / best

    baseline = 150.0  # RTX 3080 compiled+adaptive @1024 (reference README:132)
    result = {
        "metric": f"image pairs/sec @{M} kpts (LightGlue matcher, bf16, adaptive, batch {BATCH})",
        "value": round(pairs_per_sec, 1),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / baseline, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
