"""Benchmark: LightGlue matcher throughput on one TPU chip.

Prints ONE JSON line (driver contract): the headline throughput at 1024
keypoints, with the exact configuration named in the metric string. A fuller
breakdown (fixed floor / masked adaptive / headline / end-to-end) is written
to benchmarks/bench_detail.json as a side artifact.

Headline config = two-stage width-pruning compaction (reference adaptive
width, lightglue.py:551-566, harvested as real FLOP savings): 1 full-size
layer, survivors compacted on device to a 256-point bucket (<=25% of 1024),
remaining 8 layers + assignment at 256; bf16 compute; single-pass
bidirectional cross kernel. The fixed line is the honest floor with NO
adaptivity (every layer at full size) — random init weights make
depth-exit/pruning decisions unrepresentative, so adaptive gains here come
from the compaction bucket cap, which IS the named config.

Timing methodology (see .claude/skills/verify/SKILL.md): the axon TPU
tunnel's block_until_ready can return before execution completes, so work is
chained inside ONE device program (lax.scan with a forced data dependency)
and timing ends at a host value fetch. The tunnel also adds a FIXED ~30 ms
dispatch+fetch overhead per program (measured via an empty-body chain), so
throughput is the marginal rate between a reps-chain and a 3*reps-chain —
the steady-state serving rate, not one-shot latency.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import numpy as np

BASELINE = 150.0  # RTX 3080 compiled+adaptive @1024 (reference README:132)


def _time_forward(conf, params, inputs, batch, reps=8, tries=3):
    """Differential chained timing: the tunnel adds a fixed ~30 ms
    dispatch+fetch overhead per program, so throughput = marginal rate
    between a reps-chain and a 3*reps-chain (steady-state serving rate)."""
    import jax
    import jax.numpy as jnp

    from lightglue_tpu.models import lightglue as lg

    def make(r):
        @jax.jit
        def chained(params, kpts0, kpts1, desc0, desc1, size0, size1):
            def body(carry, _):
                out = lg.forward(
                    params, conf,
                    kpts0=kpts0, kpts1=kpts1, desc0=carry, desc1=desc1,
                    size0=size0, size1=size1,
                )
                return carry + out.matching_scores0.sum() * 1e-20, out.stop

            carry, stops = jax.lax.scan(body, desc0, None, length=r)
            # carry must reach the output: on the fixed path `stop` is
            # constant and XLA would otherwise dead-code-eliminate the matcher
            return stops.sum().astype(jnp.float32) + carry.sum() * 1e-20

        return chained

    args = (
        params, inputs["kpts0"], inputs["kpts1"], inputs["desc0"],
        inputs["desc1"], inputs["size0"], inputs["size1"],
    )

    def best_of(fn):
        float(fn(*args))  # compile + warm (host fetch = true completion)
        best = float("inf")
        for _ in range(tries):
            t0 = time.perf_counter()
            float(fn(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = best_of(make(reps))
    t3 = best_of(make(3 * reps))
    return batch * 2 * reps / max(t3 - t1, 1e-9)


def _inputs(m, batch, seed=0):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    return dict(
        kpts0=jnp.asarray(rng.uniform(0, 1024, (batch, m, 2)).astype(np.float32)),
        kpts1=jnp.asarray(rng.uniform(0, 768, (batch, m, 2)).astype(np.float32)),
        desc0=jnp.asarray(rng.standard_normal((batch, m, 256)).astype(np.float32)),
        desc1=jnp.asarray(rng.standard_normal((batch, m, 256)).astype(np.float32)),
        size0=jnp.asarray(np.tile([[1024.0, 768.0]], (batch, 1))),
        size1=jnp.asarray(np.tile([[800.0, 600.0]], (batch, 1))),
    )


def _end_to_end_pairs_per_sec(batch=8, reps=4, tries=3):
    """Single-program SuperPoint-extract x2 + match throughput (VERDICT r1
    item 8; the reference benchmark measures matcher-only)."""
    import jax
    import jax.numpy as jnp

    from lightglue_tpu.configs import SuperPointConfig, lightglue_config
    from lightglue_tpu.models import lightglue as lg
    from lightglue_tpu.models import superpoint as sp

    h, w, k = 768, 1024, 1024
    # production extraction config: bf16 + approx top-k (faster for
    # SuperPoint's post-NMS sparse map; exact top_k stays default for
    # ALIKED/DISK where approx_max_k measured slower)
    sconf = SuperPointConfig(max_num_keypoints=k, mp=True, approx_topk=0.95)
    sparams = sp.init_params(jax.random.key(1), sconf)
    mconf = lightglue_config(
        "superpoint", mp=True, compaction_bucket=256, compaction_prefix=1,
        cross_softmax_shift=12.0, self_softmax_shift=12.0,
    )
    mparams = lg.init_params(jax.random.key(0), mconf)
    rng = np.random.default_rng(2)
    img0 = jnp.asarray(rng.uniform(0, 1, (batch, h, w, 1)).astype(np.float32))
    img1 = jnp.asarray(rng.uniform(0, 1, (batch, h, w, 1)).astype(np.float32))
    size = jnp.asarray(np.tile([[float(w), float(h)]], (batch, 1)))

    def make(r):
        @jax.jit
        def chained(img0, img1, size):
            def body(carry, _):
                f0 = sp.forward(sparams, sconf, img0 + carry * 1e-20, size)
                f1 = sp.forward(sparams, sconf, img1, size)
                out = lg.forward(
                    mparams, mconf,
                    kpts0=f0.keypoints, kpts1=f1.keypoints,
                    desc0=f0.descriptors, desc1=f1.descriptors,
                    size0=size, size1=size,
                    mask0=f0.valid, mask1=f1.valid,
                )
                return carry + out.matching_scores0.sum() * 1e-20, out.stop

            carry, stops = jax.lax.scan(body, jnp.float32(0.0), None, length=r)
            return stops.sum().astype(jnp.float32) + carry * 1e-20

        return chained

    def best_of(fn):
        float(fn(img0, img1, size))
        best = float("inf")
        for _ in range(tries):
            t0 = time.perf_counter()
            float(fn(img0, img1, size))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = best_of(make(reps))
    t3 = best_of(make(3 * reps))
    return batch * 2 * reps / max(t3 - t1, 1e-9)


def main(M=1024, BATCH=None, REPS=8):
    import jax

    from lightglue_tpu.configs import lightglue_config
    from lightglue_tpu.models import lightglue as lg

    tiny = M < 512  # contract-test mode (CPU backend, no detail lines)
    headline_batch = BATCH if BATCH is not None else (2 if tiny else 64)
    floor_batch = min(headline_batch, 16)

    base = lightglue_config("superpoint", mp=True)
    params = lg.init_params(jax.random.key(0), base)

    bucket = min(256, M // 2)
    headline_conf = base.replace(
        compaction_bucket=bucket, compaction_prefix=1,
        cross_softmax_shift=12.0, self_softmax_shift=12.0,
    )
    detail = {}

    if not tiny:
        # honest floor: no adaptivity, every layer at full size
        fixed = base.replace(
            depth_confidence=-1.0, width_confidence=-1.0,
            cross_softmax_shift=12.0, self_softmax_shift=12.0,
        )
        detail[f"fixed bf16 B{floor_batch} (floor, no adaptivity)"] = round(
            _time_forward(fixed, params, _inputs(M, floor_batch),
                          floor_batch, reps=REPS), 1
        )
        # reference-equivalent adaptive semantics (masks, no FLOP savings)
        detail[f"adaptive masked bf16 B{floor_batch}"] = round(
            _time_forward(base.replace(cross_softmax_shift=12.0), params,
                          _inputs(M, floor_batch), floor_batch, reps=REPS), 1
        )
    headline = _time_forward(
        headline_conf, params, _inputs(M, headline_batch), headline_batch,
        reps=REPS,
    )
    detail[
        f"twostage compaction p1 b{bucket} bf16 B{headline_batch} (headline)"
    ] = round(headline, 1)
    if not tiny:
        try:
            detail["end-to-end SuperPoint(bf16,approx) x2 + match B8"] = round(
                _end_to_end_pairs_per_sec(), 1
            )
        except Exception as e:  # informational; never kill bench
            detail["end-to-end SuperPoint(bf16,approx) x2 + match B8"] = (
                f"FAIL {e}"[:200]
            )

    if not tiny:  # contract-test mode must not clobber the real artifact
        out_dir = Path(__file__).parent / "benchmarks"
        out_dir.mkdir(exist_ok=True)
        (out_dir / "bench_detail.json").write_text(
            json.dumps(
                {"unit": "pairs/s @1024 kpts", "baseline_rtx3080": BASELINE,
                 "lines": detail},
                indent=1,
            )
        )

    result = {
        "metric": (
            f"image pairs/sec @{M} kpts — LightGlue matcher, two-stage "
            f"width-pruning compaction (1 full layer -> {bucket}-pt bucket "
            f"= 25% survivor cap), bf16, single-pass cross kernel, batch "
            f"{headline_batch}; fixed-path floor in "
            "benchmarks/bench_detail.json"
        ),
        "value": round(headline, 1),
        "unit": "pairs/s",
        "vs_baseline": round(headline / BASELINE, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
