"""Matcher per-component cost on TPU via stage-stubbed compositions.

Each variant replaces ONE component with a near-free stub (keeping data
dependencies so XLA cannot dead-code the rest); component cost = full
forward minus the stubbed composition. Differential chained timing
throughout (tunnel methodology, see bench.py).

    python scripts/profile_matcher.py [--m 1024] [--batch 16] [--reps 6]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

import os as _os
if _os.environ.get("LG_CACHE", "1") != "0":
    from lightglue_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache(str(Path(__file__).resolve().parent.parent) + "/.cache/xla")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--fp32", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lightglue_tpu.configs import lightglue_config
    from lightglue_tpu.models import lightglue as lg
    from lightglue_tpu.ops import flash as flash_ops
    from lightglue_tpu.ops import flash_cross as flash_cross_ops
    from lightglue_tpu.ops import rotary as rotary_ops

    conf = lightglue_config(
        "superpoint", mp=not args.fp32,
        depth_confidence=-1.0, width_confidence=-1.0,
        cross_softmax_shift=12.0, self_softmax_shift=12.0,
    )
    params = lg.init_params(jax.random.key(0), conf)
    rng = np.random.default_rng(0)
    b, m = args.batch, args.m
    inputs = dict(
        kpts0=jnp.asarray(rng.uniform(0, 1024, (b, m, 2)).astype(np.float32)),
        kpts1=jnp.asarray(rng.uniform(0, 768, (b, m, 2)).astype(np.float32)),
        desc0=jnp.asarray(rng.standard_normal((b, m, 256)).astype(np.float32)),
        desc1=jnp.asarray(rng.standard_normal((b, m, 256)).astype(np.float32)),
        size0=jnp.asarray(np.tile([[1024.0, 768.0]], (b, 1))),
        size1=jnp.asarray(np.tile([[800.0, 600.0]], (b, 1))),
    )

    def timed(reps):
        def run(r):
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
                return stops.sum().astype(jnp.float32) + carry.sum() * 1e-20

            a = (params, inputs["kpts0"], inputs["kpts1"], inputs["desc0"],
                 inputs["desc1"], inputs["size0"], inputs["size1"])
            float(chained(*a))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(chained(*a))
                best = min(best, time.perf_counter() - t0)
            return best

        t1 = run(reps)
        t3 = run(3 * reps)
        return (t3 - t1) / (2 * reps) / b * 1000  # ms per pair

    real = {}
    real["flash_sdpa"] = flash_ops.flash_sdpa
    real["cross"] = flash_cross_ops.fused_cross_attention
    real["cross2"] = flash_ops.flash_cross_pair
    real["rotary"] = rotary_ops.apply_rotary
    real["ffn"] = lg._ffn_residual
    real["assign"] = lg._assign_and_filter

    def restore():
        flash_ops.flash_sdpa = real["flash_sdpa"]
        flash_cross_ops.fused_cross_attention = real["cross"]
        flash_ops.flash_cross_pair = real["cross2"]
        rotary_ops.apply_rotary = real["rotary"]
        lg._ffn_residual = real["ffn"]
        lg._assign_and_filter = real["assign"]

    full = timed(args.reps)
    print(f"full fixed fwd        {full:7.3f} ms/pair "
          f"({args.batch * 1000 / full / args.batch:.0f} eff pairs/s/chip "
          f"x B{args.batch})", flush=True)

    # --- stub self attention kernel (keep q as the 'context')
    flash_ops.flash_sdpa = (
        lambda q, k, v, mask=None, **kw: q + k * 1e-30 + v * 1e-30
    )
    t = timed(args.reps)
    print(f"  self-attn kernels   {full - t:7.3f} (stubbed fwd {t:7.3f})",
          flush=True)
    restore()

    # --- stub cross attention kernel
    flash_cross_ops.fused_cross_attention = (
        lambda qk0, qk1, v0, v1, m0=None, m1=None, **kw:
        (qk0 + v1.mean() * 1e-30, qk1 + v0.mean() * 1e-30)
    )
    flash_ops.flash_cross_pair = flash_cross_ops.fused_cross_attention
    t = timed(args.reps)
    print(f"  cross-attn kernel   {full - t:7.3f} (stubbed fwd {t:7.3f})",
          flush=True)
    restore()

    # --- stub rotary application
    rotary_ops.apply_rotary = lambda enc, x: x + enc.sum() * 1e-30
    t = timed(args.reps)
    print(f"  rotary apply        {full - t:7.3f} (stubbed fwd {t:7.3f})",
          flush=True)
    restore()

    # --- stub FFN (keep the message dependency alive)
    lg._ffn_residual = lambda p, x, msg, conf: x + msg * 1e-30
    t = timed(args.reps)
    print(f"  ffn (+out residual) {full - t:7.3f} (stubbed fwd {t:7.3f})",
          flush=True)
    restore()

    # --- stub assignment + filtering
    def stub_assign(la, conf_, d0, d1, m0, m1):
        z = d0.sum(-1).astype(jnp.float32) * 1e-30
        i0 = jnp.zeros(d0.shape[:2], jnp.int32)
        i1 = jnp.zeros(d1.shape[:2], jnp.int32)
        return i0, i1, z, d1.sum(-1).astype(jnp.float32) * 1e-30

    lg._assign_and_filter = stub_assign
    t = timed(args.reps)
    print(f"  assignment+filter   {full - t:7.3f} (stubbed fwd {t:7.3f})",
          flush=True)
    restore()

    # --- everything stubbed except projections/reshapes (matmul skeleton)
    flash_ops.flash_sdpa = (
        lambda q, k, v, mask=None, **kw: q + k * 1e-30 + v * 1e-30
    )
    flash_cross_ops.fused_cross_attention = (
        lambda qk0, qk1, v0, v1, m0=None, m1=None, **kw:
        (qk0 + v1.mean() * 1e-30, qk1 + v0.mean() * 1e-30)
    )
    flash_ops.flash_cross_pair = flash_cross_ops.fused_cross_attention
    rotary_ops.apply_rotary = lambda enc, x: x + enc.sum() * 1e-30
    t = timed(args.reps)
    print(f"  matmul/layout skel  {t:7.3f} (all attention+rotary stubbed)",
          flush=True)
    restore()


if __name__ == "__main__":
    main()
