"""Benchmark: LightGlue matcher throughput on one TPU chip.

Prints ONE JSON line (driver contract): the headline throughput at 1024
keypoints, with the exact configuration named in the metric string. The
contract line is printed IMMEDIATELY after the headline is measured —
before any detail line — and detail lines then run best-effort under a
total wall budget (BENCH_BUDGET_S, default 600 s), each flushed to
benchmarks/bench_detail.json as it completes; per-kernel Pallas-vs-XLA
agreement goes to benchmarks/kernel_agreement.json. Rationale: round 3's
bench measured its headline but was killed by the driver's timeout before
the (then-last) contract print, losing the round's evidence (VERDICT r3).

Headline config = EXACT reference adaptive semantics (masked depth
early-exit + width pruning, lightglue.py:538-566 — no approximation): with
the synthetic-trained checkpoint (weights/synthetic_superpoint_lightglue.npz)
on the correlated workload (lightglue_tpu.train.synthetic_batch) the
confidence head exits at ~layer 3, which the lax.while_loop harvests as
real savings. Detail lines add the honest fixed floor (random weights, all
9 layers) and the two-stage compaction path — compaction survivors are
capped to a static bucket, whose accuracy cost is measured in
benchmarks/compaction_accuracy.json (scripts/compaction_accuracy.py); the
bucket/prefix used must be a >=0.99-agreement configuration.

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

import os as _os
if _os.environ.get("LG_CACHE", "1") != "0":
    from lightglue_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache(str(Path(__file__).resolve().parent) + "/.cache/xla")

BASELINE = 150.0  # RTX 3080 compiled+adaptive @1024 (reference README:132)
REPO = Path(__file__).parent
TRAINED_CKPT = REPO / "weights" / "synthetic_superpoint_lightglue.npz"


class _Watchdog:
    """Hard-exit if the TPU tunnel hangs mid-bench (a blocked PJRT call
    cannot be interrupted by signals, so a daemon thread is the only
    reliable guard). ``beat()`` after every completed line. The contract
    JSON line is printed by main() IMMEDIATELY after the headline is
    measured (round-3 lesson: printing it last lost a full round of
    evidence to the driver's timeout, VERDICT r3 item 1); once
    ``printed`` is set, any watchdog exit is rc=0 — the contract is
    already on stdout and detail lines are best-effort."""

    def __init__(self, limit_s: float = 420.0, total_limit_s: float = 900.0):
        import os
        import threading

        self.limit = float(os.environ.get("BENCH_STALL_S", limit_s))
        self.total_limit = total_limit_s
        self.t0 = time.time()
        self.t = time.time()
        self.result = None
        self.printed = False
        self.done = False
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def beat(self, result=None):
        self.t = time.time()
        if result is not None:
            self.result = result

    def _run(self):
        import os

        while not self.done:
            time.sleep(10.0)
            if self.done:
                return
            now = time.time()
            stalled = now - self.t > self.limit
            over = now - self.t0 > self.total_limit
            if not (stalled or over):
                continue
            if self.printed:  # contract already on stdout: clean exit
                print(
                    f"[bench watchdog] {'stall' if stalled else 'budget'} "
                    f"after contract line; exiting 0", file=sys.stderr,
                )
                os._exit(0)
            rec = self.result or {
                "metric": "BENCH STALLED before headline (TPU tunnel "
                          "hang?)",
                "value": 0.0, "unit": "pairs/s", "vs_baseline": 0.0,
            }
            rec = dict(rec)
            rec["metric"] += " [watchdog: bench stalled, partial result]"
            print(json.dumps(rec), flush=True)
            os._exit(2)


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


def _synthetic_inputs(m, batch, seed=0):
    """Correlated planted-correspondence workload: realistic adaptive
    behavior (early exit / pruning) under trained weights."""
    import jax

    from lightglue_tpu.train import synthetic_batch

    d = synthetic_batch(jax.random.key(seed), batch, m)
    return dict(
        kpts0=d.kpts0, kpts1=d.kpts1, desc0=d.desc0, desc1=d.desc1,
        size0=d.size0, size1=d.size1,
    )


def _load_trained():
    """Synthetic-trained checkpoint, or None (bench still runs: timing of
    the fixed path is weight-independent)."""
    if not TRAINED_CKPT.exists():
        return None
    from lightglue_tpu import weights as W

    return W.load_params(TRAINED_CKPT, dtype=np.float32)


def _pick_headline_config():
    """Choose (prefix, bucket, agreement) from the compaction-accuracy
    artifact: the FASTEST config (smallest bucket, earliest prefix) whose
    match agreement vs the exact adaptive path is >= 0.99 at 1024 kpts.
    Falls back to (1, 256, None) when the artifact is absent."""
    path = REPO / "benchmarks" / "compaction_accuracy.json"
    if not path.exists():
        return 1, 256, None
    rows = json.loads(path.read_text()).get("rows", [])
    best = None
    for r in rows:
        if r["kpts"] != 1024:
            continue
        f1 = r["agreement"]["f1"]
        if f1 < 0.99:
            continue
        cost = (r["bucket"], r["prefix"])  # smaller bucket >> earlier prefix
        if best is None or cost < (best[1], best[0]):
            best = (r["prefix"], r["bucket"], f1)
    return best if best is not None else (1, 256, None)


def _extractor_setup(extractor, k):
    """(sconf, sparams, forward, feature_preset) for a bench extractor."""
    import jax

    from lightglue_tpu.configs import (
        ALIKEDConfig, DISKConfig, SuperPointConfig,
    )

    if extractor == "superpoint":
        from lightglue_tpu.models import superpoint as sp

        sconf = SuperPointConfig(max_num_keypoints=k, mp=True, approx_topk=0.95)
        return sconf, sp.init_params(jax.random.key(1), sconf), sp.forward, \
            "superpoint"
    if extractor == "aliked":
        from lightglue_tpu.models import aliked as al

        # approx_topk as on the superpoint line: lax.approx_max_k composes
        # ~1.4 ms/img better than exact top_k in the full ALIKED forward
        # (6.96 vs 8.32 ms/img, v5e bf16 2026-08); selection may differ only
        # at the weakest detections near the k-cut (~0.998 observed recall)
        sconf = ALIKEDConfig(max_num_keypoints=k, mp=True, approx_topk=0.95)
        return sconf, al.init_params(jax.random.key(1), sconf), al.forward, \
            "aliked"
    if extractor == "disk":
        from lightglue_tpu.models import disk as dk

        sconf = DISKConfig(max_num_keypoints=k, mp=True)
        return sconf, dk.init_params(jax.random.key(1), sconf), dk.forward, \
            "disk"
    if extractor == "sift":
        from lightglue_tpu.configs import SIFTConfig
        from lightglue_tpu.models import sift_jax

        sconf = SIFTConfig(max_num_keypoints=k, backend="jax")
        return sconf, None, sift_jax.forward, "sift"
    if extractor == "doghardnet":
        from lightglue_tpu.configs import SIFTConfig
        from lightglue_tpu.models import hardnet

        sconf = SIFTConfig(max_num_keypoints=k, backend="jax")
        return sconf, hardnet.init_params(jax.random.key(1)), \
            hardnet.forward, "doghardnet"
    raise ValueError(extractor)


def _end_to_end_pairs_per_sec(extractor="superpoint", batch=8, reps=4,
                              tries=2, trained=None):
    """Single-program extract x2 + match throughput (one dispatch per
    pair-batch; the reference crosses Python between models,
    utils.py:150-165)."""
    import jax
    import jax.numpy as jnp

    from lightglue_tpu.configs import lightglue_config
    from lightglue_tpu.models import lightglue as lg

    h, w, k = 768, 1024, 1024
    sconf, sparams, efwd, feats = _extractor_setup(extractor, k)

    prefix, bucket, _ = _pick_headline_config()
    mconf = lightglue_config(
        feats, mp=True, compaction_bucket=bucket, compaction_prefix=prefix,
        cross_softmax_shift=12.0, self_softmax_shift=12.0,
    )
    if trained is not None and feats == "superpoint":
        mparams = trained
    else:
        mparams = lg.init_params(jax.random.key(0), mconf)
    rng = np.random.default_rng(2)
    img0 = jnp.asarray(rng.uniform(0, 1, (batch, h, w, 1)).astype(np.float32))
    img1 = jnp.asarray(rng.uniform(0, 1, (batch, h, w, 1)).astype(np.float32))
    size = jnp.asarray(np.tile([[float(w), float(h)]], (batch, 1)))

    def make(r):
        @jax.jit
        def chained(img0, img1, size):
            def body(carry, _):
                from lightglue_tpu.end_to_end import _scale_ori_kw

                f0 = efwd(sparams, sconf, img0 + carry * 1e-20, size)
                f1 = efwd(sparams, sconf, img1, size)
                out = lg.forward(
                    mparams, mconf,
                    kpts0=f0.keypoints, kpts1=f1.keypoints,
                    desc0=f0.descriptors, desc1=f1.descriptors,
                    size0=size, size1=size,
                    mask0=f0.valid, mask1=f1.valid,
                    **_scale_ori_kw(f0, f1),
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


def _sequence_pairs_per_sec(batch=16, reps=4, tries=2, trained=None,
                            window=1, extractor="superpoint"):
    """Extract-once sequence pipeline: B images -> windowed consecutive
    pairs per program iteration (end_to_end.make_sequence_end_to_end /
    make_windowed_sequence_end_to_end semantics; the hloc/video regime
    where each image is extracted exactly once and, at window > 1, matched
    against the ``window`` previous images — hloc sequential pairing)."""
    import jax
    import jax.numpy as jnp

    from lightglue_tpu.configs import lightglue_config
    from lightglue_tpu.models import lightglue as lg

    h, w, k = 768, 1024, 1024
    sconf, sparams, efwd, feats = _extractor_setup(extractor, k)
    # exact reference adaptive semantics (same config as the headline);
    # with trained weights the depth early-exit beats compaction outright
    mconf = lightglue_config(
        feats, mp=True,
        cross_softmax_shift=12.0, self_softmax_shift=12.0,
    )
    if trained is not None and feats == "superpoint":
        mparams = trained
    else:
        mparams = lg.init_params(jax.random.key(0), mconf)
    rng = np.random.default_rng(3)
    imgs = jnp.asarray(rng.uniform(0, 1, (batch, h, w, 1)).astype(np.float32))
    sizes = jnp.asarray(np.tile([[float(w), float(h)]], (batch, 1)))

    def extract_chunked(images, sizes, chunk=8):
        """Extraction batched at B=8: measured optimum on v5e (2.55
        ms/img; B16 regresses to 3.44 — XLA picks a worse layout)."""
        if images.shape[0] <= chunk:
            return efwd(sparams, sconf, images, sizes)
        outs = [
            efwd(sparams, sconf, images[i : i + chunk], sizes[i : i + chunk])
            for i in range(0, images.shape[0], chunk)
        ]
        return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *outs)

    from lightglue_tpu.end_to_end import sequence_window_pairs

    i0, i1 = sequence_window_pairs(batch, window)
    n_pairs = len(i0)

    def make(r):
        @jax.jit
        def chained(images, sizes):
            def body(carry, _):
                f = extract_chunked(images + carry * 1e-20, sizes)
                so = (
                    dict(scales0=f.scales[i0], oris0=f.oris[i0],
                         scales1=f.scales[i1], oris1=f.oris[i1])
                    if getattr(f, "scales", None) is not None else {}
                )
                out = lg.forward(
                    mparams, mconf,
                    kpts0=f.keypoints[i0], kpts1=f.keypoints[i1],
                    desc0=f.descriptors[i0], desc1=f.descriptors[i1],
                    size0=sizes[i0], size1=sizes[i1],
                    mask0=f.valid[i0], mask1=f.valid[i1],
                    **so,
                )
                return carry + out.matching_scores0.sum() * 1e-20, out.stop

            carry, stops = jax.lax.scan(body, jnp.float32(0.0), None, length=r)
            return stops.sum().astype(jnp.float32) + carry * 1e-20

        return chained

    def best_of(fn):
        float(fn(imgs, sizes))
        best = float("inf")
        for _ in range(tries):
            t0 = time.perf_counter()
            float(fn(imgs, sizes))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = best_of(make(reps))
    t3 = best_of(make(3 * reps))
    return n_pairs * 2 * reps / max(t3 - t1, 1e-9)


def _kernel_agreement(m=512, n=512, b=2, seed=0):
    """On-TPU Pallas-vs-XLA agreement per kernel (VERDICT r2 item 8: CI
    runs interpret-mode only; this catches Mosaic lowering regressions).
    Returns a dict written to benchmarks/kernel_agreement.json."""
    import jax
    import jax.numpy as jnp

    from lightglue_tpu.models import lightglue as lg
    from lightglue_tpu.ops import assignment as asg
    from lightglue_tpu.ops import attention as attn_ops
    from lightglue_tpu.ops import ffn as ffn_ops
    from lightglue_tpu.ops import flash as flash_ops
    from lightglue_tpu.ops import assignment_fused as fasg_ops
    from lightglue_tpu.ops import flash_cross as flash_cross_ops

    rng = np.random.default_rng(seed)
    f32 = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    q = f32(b, 4, m, 64)
    k = f32(b, 4, n, 64)
    v = f32(b, 4, n, 64)
    valid = jnp.asarray(rng.random((b, n)) > 0.1)
    # Inputs are fp32; both the Pallas kernels and the XLA reference path
    # run their matmuls through the MXU (bf16-precision passes), so the
    # maxdiffs below measure kernel-vs-XLA ORDER differences at MXU
    # precision, not fp32-vs-bf16 casting error (ADVICE r3: tag dtype).
    out = {"_inputs_dtype": "float32",
           "_note": "fp32 inputs, MXU (bf16-pass) matmuls on both sides"}

    def maxdiff(a, b_):
        return float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                     - b_.astype(jnp.float32))))

    @jax.jit
    def _run_flash():
        ref = attn_ops.sdpa(q, k, v, valid[:, None, None, :])
        got = flash_ops.flash_sdpa(q, k, v, valid)
        got_shift = flash_ops.flash_sdpa(q, k, v, valid, shift=12.0)
        return ref, got, got_shift

    ref, got, got_shift = _run_flash()
    out["flash_sdpa_vs_xla"] = maxdiff(got, ref)
    out["flash_sdpa_shift12_vs_xla"] = maxdiff(got_shift, ref)

    valid0 = jnp.asarray(rng.random((b, m)) > 0.1)

    @jax.jit
    def _run_cross():
        mask = valid0[:, None, :, None] & valid[:, None, None, :]
        r0, r1 = attn_ops.bidirectional_cross_attention(q, k, v, v, mask)
        g0, g1 = flash_cross_ops.fused_cross_attention(
            q, k, v, v, valid0, valid, shift=12.0
        )
        return r0, r1, g0, g1

    r0, r1, g0, g1 = _run_cross()
    out["fused_cross_m0_vs_xla"] = maxdiff(g0, r0)
    out["fused_cross_m1_vs_xla"] = maxdiff(g1, r1)

    d0 = f32(b, m, 256)
    d1 = f32(b, n, 256)
    la = asg.match_assignment_init(jax.random.key(3), 256)

    @jax.jit
    def _run_asg():
        scores, _ = asg.match_assignment(la, d0, d1, valid0, valid)
        rm0, rm1, rs0, rs1 = asg.filter_matches(scores, 0.1, valid0, valid)
        from lightglue_tpu import nn as _nn

        inv = 256**-0.25
        md0 = _nn.linear(la["final_proj"], d0) * inv
        md1 = _nn.linear(la["final_proj"], d1) * inv
        z0 = _nn.linear(la["matchability"], d0)[..., 0]
        z1 = _nn.linear(la["matchability"], d1)[..., 0]
        gm0, gm1, gs0, gs1 = fasg_ops.fused_filter_matches(
            md0, md1, z0, z1, 0.1, valid0, valid
        )
        return rm0, rs0, gm0, gs0

    rm0, rs0, gm0, gs0 = _run_asg()
    out["fused_assignment_index_agreement"] = float(
        jnp.mean((rm0 == gm0).astype(jnp.float32))
    )
    out["fused_assignment_score_maxdiff"] = maxdiff(gs0, rs0)

    x = f32(b, m, 256)
    msg = f32(b, m, 256)
    ffn_p = lg._ffn_init(jax.random.key(4), 256)

    @jax.jit
    def _run_ffn():
        ref = x + lg._ffn(ffn_p, jnp.concatenate([x, msg], axis=-1))
        got = ffn_ops.fused_ffn_residual(x, msg, ffn_p)
        return ref, got

    fr, fg = _run_ffn()
    out["fused_ffn_vs_xla"] = maxdiff(fg, fr)

    # whole-block fused kernels (ops/flash_self.py, ops/flash_cross_block.py)
    # vs the composed XLA blocks (flash off => sdpa + unfused FFN)
    from lightglue_tpu.configs import lightglue_config
    from lightglue_tpu.ops import flash_self as flash_self_ops
    from lightglue_tpu.ops import flash_cross_block as fcb_ops
    from lightglue_tpu.ops import rotary

    conf_off = lightglue_config(
        "superpoint", flash=False, fused_ffn=False
    )
    sb = lg._self_block_init(jax.random.key(5), 256)
    cb = lg._cross_block_init(jax.random.key(6), 256)
    kn = f32(b, m, 2) * 0.5
    enc = rotary.fourier_posenc(
        rotary.fourier_posenc_init(jax.random.key(7), 2, 64), kn
    )

    @jax.jit
    def _run_blocks():
        ref_s = lg.self_block(sb, d0, enc, conf_off, valid0)
        got_s = flash_self_ops.fused_self_block(
            sb, d0, enc, 4, valid0, shift=12.0
        )
        ref_c0, ref_c1 = lg.cross_block(cb, d0, d1, conf_off, valid0, valid)
        got_c0, got_c1 = fcb_ops.fused_cross_block(
            cb, d0, d1, 4, valid0, valid, shift=12.0
        )
        ex_c0, ex_c1 = fcb_ops.fused_cross_block(
            cb, d0, d1, 4, valid0, valid
        )
        return ref_s, got_s, ref_c0, got_c0, ref_c1, got_c1, ex_c0, ex_c1

    rs_, gs_, rc0, gc0, rc1, gc1, ec0, ec1 = _run_blocks()
    mask0f = valid0[..., None].astype(jnp.float32)
    mask1f = valid[..., None].astype(jnp.float32)
    out["fused_self_block_vs_xla"] = maxdiff(gs_ * mask0f, rs_ * mask0f)
    out["fused_cross_block_m0_vs_xla"] = maxdiff(gc0 * mask0f, rc0 * mask0f)
    out["fused_cross_block_m1_vs_xla"] = maxdiff(gc1 * mask1f, rc1 * mask1f)
    out["fused_cross_block_exact_m0_vs_xla"] = maxdiff(
        ec0 * mask0f, rc0 * mask0f
    )
    out["fused_cross_block_exact_m1_vs_xla"] = maxdiff(
        ec1 * mask1f, rc1 * mask1f
    )

    # SuperPoint fused stem (ops/stem.py) vs the XLA conv composition
    from lightglue_tpu import nn as _nn
    from lightglue_tpu.models import superpoint as _sp
    from lightglue_tpu.ops import stem as _stem

    sp_params = _sp.init_params(jax.random.key(seed))
    stem_p = {"conv1a": sp_params["conv1a"], "conv1b": sp_params["conv1b"]}
    img = jnp.asarray(rng.uniform(0, 1, (2, 128, 256, 1)).astype(np.float32))

    @jax.jit
    def _stem_pair(im):
        got = _stem.fused_stem_pallas(stem_p, im, mp=True)
        x = im.astype(jnp.bfloat16)
        x = jax.nn.relu(_nn.conv2d(stem_p["conv1a"], x))
        x = jax.nn.relu(_nn.conv2d(stem_p["conv1b"], x))
        return got.astype(jnp.float32), _nn.max_pool(x, 2).astype(jnp.float32)

    g_st, r_st = _stem_pair(img)
    out["fused_stem_vs_xla_bf16"] = maxdiff(g_st, r_st)

    # SuperPoint fused block-2 (ops/stem2.py), chained off the cplane stem
    from lightglue_tpu.ops import stem2 as _stem2

    b2_p = {"conv2a": sp_params["conv2a"], "conv2b": sp_params["conv2b"]}

    @jax.jit
    def _block2_pair(im):
        cp = _stem.fused_stem_pallas(stem_p, im, mp=True, out_layout="cplane")
        got = _stem2.fused_block2_pallas(
            b2_p, cp, h2=im.shape[1] // 2, w2=im.shape[2] // 2, mp=True
        )
        x = im.astype(jnp.bfloat16)
        x = jax.nn.relu(_nn.conv2d(stem_p["conv1a"], x))
        x = jax.nn.relu(_nn.conv2d(stem_p["conv1b"], x))
        x = _nn.max_pool(x, 2)
        x = jax.nn.relu(_nn.conv2d(b2_p["conv2a"], x))
        x = jax.nn.relu(_nn.conv2d(b2_p["conv2b"], x))
        return got.astype(jnp.float32), _nn.max_pool(x, 2).astype(jnp.float32)

    g_b2, r_b2 = _block2_pair(img)
    out["fused_block2_vs_xla_bf16"] = maxdiff(g_b2, r_b2)

    # ALIKED fused score head (cplane path) vs the XLA tapmat tail, in
    # full extract_dense_map composition (engages on TPU only)
    from lightglue_tpu.configs import ALIKEDConfig
    from lightglue_tpu.models import aliked as _ak

    ak_params = _ak.init_params(jax.random.key(8), ALIKEDConfig())
    ak_img = jnp.asarray(
        rng.uniform(0, 1, (2, 96, 128, 3)).astype(np.float32)
    ).astype(jnp.bfloat16)

    @jax.jit
    def _score_pair(im):
        _, sm_fused = _ak._dense_raw(ak_params, im, fused_score=True)
        _, sm_xla = _ak._dense_raw(ak_params, im, fused_score=False)
        return sm_fused, sm_xla

    g_sc, r_sc = _score_pair(ak_img)
    out["aliked_fused_score_vs_xla_bf16"] = maxdiff(g_sc, r_sc)
    return out


def main(M=1024, BATCH=None, REPS=8):
    import os

    import jax

    from lightglue_tpu.configs import lightglue_config
    from lightglue_tpu.models import lightglue as lg

    t_start = time.time()
    # Total wall budget for detail lines (headline is never skipped). The
    # driver kills the whole bench on ITS budget (round 3: rc=124, zero
    # output); ours must be comfortably smaller so we exit 0 ourselves.
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "600"))
    tiny = M < 512  # contract-test mode (CPU backend, no detail lines)
    # B16 beats B64 for the adaptive headline: the early-exit decision is
    # batch-pooled (reference check_if_stop semantics, lightglue.py:645-656),
    # so a larger batch exits at the depth of its hardest pairs (measured:
    # 2194 pairs/s @B16 vs 1733 @B64 on the difficulty-jittered workload)
    headline_batch = BATCH if BATCH is not None else (2 if tiny else 16)
    floor_batch = min(headline_batch, 16)
    twostage_batch = BATCH if BATCH is not None else (2 if tiny else 64)

    base = lightglue_config("superpoint", mp=True)
    rand_params = lg.init_params(jax.random.key(0), base)
    trained = None if tiny else _load_trained()
    adaptive_params = trained if trained is not None else rand_params
    workload = "synthetic-correlated" if trained is not None else "random"
    wtag = "trained" if trained is not None else "random-init"

    prefix, bucket, agreement = _pick_headline_config()
    if tiny and bucket > M // 2:  # contract mode: shrink; agreement n/a
        bucket, agreement = M // 2, None
    twostage_conf = base.replace(
        compaction_bucket=bucket, compaction_prefix=prefix,
        cross_softmax_shift=12.0, self_softmax_shift=12.0,
    )
    # headline config: EXACT reference adaptive semantics (masked depth
    # early-exit + width pruning, lightglue.py:538-566 — no compaction
    # approximation). With the synthetic-trained checkpoint the confidence
    # head exits at ~layer 3 like the paper reports, which beats the
    # compaction path outright; twostage remains a detail line for the
    # no-early-exit regime.
    headline_conf = base.replace(
        cross_softmax_shift=12.0, self_softmax_shift=12.0,
    )
    adaptive_inputs = (
        _synthetic_inputs(M, headline_batch)
        if trained is not None
        else _inputs(M, headline_batch)
    )
    detail = {}
    dog = _Watchdog(total_limit_s=budget_s + 300.0) if not tiny else None

    # Detail-line ROTATION (VERDICT r4 weak #2): when the budget runs out
    # mid-list, lines at the tail silently rotate out of the evidence. Two
    # fixes: (a) alternate which half of the detail list runs first, keyed
    # on the number of completed rounds (BENCH_r*.json files), so every
    # artifact refreshes at least every other round; (b) carry lines from
    # the previous bench_detail.json forward under "stale_lines" so a
    # skipped line's last measured value stays on the record, explicitly
    # marked stale instead of vanishing.
    rot = len(list(REPO.glob("BENCH_r*.json"))) % 2
    prev_lines = {}
    detail_path = REPO / "benchmarks" / "bench_detail.json"
    if detail_path.exists():
        try:
            _prev = json.loads(detail_path.read_text())
            prev_lines = {
                k: v for k, v in _prev.get("lines", {}).items()
                if isinstance(v, (int, float))
            }
            prev_lines.update(_prev.get("stale_lines", {}))
        except Exception:
            prev_lines = {}

    def flush_detail():
        """Write bench_detail.json after EVERY line: a later kill loses
        only the in-flight line, never completed evidence."""
        if tiny:  # contract-test mode must not clobber the real artifact
            return
        stale = {k: v for k, v in prev_lines.items() if k not in detail}
        out_dir = REPO / "benchmarks"
        out_dir.mkdir(exist_ok=True)
        detail_path.write_text(
            json.dumps(
                {"unit": "pairs/s @1024 kpts", "baseline_rtx3080": BASELINE,
                 "elapsed_s": round(time.time() - t_start, 1),
                 "rotation": ("sequence+agreement first" if rot == 0
                              else "e2e first"),
                 "lines": detail,
                 "stale_lines": stale,
                 "stale_note": ("values measured by a PREVIOUS bench run "
                                "(line skipped this run under the wall "
                                "budget; refreshed on the alternate "
                                "rotation)")},
                indent=1,
            )
        )

    # ---- headline FIRST; contract line printed the moment it exists ----
    headline = _time_forward(
        headline_conf, adaptive_params, adaptive_inputs, headline_batch,
        reps=REPS,
    )
    detail[
        f"adaptive masked bf16 B{headline_batch} ({wtag}, {workload}) "
        "(headline, exact reference semantics)"
    ] = round(headline, 1)
    result = {
        "metric": (
            f"image pairs/sec @{M} kpts — LightGlue matcher, EXACT adaptive "
            "reference semantics (masked depth early-exit + width pruning, "
            f"no compaction approximation), {wtag} weights on {workload} "
            f"workload, bf16, single-pass cross kernel, batch "
            f"{headline_batch}; fixed floor + twostage + e2e in "
            "benchmarks/bench_detail.json"
        ),
        "value": round(headline, 1),
        "unit": "pairs/s",
        "vs_baseline": round(headline / BASELINE, 2),
    }
    print(json.dumps(result), flush=True)
    if dog is not None:
        dog.printed = True
        dog.beat()
    flush_detail()
    if tiny:
        return

    # ---- detail lines: best-effort under the remaining wall budget ----
    def left():
        return budget_s - (time.time() - t_start)

    def run_line(key, fn, est=60.0):
        if left() < est:
            print(f"[bench] skip {key!r}: {left():.0f}s left < ~{est:.0f}s",
                  file=sys.stderr, flush=True)
            return
        try:
            detail[key] = round(fn(), 1)
        except Exception as e:  # informational; never kill bench
            detail[key] = f"FAIL {e}"[:200]
        dog.beat()
        flush_detail()

    # honest floor: no adaptivity, every layer at full size
    fixed = base.replace(
        depth_confidence=-1.0, width_confidence=-1.0,
        cross_softmax_shift=12.0, self_softmax_shift=12.0,
    )
    run_line(
        f"fixed bf16 B{floor_batch} (floor, no adaptivity)",
        lambda: _time_forward(fixed, rand_params, _inputs(M, floor_batch),
                              floor_batch, reps=REPS),
    )
    agree_tag = f", {agreement:.3f} agreement" if agreement else ""
    twostage_inputs = (
        _synthetic_inputs(M, twostage_batch)
        if trained is not None
        else _inputs(M, twostage_batch)
    )
    run_line(
        f"twostage compaction p{prefix} b{bucket} bf16 B{twostage_batch} "
        f"({wtag}, {workload}{agree_tag})",
        lambda: _time_forward(twostage_conf, adaptive_params,
                              twostage_inputs, twostage_batch, reps=REPS),
    )
    def _run_agreement():
        ka = _kernel_agreement()
        (REPO / "benchmarks").mkdir(exist_ok=True)
        (REPO / "benchmarks" / "kernel_agreement.json").write_text(
            json.dumps(ka, indent=1)
        )
        return 1.0  # sentinel: presence of this line = artifact refreshed

    e2e_tasks = []
    for ex, eb in (
        ("superpoint", 8), ("aliked", 8), ("disk", 8),
        ("sift", 2), ("doghardnet", 2),  # SIFT scale space is heavy
    ):
        tag = "bf16" if ex in ("superpoint", "aliked", "disk") else "fp32"
        e2e_tasks.append((
            f"end-to-end {ex}({tag}) x2 + match B{eb}",
            lambda ex=ex, eb=eb: _end_to_end_pairs_per_sec(
                ex, batch=eb, trained=trained, reps=2 if eb == 2 else 4),
            90.0 if ex in ("sift", "doghardnet") else 60.0,
        ))
    seq_tasks = [
        (key,
         lambda ex=ex, win=win: _sequence_pairs_per_sec(
             trained=trained, window=win, extractor=ex),
         60.0)
        for ex, win, key in (
            ("superpoint", 1, "sequence e2e superpoint (extract-once, "
                              "B16 imgs)"),
            ("superpoint", 4, "sequence e2e superpoint (extract-once, B16 "
                              "imgs, window 4 — hloc sequential pairing)"),
            ("disk", 4, "sequence e2e disk (extract-once, B16 imgs, "
                        "window 4)"),
            ("aliked", 4, "sequence e2e aliked (extract-once, B16 imgs, "
                          "window 4)"),
        )
    ] + [("kernel_agreement refreshed", _run_agreement, 60.0)]

    groups = [seq_tasks, e2e_tasks] if rot == 0 else [e2e_tasks, seq_tasks]
    for key, fn, est in groups[0] + groups[1]:
        run_line(key, fn, est=est)
    flush_detail()
    dog.done = True


if __name__ == "__main__":
    main()
