"""Measure the accuracy cost of two-stage compaction's survivor cap.

VERDICT r2 item 2: the headline bench config compacts pruning survivors
into a static bucket mid-network (models/lightglue.py::
forward_adaptive_twostage); if more survive than fit, the overflow (least
matchable first) is dropped — unlike the reference, whose pruning never
drops unpruned points (reference lightglue.py:636-643). This script
quantifies that: on synthetic-trained weights (scripts/train_synthetic.py)
and held-out synthetic pairs it compares the compacted path against the
EXACT masked adaptive path and reports

* agreement: precision/recall of (i -> j) matches vs the masked path,
* gt_precision/gt_recall of both paths vs planted ground truth,
* survivor statistics after the prefix (how full the bucket runs).

    python scripts/compaction_accuracy.py \
        [--weights weights/synthetic_superpoint_lightglue.npz] \
        [--kpts 1024 2048] [--buckets 256 384 512] [--prefix 1 3]

Writes benchmarks/compaction_accuracy.json.
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

REPO = Path(__file__).parent.parent


def pair_set(m0):
    """(M,) matches0 row -> set of (i, j) matched pairs."""
    return {(i, int(j)) for i, j in enumerate(m0) if j >= 0}


def agreement(m0_test: np.ndarray, m0_ref: np.ndarray):
    """Precision/recall of test matches vs reference matches, pooled over
    the batch."""
    tp = fp = fn = 0
    for t, r in zip(m0_test, m0_ref):
        ts, rs = pair_set(t), pair_set(r)
        tp += len(ts & rs)
        fp += len(ts - rs)
        fn += len(rs - ts)
    prec = tp / max(tp + fp, 1)
    rec = tp / max(tp + fn, 1)
    f1 = 2 * prec * rec / max(prec + rec, 1e-9)
    return {"precision": round(prec, 4), "recall": round(rec, 4),
            "f1": round(f1, 4)}


def gt_scores(m0: np.ndarray, gt: np.ndarray):
    pred = m0 >= 0
    correct = (m0 == gt) & pred & (gt >= 0)
    prec = correct.sum() / max(pred.sum(), 1)
    rec = correct.sum() / max((gt >= 0).sum(), 1)
    return {"gt_precision": round(float(prec), 4),
            "gt_recall": round(float(rec), 4)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights",
                    default=str(REPO / "weights" / "synthetic_superpoint_lightglue.npz"))
    ap.add_argument("--kpts", type=int, nargs="+", default=[1024, 2048])
    ap.add_argument("--buckets", type=int, nargs="+", default=[256, 384, 512])
    ap.add_argument("--prefix", type=int, nargs="+", default=[1, 3])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--out", default=str(REPO / "benchmarks" / "compaction_accuracy.json"))
    args = ap.parse_args()

    import jax

    from lightglue_tpu import train as T
    from lightglue_tpu import weights as W
    from lightglue_tpu.configs import lightglue_config
    from lightglue_tpu.models import lightglue as lg

    wpath = Path(args.weights)
    if wpath.exists():
        params = W.load_params(wpath, dtype=np.float32)
        weights_kind = wpath.name
    else:
        print(f"WARNING: {wpath} missing - falling back to random init "
              "(adaptive behavior unrepresentative; run "
              "scripts/train_synthetic.py first)", file=sys.stderr)
        params = lg.init_params(jax.random.key(0),
                                lightglue_config("superpoint"))
        weights_kind = "random-init"

    base = lightglue_config("superpoint")  # default adaptive confidences
    masked_fwd = jax.jit(lg.forward_adaptive, static_argnames=("conf",))
    two_fwd = jax.jit(
        lg.forward_adaptive_twostage,
        static_argnames=("conf", "n_prefix", "bucket"),
    )
    prefix_fwd = jax.jit(lg.forward_prefix, static_argnames=("conf", "n_prefix"))

    results = []
    for m in args.kpts:
        batches = [
            T.synthetic_batch(jax.random.key(1000 + s), args.batch, m)
            for s in range(args.seeds)
        ]
        # exact masked reference path per batch
        refs = []
        for data in batches:
            out = masked_fwd(
                params, base,
                kpts0=data.kpts0, kpts1=data.kpts1,
                desc0=data.desc0, desc1=data.desc1,
                size0=data.size0, size1=data.size1,
            )
            refs.append(np.asarray(out.matches0))
        for n_prefix in args.prefix:
            # survivor occupancy after this prefix
            surv = []
            for data in batches:
                st = prefix_fwd(
                    params, base, n_prefix,
                    data.kpts0, data.kpts1, data.desc0, data.desc1,
                    data.size0, data.size1,
                )
                surv.append(np.asarray(st.act0).sum(1))
                surv.append(np.asarray(st.act1).sum(1))
            surv = np.concatenate(surv)
            for bucket in args.buckets:
                if bucket >= m:
                    continue
                agg_t, agg_r, gt_t, gt_r = [], [], [], []
                for data, ref in zip(batches, refs):
                    out = two_fwd(
                        params, base, n_prefix, bucket,
                        data.kpts0, data.kpts1, data.desc0, data.desc1,
                        data.size0, data.size1,
                    )
                    m0 = np.asarray(out.matches0)
                    agg_t.append(m0)
                    agg_r.append(ref)
                    gt = np.asarray(data.gt_matches0)
                    gt_t.append(gt_scores(m0, gt))
                    gt_r.append(gt_scores(ref, gt))
                m0_all = np.concatenate(agg_t)
                ref_all = np.concatenate(agg_r)
                row = {
                    "kpts": m, "prefix": n_prefix, "bucket": bucket,
                    "survivors_mean": round(float(surv.mean()), 1),
                    "survivors_p95": round(float(np.percentile(surv, 95)), 1),
                    "overflow_frac": round(float((surv > bucket).mean()), 3),
                    "agreement": agreement(m0_all, ref_all),
                    "compacted": {
                        k: round(float(np.mean([d[k] for d in gt_t])), 4)
                        for k in gt_t[0]
                    },
                    "exact_masked": {
                        k: round(float(np.mean([d[k] for d in gt_r])), 4)
                        for k in gt_r[0]
                    },
                }
                results.append(row)
                print(json.dumps(row), flush=True)

    out_path = Path(args.out)
    out_path.parent.mkdir(exist_ok=True)
    out_path.write_text(json.dumps(
        {"weights": weights_kind, "batch": args.batch, "seeds": args.seeds,
         "workload": "lightglue_tpu.train.synthetic_batch difficulty-jittered",
         "note": ("agreement = compacted vs exact masked adaptive path "
                  "(reference semantics); gt_* = vs planted correspondences"),
         "rows": results}, indent=1))
    print("->", out_path)


if __name__ == "__main__":
    main()
