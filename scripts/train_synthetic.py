"""Train the matcher on synthetic correspondences and save a checkpoint.

Produces weights whose confidence/matchability heads behave
trained-realistically (see lightglue_tpu/train.py), enabling honest
evaluation of adaptive depth/width and the compaction cap
(scripts/compaction_accuracy.py, VERDICT r2 items 2 & 4).

    python scripts/train_synthetic.py --steps 1500 --batch 16 --m 512

Writes weights/synthetic_superpoint_lightglue.npz (f16-compressed) and
benchmarks/train_synthetic_history.json.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--m", type=int, default=512)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--features", default="superpoint",
                    help="matcher feature preset (sets input_dim / "
                         "add_scale_ori; configs.FEATURES)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.out is None:
        args.out = str(
            Path(__file__).parent.parent / "weights" /
            f"synthetic_{args.features}_lightglue.npz"
        )

    import jax

    from lightglue_tpu import train as T
    from lightglue_tpu import weights as W
    from lightglue_tpu.configs import lightglue_config

    print("backend:", jax.devices()[0].platform, flush=True)
    conf = lightglue_config(args.features)
    t0 = time.time()
    params, train_conf, hist = T.train_synthetic(
        conf, steps=args.steps, batch=args.batch, m=args.m, lr=args.lr,
        seed=args.seed,
    )
    dt = time.time() - t0
    print(f"trained {args.steps} steps in {dt:.1f}s", flush=True)

    out = Path(args.out)
    out.parent.mkdir(exist_ok=True)
    # f16 halves the artifact; matcher runs bf16/fp32 anyway
    flat = {
        k: np.asarray(v).astype(np.float16)
        for k, v in W.flatten_tree(jax.device_get(params)).items()
    }
    np.savez_compressed(out, **flat)
    print("saved", out, f"({out.stat().st_size/1e6:.1f} MB)")

    suffix = "" if args.features == "superpoint" else f"_{args.features}"
    hist_path = (Path(__file__).parent.parent / "benchmarks" /
                 f"train_synthetic_history{suffix}.json")
    hist_path.write_text(json.dumps(
        {"features": args.features, "steps": args.steps, "batch": args.batch,
         "m": args.m, "lr": args.lr, "seed": args.seed,
         "wall_s": round(dt, 1), "history": hist}, indent=1))
    print("history ->", hist_path)


if __name__ == "__main__":
    main()
