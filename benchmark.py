"""Benchmark CLI mirroring the reference benchmark.py (sweep, table, plot).

Measures LightGlue matcher latency/throughput across keypoint counts on an
easy pair (DSC_0410/0411) and a difficult pair (sacre_coeur), for the
full (non-adaptive) and adaptive configurations, fp32 and bf16.

Timing: work is chained inside one device program (lax.scan with a data
dependency) and ends with a host value fetch — see
.claude/skills/verify/SKILL.md for why plain block_until_ready is not
trustworthy through the TPU tunnel.
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import numpy as np


def measure_chained(fwd_builder, args_dict, repeat: int = 8) -> float:
    """Build a chained-scan runner and return seconds per iteration."""
    import jax

    run = fwd_builder(repeat)
    _ = float(run(**args_dict))  # compile + warmup (host fetch)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        _ = float(run(**args_dict))
        best = min(best, time.time() - t0)
    return best / repeat


def main():
    import jax
    import jax.numpy as jnp

    from lightglue_tpu.configs import lightglue_config
    from lightglue_tpu.models import lightglue as lg
    from lightglue_tpu.models import superpoint as sp_model
    from lightglue_tpu.pipeline import SuperPoint
    from lightglue_tpu.utils.image import load_image

    parser = argparse.ArgumentParser()
    parser.add_argument("--num_keypoints", nargs="+", type=int,
                        default=[256, 512, 1024, 2048, 4096])
    parser.add_argument("--batch", type=int, default=1,
                        help="pairs per step (throughput mode)")
    parser.add_argument("--repeat", type=int, default=8)
    parser.add_argument("--save", type=str, default=None,
                        help="path to save the plot")
    parser.add_argument("--no_real_features", action="store_true",
                        help="use random features instead of SuperPoint")
    args = parser.parse_args()

    assets = Path("/root/reference/assets")
    pairs = {
        "easy": (assets / "DSC_0410.JPG", assets / "DSC_0411.JPG"),
        "difficult": (assets / "sacre_coeur1.jpg", assets / "sacre_coeur2.jpg"),
    }

    configs = {
        "LightGlue-full-fp32": dict(depth_confidence=-1.0, width_confidence=-1.0),
        "LightGlue-full-bf16": dict(depth_confidence=-1.0, width_confidence=-1.0, mp=True),
        "LightGlue-adaptive-bf16": dict(mp=True),
    }

    extractor = None
    if not args.no_real_features and max(args.num_keypoints) <= 4096:
        extractor = SuperPoint(max_num_keypoints=max(args.num_keypoints),
                               detection_threshold=-1.0)

    results = {}
    for name, conf_kw in configs.items():
        conf = lightglue_config("superpoint", **conf_kw)
        params = lg.init_params(jax.random.key(0), conf)
        per_pair = {}
        for pair_name, (p0, p1) in pairs.items():
            times = []
            for num_kpts in args.num_keypoints:
                b = args.batch
                if extractor is not None:
                    f0 = extractor.extract(load_image(p0))
                    f1 = extractor.extract(load_image(p1))
                    k0 = np.tile(f0["keypoints"][:, :num_kpts], (b, 1, 1))
                    k1 = np.tile(f1["keypoints"][:, :num_kpts], (b, 1, 1))
                    d0 = np.tile(f0["descriptors"][:, :num_kpts], (b, 1, 1))
                    d1 = np.tile(f1["descriptors"][:, :num_kpts], (b, 1, 1))
                    s0 = np.tile(f0["image_size"], (b, 1))
                    s1 = np.tile(f1["image_size"], (b, 1))
                else:
                    rng = np.random.default_rng(0)
                    k0 = rng.uniform(0, 1024, (b, num_kpts, 2)).astype(np.float32)
                    k1 = rng.uniform(0, 768, (b, num_kpts, 2)).astype(np.float32)
                    d0 = rng.standard_normal((b, num_kpts, 256)).astype(np.float32)
                    d1 = rng.standard_normal((b, num_kpts, 256)).astype(np.float32)
                    s0 = np.tile([[1024.0, 768.0]], (b, 1)).astype(np.float32)
                    s1 = np.tile([[800.0, 600.0]], (b, 1)).astype(np.float32)

                inputs = dict(
                    kpts0=jnp.asarray(k0), kpts1=jnp.asarray(k1),
                    desc0=jnp.asarray(d0), desc1=jnp.asarray(d1),
                    size0=jnp.asarray(s0), size1=jnp.asarray(s1),
                )

                def builder(reps, conf=conf, params=params):
                    @jax.jit
                    def run(kpts0, kpts1, desc0, desc1, size0, size1):
                        def body(c, _):
                            out = lg.forward(
                                params, conf, kpts0=kpts0, kpts1=kpts1,
                                desc0=c, desc1=desc1, size0=size0, size1=size1,
                            )
                            return c + out.matching_scores0.sum() * 1e-20, ()
                        c, _ = jax.lax.scan(body, desc0, None, length=reps)
                        return c.sum()
                    return run

                dt = measure_chained(builder, inputs, args.repeat)
                times.append(dt * 1000 / b)
            per_pair[pair_name] = times
        results[name] = per_pair
        for pair_name, times in per_pair.items():
            tstr = " ".join(f"{t:6.2f}" for t in times)
            print(f"{name:26s} {pair_name:10s} ms/pair: {tstr}")

    header = " ".join(f"{k:6d}" for k in args.num_keypoints)
    print(f"{'(keypoints)':38s}        {header}")

    if args.save:
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 2, figsize=(10, 4), sharey=True)
        for ax, pair_name in zip(axes, pairs):
            for name, per_pair in results.items():
                ax.plot(args.num_keypoints, per_pair[pair_name],
                        marker="o", label=name)
            ax.set_xscale("log", base=2)
            ax.set_yscale("log")
            ax.set_title(pair_name)
            ax.set_xlabel("# keypoints")
            ax.grid(alpha=0.3)
        axes[0].set_ylabel("ms / pair")
        axes[0].legend(fontsize=7)
        fig.tight_layout()
        fig.savefig(args.save, dpi=150)
        print(f"saved plot to {args.save}")


if __name__ == "__main__":
    main()
