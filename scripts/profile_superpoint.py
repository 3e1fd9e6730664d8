"""SuperPoint stage breakdown on TPU (differential chained timing).

Levels compose progressively (each includes the previous), so stage cost =
difference between consecutive levels IN COMPOSITION — the only number
that reflects real fusion behavior (see memory: isolated stages understate).

    python scripts/profile_superpoint.py [--batch 8] [--reps 6] [--mp]
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
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--h", type=int, default=768)
    ap.add_argument("--w", type=int, default=1024)
    ap.add_argument("--k", type=int, default=1024)
    ap.add_argument("--approx", type=float, default=0.95)
    ap.add_argument("--perconv", action="store_true",
                    help="per-conv progressive encoder breakdown")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lightglue_tpu import nn
    from lightglue_tpu.configs import SuperPointConfig
    from lightglue_tpu.models import superpoint as sp
    from lightglue_tpu.ops.sampling import simple_nms, top_k_keypoints

    conf = SuperPointConfig(
        max_num_keypoints=args.k, mp=not args.fp32, approx_topk=args.approx
    )
    params = sp.init_params(jax.random.key(0), conf)
    rng = np.random.default_rng(1)
    img = jnp.asarray(
        rng.uniform(0, 1, (args.batch, args.h, args.w, 1)).astype(np.float32)
    )
    size = jnp.asarray(
        np.tile([[float(args.w), float(args.h)]], (args.batch, 1))
    )

    def encoder_only(image):
        x = image.astype(jnp.bfloat16) if conf.mp else image
        for name in ("conv1a", "conv1b"):
            x = jax.nn.relu(nn.conv2d(params[name], x))
        x = nn.max_pool(x, 2)
        for name in ("conv2a", "conv2b"):
            x = jax.nn.relu(nn.conv2d(params[name], x))
        x = nn.max_pool(x, 2)
        for name in ("conv3a", "conv3b"):
            x = jax.nn.relu(nn.conv2d(params[name], x))
        x = nn.max_pool(x, 2)
        for name in ("conv4a", "conv4b"):
            x = jax.nn.relu(nn.conv2d(params[name], x))
        return x

    def lvl_encoder(image):
        return encoder_only(image).astype(jnp.float32).sum()

    def lvl_dense(image):
        s, d = sp.dense_forward(params, image, mp=conf.mp)
        return s.sum() + d.sum()

    def lvl_nms(image):
        s, d = sp.dense_forward(params, image, mp=conf.mp)
        s, d = jax.lax.optimization_barrier((s, d))
        s = simple_nms(s, conf.nms_radius)
        return s.sum() + d.sum()

    def lvl_topk(image):
        s, d = sp.dense_forward(params, image, mp=conf.mp)
        s, d = jax.lax.optimization_barrier((s, d))
        s = simple_nms(s, conf.nms_radius)
        kpts, ks, valid = top_k_keypoints(
            s, conf.max_num_keypoints, conf.detection_threshold,
            approx_recall=conf.approx_topk,
        )
        return kpts.sum() + ks.sum() + d.sum()

    def lvl_full(image):
        f = sp.forward(params, conf, image, size)
        return (
            f.keypoints.sum() + f.keypoint_scores.sum() + f.descriptors.sum()
        )

    levels = [
        ("encoder (8 convs)", lvl_encoder),
        ("+ heads (softmax/shuffle/l2)", lvl_dense),
        ("+ simple_nms", lvl_nms),
        ("+ top_k", lvl_topk),
        ("+ border/sample/full fwd", lvl_full),
    ]

    def timed(fn, reps):
        @jax.jit
        def chained(image):
            def body(c, _):
                return c + fn(image + c * 1e-24) * 1e-20, None

            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=reps)
            return c

        def best():
            float(chained(img))
            b = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(chained(img))
                b = min(b, time.perf_counter() - t0)
            return b

        t1 = best()

        @jax.jit
        def chained3(image):
            def body(c, _):
                return c + fn(image + c * 1e-24) * 1e-20, None

            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=3 * reps)
            return c

        def best3():
            float(chained3(img))
            b = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(chained3(img))
                b = min(b, time.perf_counter() - t0)
            return b

        t3 = best3()
        return (t3 - t1) / (2 * reps) / args.batch * 1000  # ms per image

    if args.perconv:
        # progressive prefixes of the encoder: delta between consecutive
        # rows = marginal cost of that conv IN COMPOSITION
        plan = [
            ("conv1a", False), ("conv1b", False), ("pool1", True),
            ("conv2a", False), ("conv2b", False), ("pool2", True),
            ("conv3a", False), ("conv3b", False), ("pool3", True),
            ("conv4a", False), ("conv4b", False),
        ]

        def make_prefix(n_steps):
            def fn(image):
                x = image.astype(jnp.bfloat16) if conf.mp else image
                for name, is_pool in plan[:n_steps]:
                    if is_pool:
                        x = nn.max_pool(x, 2)
                    else:
                        x = jax.nn.relu(nn.conv2d(params[name], x))
                return x.astype(jnp.float32).sum()

            return fn

        levels = [
            (plan[n - 1][0], make_prefix(n)) for n in range(1, len(plan) + 1)
        ]

    prev = 0.0
    print(f"B={args.batch} {args.h}x{args.w} mp={conf.mp} "
          f"approx={conf.approx_topk}", flush=True)
    for name, fn in levels:
        ms = timed(fn, args.reps)
        print(f"{name:32s} {ms:7.3f} ms/img  (delta {ms - prev:+7.3f})",
              flush=True)
        prev = ms


if __name__ == "__main__":
    main()
