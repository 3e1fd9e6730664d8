"""DISK + SuperPoint extractor timing on the real TPU (differential chained
timing; see profile_aliked.py). Writes benchmarks/extractors.json.

Usage: python scripts/profile_disk.py [H W K]
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

import os as _os
if _os.environ.get("LG_CACHE", "1") != "0":
    from lightglue_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache(str(Path(__file__).resolve().parent.parent) + "/.cache/xla")

from lightglue_tpu.configs import DISKConfig, SuperPointConfig
from lightglue_tpu.models import disk, superpoint


def timed(fn, *args, reps=8, tries=3):
    def run(r):
        @jax.jit
        def chained(*a):
            def body(c, _):
                return fn(*a, c), None

            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=r)
            return c

        float(chained(*args))
        best = float("inf")
        for _ in range(tries):
            t0 = time.perf_counter()
            float(chained(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t3 = run(reps), run(3 * reps)
    return (t3 - t1) / (2 * reps) * 1e3


def main():
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 768
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (1, h, w, 3)).astype(np.float32))
    img1 = img[..., :1]
    size = jnp.asarray([[float(w), float(h)]])
    res = {"image": f"{w}x{h}", "kpts": k,
           "unit": "ms/image (differential chained timing, v5e)"}

    for name, conf in [
        ("disk_fp32", DISKConfig(max_num_keypoints=k)),
        # NOTE approx_topk measured as a pessimization for full-res top-k
        # (same finding as ALIKED): keep exact top_k in the prod config
        ("disk_bf16", DISKConfig(max_num_keypoints=k, mp=True)),
    ]:
        params = disk.init_params(jax.random.key(0), conf)

        def f(image, size_, c, params=params, conf=conf):
            out = disk.forward(params, conf, image + c * 1e-20, size_)
            return (c + out.descriptors.sum().astype(jnp.float32) * 1e-20
                    + out.keypoints.sum().astype(jnp.float32) * 1e-20)

        t = timed(f, img, size)
        print(f"{name:18s}: {t:7.2f} ms")
        res[name] = round(t, 2)

    for name, conf in [
        ("superpoint_fp32", SuperPointConfig(max_num_keypoints=k)),
        ("superpoint_bf16_approx", SuperPointConfig(
            max_num_keypoints=k, mp=True, approx_topk=0.95)),
    ]:
        params = superpoint.init_params(jax.random.key(1), conf)

        def f(image, size_, c, params=params, conf=conf):
            out = superpoint.forward(params, conf, image + c * 1e-20, size_)
            return (c + out.descriptors.sum().astype(jnp.float32) * 1e-20
                    + out.keypoints.sum().astype(jnp.float32) * 1e-20)

        t = timed(f, img1, size)
        print(f"{name:18s}: {t:7.2f} ms")
        res[name] = round(t, 2)

    out = Path(__file__).parent.parent / "benchmarks" / "extractors.json"
    out.write_text(json.dumps(res, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
