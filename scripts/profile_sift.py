"""JAX SIFT (+ HardNet) timing on the real TPU (differential chained
timing). Writes benchmarks/sift_hardnet.json.

Usage: python scripts/profile_sift.py [H W K]
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

from lightglue_tpu.configs import SIFTConfig
from lightglue_tpu.models import sift_jax


def timed(fn, *args, reps=4, tries=3):
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
    gray = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
    conf = SIFTConfig(max_num_keypoints=k)

    def f(g, c):
        out = sift_jax.extract_single(g + c * 1e-20, conf)
        return (c + out["descriptors"].sum() * 1e-20
                + out["keypoints"].sum() * 1e-20)

    t = timed(f, gray)
    print(f"sift_jax extract   : {t:8.2f} ms")
    res = {"image": f"{w}x{h}", "kpts": k,
           "unit": "ms/image (differential chained timing, v5e)",
           "sift_jax": round(t, 2)}

    from lightglue_tpu.models import hardnet

    hp = hardnet.init_params(jax.random.key(0))
    patches = jnp.asarray(
        rng.standard_normal((k, 32, 32, 1)).astype(np.float32)
    )

    def hn(x, c):
        d = hardnet.describe_patches(hp, x + c * 1e-20)
        return c + d.sum() * 1e-20

    th = timed(hn, patches)
    print(f"hardnet {k} patches: {th:8.2f} ms")
    res["hardnet_patches"] = round(th, 2)

    kpts = jnp.asarray(rng.uniform(20, min(h, w) - 20, (k, 2)).astype(np.float32))
    scl = jnp.asarray(rng.uniform(2, 8, (k,)).astype(np.float32))
    ori = jnp.asarray(rng.uniform(0, 6.28, (k,)).astype(np.float32))

    def laf(im, c):
        p_ = hardnet.extract_laf_patches(im + c * 1e-20, kpts, scl, ori, 32)
        return c + p_.sum() * 1e-20

    tl = timed(laf, gray)
    print(f"laf patches {k}    : {tl:8.2f} ms")
    res["laf_patches"] = round(tl, 2)
    out = Path(__file__).parent.parent / "benchmarks" / "sift_hardnet.json"
    out.write_text(json.dumps(res, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__" and "--stages" not in sys.argv and "--stages2" not in sys.argv and "--octaves" not in sys.argv and "--bisect" not in sys.argv:
    main()


def stages():
    h, w, k = 768, 1024, 1024
    rng = np.random.default_rng(0)
    gray = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
    conf = SIFTConfig(max_num_keypoints=k)

    def pyr(g, c):
        gs, ds, n = sift_jax.build_pyramid(g + c * 1e-20, conf)
        acc = c
        for o in range(n):
            acc = acc + ds[o][0].sum() * 1e-20 + gs[o][0].sum() * 1e-20
        return acc

    print(f"build_pyramid      : {timed(pyr, gray, reps=2):8.2f} ms")

    def blur_top(g, c):
        up = sift_jax._upsample2(g + c * 1e-20)
        y = sift_jax._gaussian_blur(up * 255.0, 1.2)
        return c + y.sum() * 1e-20

    print(f"upsample+1 blur top: {timed(blur_top, gray, reps=2):8.2f} ms")

    def blur_one(g, c):
        y = sift_jax._gaussian_blur((g + c * 1e-20) * 255.0, 1.6)
        return c + y.sum() * 1e-20

    print(f"one blur @1024x768 : {timed(blur_one, gray, reps=2):8.2f} ms")


if "--stages" in sys.argv:
    stages()


def stages2():
    import math
    h, w, k = 768, 1024, 1024
    rng = np.random.default_rng(0)
    conf = SIFTConfig(max_num_keypoints=k)
    s = conf.num_scales_per_octave
    # octave 0 shapes (first_octave=-1: doubled)
    H, W = 2 * h, 2 * w
    L = s + 2
    dog = jnp.asarray(rng.standard_normal((L, H, W)).astype(np.float32))
    gauss = jnp.asarray(rng.standard_normal((s + 3, H, W)).astype(np.float32))
    n_cand = 4 * k
    thr = float(math.floor(0.5 * conf.detection_threshold / s * 255.0))

    def extrema(d, c):
        li, yi, xi, valid = sift_jax._extrema_candidates(d + c * 1e-20, n_cand, thr)
        return c + li.sum() * 1e-20 + yi.sum() * 1e-20

    print(f"extrema cands o0   : {timed(extrema, dog, reps=2):8.2f} ms")

    li = jnp.asarray(rng.integers(1, L - 1, n_cand).astype(np.int32))
    yi = jnp.asarray(rng.integers(5, H - 5, n_cand).astype(np.int32))
    xi = jnp.asarray(rng.integers(5, W - 5, n_cand).astype(np.int32))
    valid = jnp.ones((n_cand,), bool)

    def refine(d, c):
        fl, fy, fx, resp, v = sift_jax._refine(d + c * 1e-20, li, yi, xi, valid, conf)
        return c + fl.sum() * 1e-20 + resp.sum() * 1e-20

    print(f"refine o0          : {timed(refine, dog, reps=2):8.2f} ms")

    def grads(g, c):
        mags, oris = jax.vmap(sift_jax._gradients)(g + c * 1e-20)
        return c + mags.sum() * 1e-20 + oris.sum() * 1e-20

    print(f"gradients o0       : {timed(grads, gauss, reps=2):8.2f} ms")

    mags, oris = jax.jit(jax.vmap(sift_jax._gradients))(gauss)
    nk = k
    lg_idx = jnp.asarray(rng.integers(0, s + 3, nk).astype(np.int32))
    fy = jnp.asarray(rng.uniform(20, H - 20, nk).astype(np.float32))
    fx = jnp.asarray(rng.uniform(20, W - 20, nk).astype(np.float32))
    sig = jnp.asarray(rng.uniform(1.0, 3.0, nk).astype(np.float32))

    def ori(m_, o_, c):
        hist = sift_jax._orientation_hist(m_ + c * 1e-20, o_, lg_idx, fy, fx, sig)
        return c + hist.sum() * 1e-20

    print(f"orientation o0 (1k): {timed(ori, mags, oris, reps=2):8.2f} ms")

    ang = jnp.asarray(rng.uniform(0, 6.28, nk * sift_jax.MAX_ORI).astype(np.float32))

    def desc(m_, o_, c):
        rep = lambda vv: jnp.repeat(vv, sift_jax.MAX_ORI, axis=0)
        d_ = sift_jax._descriptors(
            m_ + c * 1e-20, o_, rep(lg_idx), rep(fy), rep(fx), rep(sig), ang
        )
        return c + d_.sum() * 1e-20

    print(f"descriptors o0(4k) : {timed(desc, mags, oris, reps=2):8.2f} ms")


if "--stages2" in sys.argv:
    stages2()


def octave_ab():
    h, w, k = 768, 1024, 1024
    rng = np.random.default_rng(0)
    gray = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
    for fo in (-1, 0, 1):
        conf = SIFTConfig(max_num_keypoints=k, first_octave=fo)

        def f(g, c, conf=conf):
            out = sift_jax.extract_single(g + c * 1e-20, conf)
            return (c + out["descriptors"].sum() * 1e-20
                    + out["keypoints"].sum() * 1e-20)

        print(f"first_octave={fo:2d}    : {timed(f, gray, reps=2):8.2f} ms")


if "--octaves" in sys.argv:
    octave_ab()


def compose_bisect():
    import math
    h, w, k = 768, 1024, 1024
    rng = np.random.default_rng(0)
    gray = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
    conf = SIFTConfig(max_num_keypoints=k)
    s = conf.num_scales_per_octave
    thr = float(math.floor(0.5 * conf.detection_threshold / s * 255.0))

    def make(level):
        def f(g, c):
            gaussians, dogs, n_oct = sift_jax.build_pyramid(g + c * 1e-20, conf)
            acc = c
            for o in range(n_oct):
                n_cand = max(256, (4 * k) >> o)
                dog_stack = jax.lax.optimization_barrier(jnp.stack(dogs[o]))
                if level == 1:
                    acc += dog_stack.sum() * 1e-20
                    continue
                li, yi, xi, valid = sift_jax._extrema_candidates(
                    dog_stack, n_cand, thr)
                if level == 2:
                    acc += li.sum() * 1e-20 + xi.sum() * 1e-20
                    continue
                fl, fy, fx, resp, valid = sift_jax._refine(
                    dog_stack, li, yi, xi, valid, conf)
                if level == 3:
                    acc += fl.sum() * 1e-20 + resp.sum() * 1e-20
                    continue
                if n_cand > k:
                    _, keep = jax.lax.top_k(jnp.where(valid, resp, -1.0), k)
                    li, fl, fy, fx, resp, valid = (
                        a[keep] for a in (li, fl, fy, fx, resp, valid))
                    n_cand = k
                sigma_rel = sift_jax.SIGMA0 * (2.0 ** (fl / s))
                lg_idx = jnp.clip(jnp.round(fl).astype(jnp.int32), 0, s + 2)
                gl = jnp.stack(gaussians[o])
                mags, oris_map = jax.lax.optimization_barrier(
                    jax.vmap(sift_jax._gradients)(gl))
                hist = sift_jax._orientation_hist(
                    mags, oris_map, lg_idx, fy, fx, sigma_rel)
                angles, aok = sift_jax._hist_peaks(hist)
                if level == 4:
                    acc += angles.sum() * 1e-20
                    continue
                rep = lambda v: jnp.repeat(v, sift_jax.MAX_ORI, axis=0)
                descs = sift_jax._descriptors(
                    mags, oris_map, rep(lg_idx), rep(fy), rep(fx),
                    rep(sigma_rel), angles.reshape(-1))
                acc += descs.sum() * 1e-20
            return acc
        return f

    for level in (1, 2, 3, 4, 5):
        print(f"level {level}           : {timed(make(level), gray, reps=2):8.2f} ms")


if "--bisect" in sys.argv:
    compose_bisect()
