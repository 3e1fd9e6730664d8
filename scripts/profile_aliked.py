"""ALIKED stage breakdown on the real TPU (tunnel-truthful timing).

Times each stage by chaining it `reps` times inside one jit (lax.scan with a
data dependency) and fetching a host value at the end — block_until_ready is
unreliable through the axon tunnel (see CLAUDE.md).

Usage: python scripts/profile_aliked.py [H W K]
"""

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

from lightglue_tpu.configs import ALIKEDConfig
from lightglue_tpu.models import aliked


def timed(fn, *args, reps=8, tries=3):
    """Differential chained timing: marginal ms/call between reps and 3*reps
    chains, cancelling the ~2 ms fixed dispatch+fetch overhead of the axon
    tunnel (measured via an empty-body chain)."""

    def run(r):
        @jax.jit
        def chained(*a):
            def body(carry, _):
                out = fn(*a, carry)
                return out, None

            out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=r)
            return out

        float(chained(*args))
        best = float("inf")
        for _ in range(tries):
            t0 = time.perf_counter()
            float(chained(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t3 = run(reps), run(3 * reps)
    return (t3 - t1) / (2 * reps) * 1e3  # marginal ms per call


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    prod_only = "--prod" in sys.argv or "--b4" in sys.argv
    h = int(args[0]) if len(args) > 0 else 768
    w = int(args[1]) if len(args) > 1 else 1024
    k = int(args[2]) if len(args) > 2 else 1024

    conf = ALIKEDConfig(max_num_keypoints=k, mp=True)
    params = aliked.init_params(jax.random.key(0), conf)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (1, h, w, 3)).astype(np.float32))
    img_bf = img.astype(jnp.bfloat16) if conf.mp else img
    size = jnp.asarray([[float(w), float(h)]])

    if prod_only:
        _prod_stages(params, conf, img, size, h, w, k, rng)
        return

    stages = {}

    def rec(name, val):
        stages[name] = round(val, 2)
        print(f"{name:19s}: {val:8.2f} ms")

    # --- full forward
    def full(image, size, c):
        f = aliked.forward(params, conf, image + c * 1e-20, size)
        return c + f.descriptors.sum().astype(jnp.float32) * 1e-20 + f.keypoints.sum().astype(jnp.float32) * 1e-20

    rec("full_forward", timed(full, img, size))

    # --- dense map (encoder + aggregation + score head + l2norm)
    def dense(image, c):
        fm, sm = aliked.extract_dense_map(params, image + c.astype(image.dtype) * 1e-20)
        return c + fm.sum().astype(jnp.float32) * 1e-20 + sm.sum().astype(jnp.float32) * 1e-20

    rec("extract_dense_map", timed(dense, img_bf))

    # --- encoder blocks only
    def enc(image, c):
        x1 = aliked._conv_block(params["block1"], image + c.astype(image.dtype) * 1e-20)
        x2 = aliked._res_block(params["block2"], aliked._avg_pool(x1, 2), False)
        x3 = aliked._res_block(params["block3"], aliked._avg_pool(x2, 4), True)
        x4 = aliked._res_block(params["block4"], aliked._avg_pool(x3, 4), True)
        return (c + x1.sum().astype(jnp.float32) * 1e-20
                + x2.sum().astype(jnp.float32) * 1e-20
                + x3.sum().astype(jnp.float32) * 1e-20
                + x4.sum().astype(jnp.float32) * 1e-20)

    rec("encoder_b1_b4", timed(enc, img_bf))

    # --- block3 deform res block alone (dominant round-1 cost)
    x2_shape = (1, h // 8, w // 8, {"aliked-n16": 32}.get(conf.model_name, 32))
    x2v = jnp.asarray(
        rng.standard_normal(x2_shape).astype(np.float32)
    ).astype(img_bf.dtype)

    def b3(x, c):
        y = aliked._res_block(params["block3"], x + c.astype(x.dtype) * 1e-20, True)
        return c + y.sum().astype(jnp.float32) * 1e-20

    rec("block3_deform", timed(b3, x2v))

    x3_shape = (1, h // 32, w // 32, 64)
    x3v = jnp.asarray(
        rng.standard_normal(x3_shape).astype(np.float32)
    ).astype(img_bf.dtype)

    def b4(x, c):
        y = aliked._res_block(params["block4"], x + c.astype(x.dtype) * 1e-20, True)
        return c + y.sum().astype(jnp.float32) * 1e-20

    rec("block4_deform", timed(b4, x3v))

    # --- aggregation (conv1-4 + upsample + concat) and score head, isolated
    def agg(image, c):
        x1 = aliked._conv_block(params["block1"], image + c.astype(image.dtype) * 1e-20)
        x2 = aliked._res_block(params["block2"], aliked._avg_pool(x1, 2), False)
        x3 = aliked._res_block(params["block3"], aliked._avg_pool(x2, 4), True)
        x4 = aliked._res_block(params["block4"], aliked._avg_pool(x3, 4), True)
        x1 = aliked.selu(aliked.nn.conv2d(params["conv1"], x1))
        x2 = aliked.selu(aliked.nn.conv2d(params["conv2"], x2))
        x3 = aliked.selu(aliked.nn.conv2d(params["conv3"], x3))
        x4 = aliked.selu(aliked.nn.conv2d(params["conv4"], x4))
        import jax.numpy as jnp2
        x1234 = jnp2.concatenate(
            [x1, aliked._upsample(x2, 2), aliked._upsample(x3, 8),
             aliked._upsample(x4, 32)], axis=-1
        )
        return c + x1234.sum().astype(jnp.float32) * 1e-20

    rec("enc_plus_agg", timed(agg, img_bf))

    dim = 128 if conf.model_name != "aliked-t16" else 64
    x1234v = jnp.asarray(
        rng.standard_normal((1, h, w, dim)).astype(np.float32)
    ).astype(img_bf.dtype)

    def score(x, c):
        sh = params["score_head"]
        s = aliked.selu(aliked.nn.conv2d(sh["0"], x + c.astype(x.dtype) * 1e-20))
        s = aliked.selu(aliked.nn.conv2d_tapmat(sh["2"], s))
        s = aliked.selu(aliked.nn.conv2d_tapmat(sh["4"], s))
        s = aliked.nn.conv2d_tapmat(sh["6"], s)
        sm = jax.nn.sigmoid(s.astype(jnp.float32))[..., 0]
        return c + sm.sum() * 1e-20

    rec("score_head", timed(score, x1234v))

    def draw(image, c):
        fm, sm = aliked._dense_raw(params, image + c.astype(image.dtype) * 1e-20)
        return c + fm.sum().astype(jnp.float32) * 1e-20 + sm.sum() * 1e-20

    rec("dense_raw", timed(draw, img_bf))

    # --- DKD + SDDH on a precomputed dense map
    fm, sm = jax.jit(lambda i: aliked.extract_dense_map(params, i))(img_bf)
    fm = jax.block_until_ready(fm)
    sm = jax.block_until_ready(sm)

    def dkd(sm_, c):
        kpts, ks, valid = aliked.dkd_detect(sm_ + c * 1e-20, conf, size)
        return c + kpts.sum() * 1e-20 + ks.sum() * 1e-20

    rec("dkd_detect", timed(dkd, sm))

    kpts, _, _ = jax.jit(lambda s: aliked.dkd_detect(s, conf, size))(sm)
    kpts = jax.block_until_ready(kpts)

    def sddh(fm_, kp, c):
        d = aliked.sddh_describe(
            params["desc_head"], fm_ + c.astype(fm_.dtype) * 1e-20, kp, conf
        )
        return c + d.sum().astype(jnp.float32) * 1e-20

    rec("sddh_describe", timed(sddh, fm, kpts))

    _prod_stages(params, conf, img, size, h, w, k, rng, stages)


def _prod_stages(params, conf, img, size, h, w, k, rng, stages=None):
    """Production-config numbers.

    Measured 2026-08: approx_max_k (approx_topk=0.95) is a ~2x
    PESSIMIZATION for ALIKED at 1024x768 (32.4 vs 15.2 ms) — the
    production config keeps exact top_k.
    """
    import jax.numpy as jnp

    def full_f(image, size_, c):
        f = aliked.forward(params, conf, image + c * 1e-20, size_)
        return (c + f.descriptors.sum().astype(jnp.float32) * 1e-20
                + f.keypoints.sum().astype(jnp.float32) * 1e-20)

    import json
    art = {
        "model": conf.model_name, "image": f"{w}x{h}", "kpts": k,
        "mp": conf.mp, "unit": "ms (differential chained timing, v5e)",
    }
    if stages:
        art["stages"] = stages
    if "--b4" in sys.argv:
        # batched serving rate: per-image marginal cost at B=4
        imgb = jnp.asarray(rng.uniform(0, 1, (4, h, w, 3)).astype(np.float32))
        sizeb = jnp.asarray(np.tile([[float(w), float(h)]], (4, 1)))
        t_b4 = timed(full_f, imgb, sizeb, reps=2, tries=2) / 4.0
        print(f"full fwd B4        : {t_b4:8.2f} ms/image")
        art["full_forward_B4_per_image"] = round(t_b4, 2)
    else:
        t_full = timed(full_f, img, size)
        print(f"full fwd (prod)    : {t_full:8.2f} ms")
        art["full_forward_B1"] = round(t_full, 2)
    out = Path(__file__).parent.parent / "benchmarks" / "aliked_breakdown.json"
    out.parent.mkdir(exist_ok=True)
    prev = {}
    if out.exists():
        prev = json.loads(out.read_text())
    prev.update(art)
    out.write_text(json.dumps(prev, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
