"""ALIKED B8 composition drill-down: where do the ~2 ms/img between
sum-of-stages and the full forward go, and how does each encoder stage
scale at B8? (VERDICT r5 item 1)."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import os as _os
if _os.environ.get("LG_CACHE", "1") != "0":
    from lightglue_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache(
        str(Path(__file__).resolve().parent.parent) + "/.cache/xla")

import jax
import jax.numpy as jnp
import numpy as np

from lightglue_tpu.configs import ALIKEDConfig
from lightglue_tpu.models import aliked


def timed(fn, *args, reps=4, tries=3):
    def run(r):
        @jax.jit
        def chained(*a):
            def body(carry, _):
                return fn(*a, carry), None

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
    return (t3 - t1) / (2 * reps) * 1e3


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    h, w, k = 768, 1024, 1024
    conf = ALIKEDConfig(max_num_keypoints=k, mp=True)
    params = aliked.init_params(jax.random.key(0), conf)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (b, h, w, 3)).astype(np.float32))
    imgb = img.astype(jnp.bfloat16)
    size = jnp.asarray(np.tile([[float(w), float(h)]], (b, 1)))

    def rec(name, val):
        print(f"{name:22s}: {val:7.2f} ms  ({val / b:5.2f}/img)", flush=True)

    s = lambda t: t.sum().astype(jnp.float32) * 1e-20

    def block1(x, c):
        return c + s(aliked._conv_block(
            params["block1"], x + c.astype(x.dtype) * 1e-20))

    rec("block1 (full res)", timed(block1, imgb))

    x1 = jax.jit(lambda x: aliked._conv_block(params["block1"], x))(imgb)
    x1 = jax.block_until_ready(x1)

    def block2(x, c):
        return c + s(aliked._res_block(
            params["block2"], aliked._avg_pool(x + c.astype(x.dtype) * 1e-20, 2),
            False))

    rec("pool+block2 (H/2)", timed(block2, x1))

    x2 = jax.jit(lambda x: aliked._res_block(
        params["block2"], aliked._avg_pool(x, 2), False))(x1)
    x2 = jax.block_until_ready(x2)

    def block3(x, c):
        return c + s(aliked._res_block(
            params["block3"], aliked._avg_pool(x + c.astype(x.dtype) * 1e-20, 4),
            True))

    rec("pool+block3 (H/8)", timed(block3, x2))

    x3 = jax.jit(lambda x: aliked._res_block(
        params["block3"], aliked._avg_pool(x, 4), True))(x2)
    x3 = jax.block_until_ready(x3)

    def block4(x, c):
        return c + s(aliked._res_block(
            params["block4"], aliked._avg_pool(x + c.astype(x.dtype) * 1e-20, 4),
            True))

    rec("pool+block4 (H/32)", timed(block4, x3))

    x4 = jax.jit(lambda x: aliked._res_block(
        params["block4"], aliked._avg_pool(x, 4), True))(x3)
    x4 = jax.block_until_ready(x4)

    def agg(a, bb, cc, d, c):
        y1 = aliked.selu(aliked.nn.conv2d(params["conv1"], a + c.astype(a.dtype) * 1e-20))
        y2 = aliked.selu(aliked.nn.conv2d(params["conv2"], bb))
        y3 = aliked.selu(aliked.nn.conv2d(params["conv3"], cc))
        y4 = aliked.selu(aliked.nn.conv2d(params["conv4"], d))
        x1234 = jnp.concatenate(
            [y1, aliked._upsample(y2, 2), aliked._upsample(y3, 8),
             aliked._upsample(y4, 32)], axis=-1)
        return c + s(x1234)

    rec("agg (1x1s + upsample)", timed(agg, x1, x2, x3, x4))

    def dense(x, c):
        fm, sm = aliked._dense_raw(params, x + c.astype(x.dtype) * 1e-20)
        return c + s(fm) + sm.sum() * 1e-20

    rec("dense_raw", timed(dense, imgb))

    def dense_dkd(x, c):
        fm, sm = aliked._dense_raw(params, x + c.astype(x.dtype) * 1e-20)
        fm, sm = jax.lax.optimization_barrier((fm, sm))
        kp, ks, v = aliked.dkd_detect(sm, conf, size)
        return c + s(fm) + kp.sum() * 1e-20 + ks.sum() * 1e-20

    rec("dense+barrier+dkd", timed(dense_dkd, imgb))

    def full(x, c):
        f = aliked.forward(params, conf, x + c * 1e-20, size)
        return c + s(f.descriptors) + f.keypoints.sum() * 1e-20

    rec("full forward", timed(full, img))


if __name__ == "__main__":
    main()
