"""Micro: small-channel full-res conv strategies for the ALIKED score head
and encoder block1 (XLA conv vs im2col matmul vs shift-MAC)."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from lightglue_tpu import nn
from lightglue_tpu.models import aliked


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


def im2col3x3(x):
    """(B,H,W,C) -> (B,H,W,9C) of the 3x3 neighborhood (zero pad)."""
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return jnp.concatenate(
        [xp[:, dy : dy + h, dx : dx + w] for dy in range(3) for dx in range(3)],
        axis=-1,
    )


def conv3x3_im2col(p, x):
    cin = x.shape[-1]
    cout = p["w"].shape[-1]
    w = p["w"].transpose(0, 1, 2, 3).reshape(9 * cin, cout)
    y = im2col3x3(x) @ w.astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def conv3x3_shiftmac(p, x):
    b, h, w_, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    wgt = p["w"].astype(x.dtype)
    acc = None
    for dy in range(3):
        for dx in range(3):
            t = jnp.einsum(
                "bhwc,co->bhwo", xp[:, dy : dy + h, dx : dx + w_], wgt[dy, dx]
            )
            acc = t if acc is None else acc + t
    if "b" in p:
        acc = acc + p["b"].astype(x.dtype)
    return acc


def main():
    rng = np.random.default_rng(0)
    h, w = 768, 1024
    x = jnp.asarray(
        rng.standard_normal((1, h, w, 128)).astype(np.float32)
    ).astype(jnp.bfloat16)
    params = aliked.init_params(jax.random.key(0))
    sh = params["score_head"]

    def head_conv(x, c, conv3):
        s = aliked.selu(nn.conv2d(sh["0"], x + c.astype(x.dtype) * 1e-20))
        s = aliked.selu(conv3(sh["2"], s))
        s = aliked.selu(conv3(sh["4"], s))
        s = conv3(sh["6"], s)
        return c + jax.nn.sigmoid(s.astype(jnp.float32)).sum() * 1e-20

    print(f"score xla conv     : {timed(lambda x, c: head_conv(x, c, nn.conv2d), x):7.2f} ms")
    print(f"score im2col matmul: {timed(lambda x, c: head_conv(x, c, conv3x3_im2col), x):7.2f} ms")
    print(f"score shift-mac    : {timed(lambda x, c: head_conv(x, c, conv3x3_shiftmac), x):7.2f} ms")

    # block1: 3->16, 16->16 convs at full res + bn/selu
    img = jnp.asarray(
        rng.standard_normal((1, h, w, 3)).astype(np.float32)
    ).astype(jnp.bfloat16)
    b1 = params["block1"]

    def blk1(img, c, conv3):
        y = aliked.selu(nn.batch_norm(b1["bn1"], conv3(b1["conv1"], img + c.astype(img.dtype) * 1e-20)))
        y = aliked.selu(nn.batch_norm(b1["bn2"], conv3(b1["conv2"], y)))
        return c + y.astype(jnp.float32).sum() * 1e-20

    print(f"block1 xla conv    : {timed(lambda i, c: blk1(i, c, nn.conv2d), img):7.2f} ms")
    print(f"block1 im2col      : {timed(lambda i, c: blk1(i, c, conv3x3_im2col), img):7.2f} ms")


if __name__ == "__main__":
    main()
