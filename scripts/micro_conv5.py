"""Micro-bench: formulations of DISK's dominant final conv (5x5, 80->129ch,
full 1024x768 resolution) and the first conv (3->16).

Candidates:
  a) XLA conv 80->129 (baseline, in-model today)
  b) XLA conv 80->128 (desc slice only; N-tile effect)
  c) row-tap decomposition: 5 matmuls of K=400 accumulated (im2col rows)
  d) full im2col K=2000 single matmul
  e) XLA conv 3->16 vs im2col (75x16) for down0

Usage: python scripts/micro_conv5.py [--fp32]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


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
    h, w = 768, 1024
    dtype = jnp.float32 if "--fp32" in sys.argv else jnp.bfloat16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, h, w, 80)).astype(np.float32)).astype(dtype)
    wt = jnp.asarray(rng.standard_normal((5, 5, 80, 129)).astype(np.float32)).astype(dtype)
    print(f"dtype={dtype.__name__}")

    def conv(co):
        wco = wt[..., :co]

        def f(x, c):
            y = jax.lax.conv_general_dilated(
                x + c.astype(x.dtype) * 1e-20, wco, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
            return c + y.sum().astype(jnp.float32) * 1e-20

        return f

    print(f"a) XLA conv ->129      : {timed(conv(129), x):8.2f} ms")
    print(f"b) XLA conv ->128      : {timed(conv(128), x):8.2f} ms")

    # c) row-tap decomposition: pad rows, 5 matmuls with K=5*80=400
    w400 = wt.transpose(0, 1, 2, 3).reshape(5, 5 * 80, 129)  # (dy, kx*cin, co)

    def rowtap(x, c):
        xi = x + c.astype(x.dtype) * 1e-20
        xp = jnp.pad(xi, ((0, 0), (2, 2), (2, 2), (0, 0)))
        acc = jnp.zeros((1, h, w, 129), jnp.float32)
        for dy in range(5):
            # columns for this row tap: (1, h, w, 5*80)
            cols = jnp.concatenate(
                [xp[:, dy : dy + h, dx : dx + w] for dx in range(5)], axis=-1
            )
            acc = acc + jax.lax.dot_general(
                cols, w400[dy], (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        return c + acc.astype(x.dtype).sum().astype(jnp.float32) * 1e-20

    print(f"c) 5x rowtap K=400     : {timed(rowtap, x):8.2f} ms")

    w2000 = wt.reshape(25 * 80, 129)

    def im2col(x, c):
        xi = x + c.astype(x.dtype) * 1e-20
        xp = jnp.pad(xi, ((0, 0), (2, 2), (2, 2), (0, 0)))
        cols = jnp.concatenate(
            [xp[:, dy : dy + h, dx : dx + w] for dy in range(5) for dx in range(5)],
            axis=-1,
        )
        y = jax.lax.dot_general(
            cols, w2000, (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        return c + y.sum().astype(jnp.float32) * 1e-20

    print(f"d) im2col K=2000       : {timed(im2col, x):8.2f} ms")

    # e) down0: 3->16 conv vs im2col
    x3 = jnp.asarray(rng.standard_normal((1, h, w, 3)).astype(np.float32)).astype(dtype)
    w0 = jnp.asarray(rng.standard_normal((5, 5, 3, 16)).astype(np.float32)).astype(dtype)

    def conv0(x, c):
        y = jax.lax.conv_general_dilated(
            x + c.astype(x.dtype) * 1e-20, w0, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        return c + y.sum().astype(jnp.float32) * 1e-20

    print(f"e) XLA conv 3->16      : {timed(conv0, x3):8.2f} ms")

    w75 = w0.reshape(75, 16)

    def im2col0(x, c):
        xi = x + c.astype(x.dtype) * 1e-20
        xp = jnp.pad(xi, ((0, 0), (2, 2), (2, 2), (0, 0)))
        cols = jnp.concatenate(
            [xp[:, dy : dy + h, dx : dx + w] for dy in range(5) for dx in range(5)],
            axis=-1,
        )
        y = jax.lax.dot_general(
            cols, w75, (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        return c + y.sum().astype(jnp.float32) * 1e-20

    print(f"f) im2col 75->16       : {timed(im2col0, x3):8.2f} ms")


if __name__ == "__main__" and "--s2d" not in sys.argv and "--extra" not in sys.argv and "--pack" not in sys.argv and "--phases" not in sys.argv:
    main()


def extra():
    """g) heatmap via tap-matmul + shift-sum; h) XLA conv ->1."""
    h, w = 768, 1024
    dtype = jnp.float32 if "--fp32" in sys.argv else jnp.bfloat16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, h, w, 80)).astype(np.float32)).astype(dtype)
    wt = jnp.asarray(rng.standard_normal((5, 5, 80, 1)).astype(np.float32)).astype(dtype)

    def conv1(x, c):
        y = jax.lax.conv_general_dilated(
            x + c.astype(x.dtype) * 1e-20, wt, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        return c + y.sum().astype(jnp.float32) * 1e-20

    print(f"h) XLA conv ->1        : {timed(conv1, x):8.2f} ms")

    wtap = wt[..., 0].reshape(25, 80).T  # (80, 25)

    def tapmat(x, c):
        xi = x + c.astype(x.dtype) * 1e-20
        u = jax.lax.dot_general(
            xi, wtap, (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)  # (1, h, w, 25)
        up = jnp.pad(u, ((0, 0), (2, 2), (2, 2), (0, 0)))
        acc = jnp.zeros((1, h, w), jnp.float32)
        t = 0
        for dy in range(5):
            for dx in range(5):
                # output(p) = sum_tap u(p + tap_offset - 2)[tap]: the tap
                # computed at the NEIGHBOR that contributes to p
                acc = acc + up[:, dy : dy + h, dx : dx + w, t].astype(jnp.float32)
                t += 1
        return c + acc.sum() * 1e-20

    print(f"g) tapmat ->1 shiftsum : {timed(tapmat, x):8.2f} ms")

    # numerics check (CPU semantics on TPU fp32): compare conv vs tapmat
    xf = x.astype(jnp.float32)
    y1 = jax.lax.conv_general_dilated(
        xf, wt.astype(jnp.float32), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[..., 0]
    u = jnp.einsum("bhwc,ct->bhwt", xf, wtap.astype(jnp.float32))
    up = jnp.pad(u, ((0, 0), (2, 2), (2, 2), (0, 0)))
    y2 = jnp.zeros((1, h, w))
    t = 0
    for dy in range(5):
        for dx in range(5):
            # conv SAME: y(p) = sum_{dy,dx} x(p + (dy-2, dx-2)) * w[dy,dx]
            # u(q)[t] = <x(q), w_t>; contribution to y(p) needs q = p+(dy-2,dx-2)
            y2 = y2 + up[:, dy : dy + h, dx : dx + w, t]
            t += 1
    err = float(jnp.abs(y1 - y2).max() / jnp.abs(y1).max())
    print(f"   tapmat rel err      : {err:.2e}")


if "--extra" in sys.argv:
    extra()


def s2d_bench():
    """i/j) space-to-depth formulation for down0 3->16 5x5 @full res."""
    from lightglue_tpu import nn as lnn
    h, w = 768, 1024
    dtype = jnp.float32 if "--fp32" in sys.argv else jnp.bfloat16
    rng = np.random.default_rng(0)
    x3 = jnp.asarray(rng.standard_normal((1, h, w, 3)).astype(np.float32)).astype(dtype)
    p0 = {"w": jnp.asarray(rng.standard_normal((5, 5, 3, 16)).astype(np.float32)).astype(dtype),
          "b": jnp.asarray(rng.standard_normal((16,)).astype(np.float32)).astype(dtype)}

    def s2d_full(x, c):
        xp = lnn.space_to_depth2(x + c.astype(x.dtype) * 1e-20)
        y = lnn.conv2d_s2d(p0, xp)
        y = lnn.depth_to_space2(y)
        return c + y.sum().astype(jnp.float32) * 1e-20

    print(f"i) s2d pack+conv+unpack: {timed(s2d_full, x3):8.2f} ms")

    xp = lnn.space_to_depth2(x3)

    def s2d_only(x, c):
        y = lnn.conv2d_s2d(p0, x + c.astype(x.dtype) * 1e-20)
        return c + y.sum().astype(jnp.float32) * 1e-20

    print(f"j) s2d conv only       : {timed(s2d_only, xp):8.2f} ms")

    # 16->16 3x3 at full res, packed
    p1 = {"w": jnp.asarray(rng.standard_normal((3, 3, 16, 16)).astype(np.float32)).astype(dtype)}
    x16 = jnp.asarray(rng.standard_normal((1, h // 2, w // 2, 64)).astype(np.float32)).astype(dtype)

    def s2d16(x, c):
        y = lnn.conv2d_s2d(p1, x + c.astype(x.dtype) * 1e-20)
        return c + y.sum().astype(jnp.float32) * 1e-20

    print(f"k) s2d 16->16 3x3 packed: {timed(s2d16, x16):8.2f} ms")

    x16f = jnp.asarray(rng.standard_normal((1, h, w, 16)).astype(np.float32)).astype(dtype)

    def im2col16(x, c):
        y = lnn.conv2d_im2col(p1, x + c.astype(x.dtype) * 1e-20)
        return c + y.sum().astype(jnp.float32) * 1e-20

    print(f"l) im2col 16->16 3x3   : {timed(im2col16, x16f):8.2f} ms")


if "--s2d" in sys.argv:
    s2d_bench()


def pack_bench():
    from lightglue_tpu import nn as lnn
    h, w = 768, 1024
    dtype = jnp.float32 if "--fp32" in sys.argv else jnp.bfloat16
    rng = np.random.default_rng(0)
    x3 = jnp.asarray(rng.standard_normal((1, h, w, 3)).astype(np.float32)).astype(dtype)
    x16 = jnp.asarray(rng.standard_normal((1, h // 2, w // 2, 64)).astype(np.float32)).astype(dtype)

    def pack_rt(x, c):
        y = lnn.space_to_depth2(x + c.astype(x.dtype) * 1e-20)
        return c + y.sum().astype(jnp.float32) * 1e-20

    print(f"pack reshapeT 3ch      : {timed(pack_rt, x3):8.2f} ms")

    def pack_slice(x, c):
        xi = x + c.astype(x.dtype) * 1e-20
        y = jnp.concatenate(
            [xi[:, a::2, b::2, :] for a in range(2) for b in range(2)], axis=-1
        )
        return c + y.sum().astype(jnp.float32) * 1e-20

    print(f"pack 4slices 3ch       : {timed(pack_slice, x3):8.2f} ms")

    def unpack_rt(x, c):
        y = lnn.depth_to_space2(x + c.astype(x.dtype) * 1e-20)
        return c + y.sum().astype(jnp.float32) * 1e-20

    print(f"unpack reshapeT 16ch   : {timed(unpack_rt, x16):8.2f} ms")

    def unpack_scatter(x, c):
        xi = x + c.astype(x.dtype) * 1e-20
        cq = xi.shape[-1] // 4
        b_, h2, w2, _ = xi.shape
        y = jnp.zeros((b_, 2 * h2, 2 * w2, cq), xi.dtype)
        for a in range(2):
            for bb in range(2):
                y = y.at[:, a::2, bb::2, :].set(
                    xi[..., (a * 2 + bb) * cq : (a * 2 + bb + 1) * cq]
                )
        return c + y.sum().astype(jnp.float32) * 1e-20

    print(f"unpack scatter 16ch    : {timed(unpack_scatter, x16):8.2f} ms")


if "--pack" in sys.argv:
    pack_bench()


def phases_bench():
    from lightglue_tpu import nn as lnn
    h, w = 768, 1024
    dtype = jnp.float32 if "--fp32" in sys.argv else jnp.bfloat16
    rng = np.random.default_rng(0)
    x3 = jnp.asarray(rng.standard_normal((1, h, w, 3)).astype(np.float32)).astype(dtype)
    p0 = {"w": jnp.asarray(rng.standard_normal((5, 5, 3, 16)).astype(np.float32)).astype(dtype),
          "b": jnp.asarray(rng.standard_normal((16,)).astype(np.float32)).astype(dtype)}

    def ph_packed(x, c):
        y = lnn.conv2d_phases(p0, x + c.astype(x.dtype) * 1e-20)
        return c + y.sum().astype(jnp.float32) * 1e-20

    print(f"m) conv2d_phases packed out : {timed(ph_packed, x3):8.2f} ms")

    def ph_unpacked(x, c):
        y = lnn.depth_to_space2(lnn.conv2d_phases(p0, x + c.astype(x.dtype) * 1e-20))
        return c + y.sum().astype(jnp.float32) * 1e-20

    print(f"n) conv2d_phases + unpack   : {timed(ph_unpacked, x3):8.2f} ms")


if "--phases" in sys.argv:
    phases_bench()
