"""Unit parity tests for matcher math primitives vs the torch reference
(run with identical random inputs; reference loaded from /root/reference)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lightglue_tpu.ops import assignment as asg
from lightglue_tpu.ops import attention as attn_ops
from lightglue_tpu.ops import keypoints as kp_ops
from lightglue_tpu.ops import rotary

from ref_loader import load_ref_module

torch = pytest.importorskip("torch")
ref_lg = load_ref_module("lightglue")


def t2n(x):
    return x.detach().cpu().numpy()


def test_normalize_keypoints_with_size():
    rng = np.random.default_rng(0)
    kpts = rng.uniform(0, 1000, (2, 50, 2)).astype(np.float32)
    size = np.array([[1024, 768], [640, 480]], np.float32)
    ref = t2n(ref_lg.normalize_keypoints(torch.from_numpy(kpts), torch.from_numpy(size)))
    got = np.asarray(kp_ops.normalize_keypoints(jnp.asarray(kpts), jnp.asarray(size)))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_normalize_keypoints_no_size():
    rng = np.random.default_rng(1)
    kpts = rng.uniform(0, 500, (3, 32, 2)).astype(np.float32)
    ref = t2n(ref_lg.normalize_keypoints(torch.from_numpy(kpts), None))
    got = np.asarray(kp_ops.normalize_keypoints(jnp.asarray(kpts), None))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_normalize_keypoints_masked_matches_unpadded():
    rng = np.random.default_rng(2)
    kpts = rng.uniform(0, 500, (1, 20, 2)).astype(np.float32)
    unpadded = np.asarray(kp_ops.normalize_keypoints(jnp.asarray(kpts), None))
    padded = np.concatenate([kpts, np.full((1, 12, 2), 777.0, np.float32)], 1)
    mask = np.arange(32)[None] < 20
    got = np.asarray(
        kp_ops.normalize_keypoints(jnp.asarray(padded), None, jnp.asarray(mask))
    )
    np.testing.assert_allclose(got[:, :20], unpadded, atol=1e-6)


def test_rotate_half_and_rotary_apply():
    rng = np.random.default_rng(3)
    t = rng.standard_normal((2, 4, 16, 64)).astype(np.float32)
    ref = t2n(ref_lg.rotate_half(torch.from_numpy(t)))
    got = np.asarray(rotary.rotate_half(jnp.asarray(t)))
    np.testing.assert_allclose(got, ref, atol=1e-6)

    # reference tables are repeat_interleave(2)'d (lightglue.py:81); ours
    # are the half tables — build a valid pair and compare applications
    half = rng.standard_normal((2, 2, 1, 16, 32)).astype(np.float32)
    full = np.repeat(half, 2, axis=-1)
    ref = t2n(
        ref_lg.apply_cached_rotary_emb(torch.from_numpy(full), torch.from_numpy(t))
    )
    got = np.asarray(rotary.apply_rotary(jnp.asarray(half), jnp.asarray(t)))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_apply_rotary_deint_is_permuted_apply_rotary():
    """Deinterleaved-layout rotary == deinterleave(interleaved rotary):
    the invariance that lets self_block pre-permute Wqkv columns
    (models/lightglue.py::_deint_qkv_perm)."""
    rng = np.random.default_rng(7)
    t = jnp.asarray(rng.standard_normal((2, 4, 16, 64)).astype(np.float32))
    enc = jnp.asarray(
        rng.standard_normal((2, 2, 1, 16, 32)).astype(np.float32)
    )
    deint = lambda x: jnp.concatenate([x[..., 0::2], x[..., 1::2]], -1)
    ref = deint(rotary.apply_rotary(enc, t))
    got = rotary.apply_rotary_deint(enc, deint(t))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_deint_qkv_perm_scores_invariant():
    """QK^T scores are unchanged when q and k both go through the Wqkv
    column permutation + deint rotary (the flash self-attention path)."""
    from lightglue_tpu.models.lightglue import _deint_qkv_perm

    rng = np.random.default_rng(8)
    H, hd, D = 4, 64, 256
    w = rng.standard_normal((D, 3 * D)).astype(np.float32)
    b = rng.standard_normal((3 * D,)).astype(np.float32)
    x = rng.standard_normal((1, 16, D)).astype(np.float32)
    enc = jnp.asarray(
        rng.standard_normal((2, 1, 1, 16, hd // 2)).astype(np.float32)
    )

    def qk(wm, bv, rot):
        qkv = (x @ wm + bv).reshape(1, 16, H, hd, 3).transpose(0, 2, 1, 3, 4)
        q, k = jnp.asarray(qkv[..., 0]), jnp.asarray(qkv[..., 1])
        return rot(enc, q), rot(enc, k)

    q0, k0 = qk(w, b, rotary.apply_rotary)
    perm = _deint_qkv_perm(H, hd)
    q1, k1 = qk(w[:, perm], b[perm], rotary.apply_rotary_deint)
    s0 = jnp.einsum("bhnd,bhmd->bhnm", q0, k0)
    s1 = jnp.einsum("bhnd,bhmd->bhnm", q1, k1)
    # summation order differs (permuted contraction): relative tolerance
    np.testing.assert_allclose(
        np.asarray(s1), np.asarray(s0), rtol=1e-5, atol=1e-3
    )


def test_fourier_posenc():
    rng = np.random.default_rng(4)
    torch.manual_seed(0)
    ref_pe = ref_lg.LearnableFourierPositionalEncoding(2, 64, 64)
    kpts = rng.uniform(-1, 1, (2, 30, 2)).astype(np.float32)
    ref = t2n(ref_pe(torch.from_numpy(kpts)))
    params = {"Wr": {"w": jnp.asarray(t2n(ref_pe.Wr.weight).T)}}
    got = np.asarray(rotary.fourier_posenc(params, jnp.asarray(kpts)))
    # ours is the half table; the reference's is repeat_interleave(2)'d
    np.testing.assert_allclose(ref[..., 0::2], ref[..., 1::2], atol=0)
    np.testing.assert_allclose(got, ref[..., 0::2], atol=5e-4)


def test_sigmoid_log_double_softmax():
    rng = np.random.default_rng(5)
    sim = rng.standard_normal((2, 20, 30)).astype(np.float32)
    z0 = rng.standard_normal((2, 20, 1)).astype(np.float32)
    z1 = rng.standard_normal((2, 30, 1)).astype(np.float32)
    ref = t2n(
        ref_lg.sigmoid_log_double_softmax(
            torch.from_numpy(sim), torch.from_numpy(z0), torch.from_numpy(z1)
        )
    )
    got = np.asarray(
        asg.sigmoid_log_double_softmax(jnp.asarray(sim), jnp.asarray(z0), jnp.asarray(z1))
    )
    np.testing.assert_allclose(got, ref, atol=5e-4)


def test_sigmoid_log_double_softmax_masked_matches_unpadded():
    rng = np.random.default_rng(6)
    m, n, mp, np_ = 12, 17, 16, 24
    sim = rng.standard_normal((1, mp, np_)).astype(np.float32)
    z0 = rng.standard_normal((1, mp, 1)).astype(np.float32)
    z1 = rng.standard_normal((1, np_, 1)).astype(np.float32)
    mask0 = np.arange(mp)[None] < m
    mask1 = np.arange(np_)[None] < n
    got = np.asarray(
        asg.sigmoid_log_double_softmax(
            jnp.asarray(sim), jnp.asarray(z0), jnp.asarray(z1),
            jnp.asarray(mask0), jnp.asarray(mask1),
        )
    )
    ref = t2n(
        ref_lg.sigmoid_log_double_softmax(
            torch.from_numpy(sim[:, :m, :n]),
            torch.from_numpy(z0[:, :m]),
            torch.from_numpy(z1[:, :n]),
        )
    )
    np.testing.assert_allclose(got[:, :m, :n], ref[:, :m, :n], atol=5e-4)
    # dustbin row/col for valid entries
    np.testing.assert_allclose(got[:, :m, -1], ref[:, :m, -1], atol=5e-4)
    np.testing.assert_allclose(got[:, -1, :n], ref[:, -1, :n], atol=5e-4)


def test_filter_matches():
    rng = np.random.default_rng(7)
    scores = rng.standard_normal((3, 21, 31)).astype(np.float32) * 2 - 3.0
    ref_m0, ref_m1, ref_s0, ref_s1 = ref_lg.filter_matches(
        torch.from_numpy(scores), 0.1
    )
    m0, m1, s0, s1 = asg.filter_matches(jnp.asarray(scores), 0.1)
    np.testing.assert_array_equal(np.asarray(m0), t2n(ref_m0))
    np.testing.assert_array_equal(np.asarray(m1), t2n(ref_m1))
    np.testing.assert_allclose(np.asarray(s0), t2n(ref_s0), atol=1e-4)
    np.testing.assert_allclose(np.asarray(s1), t2n(ref_s1), atol=1e-4)


def test_sdpa_vs_torch():
    rng = np.random.default_rng(8)
    q = rng.standard_normal((2, 4, 16, 64)).astype(np.float32)
    k = rng.standard_normal((2, 4, 20, 64)).astype(np.float32)
    v = rng.standard_normal((2, 4, 20, 64)).astype(np.float32)
    ref = t2n(
        torch.nn.functional.scaled_dot_product_attention(
            torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v)
        )
    )
    got = np.asarray(attn_ops.sdpa(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    np.testing.assert_allclose(got, ref, atol=5e-4)

    # masked: mask out last 5 keys
    mask = np.ones((2, 1, 16, 20), bool)
    mask[..., 15:] = False
    ref = t2n(
        torch.nn.functional.scaled_dot_product_attention(
            torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v),
            attn_mask=torch.from_numpy(mask),
        )
    )
    got = np.asarray(
        attn_ops.sdpa(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask))
    )
    np.testing.assert_allclose(got, ref, atol=5e-4)


def test_bidirectional_cross_attention():
    rng = np.random.default_rng(9)
    qk0 = rng.standard_normal((2, 4, 16, 64)).astype(np.float32)
    qk1 = rng.standard_normal((2, 4, 20, 64)).astype(np.float32)
    v0 = rng.standard_normal((2, 4, 16, 64)).astype(np.float32)
    v1 = rng.standard_normal((2, 4, 20, 64)).astype(np.float32)
    # reference einsum path (lightglue.py:216-223)
    tq0, tq1 = torch.from_numpy(qk0), torch.from_numpy(qk1)
    scale = 64**-0.5
    sim = torch.einsum("bhid,bhjd->bhij", tq0 * scale**0.5, tq1 * scale**0.5)
    attn01 = torch.softmax(sim, dim=-1)
    attn10 = torch.softmax(sim.transpose(-2, -1).contiguous(), dim=-1)
    ref_m0 = torch.einsum("bhij,bhjd->bhid", attn01, torch.from_numpy(v1))
    ref_m1 = torch.einsum(
        "bhji,bhjd->bhid", attn10.transpose(-2, -1), torch.from_numpy(v0)
    )
    m0, m1 = attn_ops.bidirectional_cross_attention(
        jnp.asarray(qk0), jnp.asarray(qk1), jnp.asarray(v0), jnp.asarray(v1)
    )
    np.testing.assert_allclose(np.asarray(m0), t2n(ref_m0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(m1), t2n(ref_m1), atol=1e-5)


def test_pad_to_length():
    x = jnp.ones((1, 10, 4))
    y, mask = kp_ops.pad_to_length(x, 16)
    assert y.shape == (1, 16, 4)
    assert mask.shape == (1, 16, 1)
    assert np.asarray(mask).sum() == 10


def test_topk2d_matches_monolithic():
    from lightglue_tpu.ops.topk import topk2d

    rng = np.random.default_rng(0)
    for shape, k in [((2, 16, 32), 20), ((1, 8, 8), 8), ((1, 64, 48), 100)]:
        s = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        vr, ir = jax.lax.top_k(s.reshape(shape[0], -1), k)
        v2, i2 = topk2d(s, k, cap=4)
        np.testing.assert_array_equal(np.asarray(v2), np.asarray(vr))
        np.testing.assert_array_equal(np.asarray(i2), np.asarray(ir))


def test_topk2d_ties_and_concentration_fall_back_exact():
    from lightglue_tpu.ops.topk import topk2d

    # all-equal map: every selection is a tie -> must match monolithic order
    s = jnp.zeros((1, 8, 16), jnp.float32)
    vr, ir = jax.lax.top_k(s.reshape(1, -1), 12)
    v2, i2 = topk2d(s, 12, cap=2)
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(ir))
    np.testing.assert_array_equal(np.asarray(v2), np.asarray(vr))

    # top-k concentrated in ONE row (more than cap winners per row)
    s = jnp.zeros((1, 8, 16), jnp.float32).at[0, 3].set(
        jnp.arange(16, dtype=jnp.float32) + 10.0
    )
    vr, ir = jax.lax.top_k(s.reshape(1, -1), 12)
    v2, i2 = topk2d(s, 12, cap=2)
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(ir))

    # -inf masked map with fewer than k finite entries
    s = jnp.full((1, 8, 16), -jnp.inf).at[0, 2, 3].set(1.0).at[0, 5, 7].set(2.0)
    vr, ir = jax.lax.top_k(s.reshape(1, -1), 6)
    v2, i2 = topk2d(s, 6, cap=2)
    np.testing.assert_array_equal(np.asarray(v2), np.asarray(vr))


def test_top_k_keypoints_twolevel_exact():
    """twolevel=True (ops/topk.py) selects identical keypoints/scores/
    validity as the monolithic top_k, including tie-heavy post-NMS maps."""
    import numpy as np

    from lightglue_tpu.ops.sampling import top_k_keypoints

    rng = np.random.default_rng(0)
    # sparse positive maxima over a sea of exact zero ties (post-NMS shape)
    scores = np.zeros((2, 48, 64), np.float32)
    for b in range(2):
        ys = rng.integers(0, 48, 120)
        xs = rng.integers(0, 64, 120)
        scores[b, ys, xs] = rng.uniform(0.01, 1.0, 120).astype(np.float32)
    s = jnp.asarray(scores)
    ref = top_k_keypoints(s, 64, 0.005)
    got = top_k_keypoints(s, 64, 0.005, twolevel=True)
    for a, b_ in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


def test_superpoint_disk_twolevel_topk_forward_exact():
    import numpy as np

    from lightglue_tpu.configs import DISKConfig, SuperPointConfig
    from lightglue_tpu.models import disk as dk
    from lightglue_tpu.models import superpoint as sp

    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0, 1, (1, 64, 80, 1)).astype(np.float32))

    c0 = SuperPointConfig(max_num_keypoints=64)
    p = sp.init_params(jax.random.key(0), c0)
    ref = sp.forward(p, c0, img)
    got = sp.forward(p, c0.replace(twolevel_topk=True), img)
    np.testing.assert_array_equal(
        np.asarray(ref.keypoints), np.asarray(got.keypoints)
    )
    np.testing.assert_array_equal(np.asarray(ref.valid), np.asarray(got.valid))

    c1 = DISKConfig(max_num_keypoints=64)
    pd = dk.init_params(jax.random.key(1), c1)
    ref = dk.forward(pd, c1, img)
    got = dk.forward(pd, c1.replace(twolevel_topk=True), img)
    np.testing.assert_array_equal(
        np.asarray(ref.keypoints), np.asarray(got.keypoints)
    )
    np.testing.assert_array_equal(np.asarray(ref.valid), np.asarray(got.valid))
