"""End-to-end matcher parity: the torch reference LightGlue (random weights,
no downloads) vs this framework's matcher with the SAME weights converted.

This is the SURVEY.md §4 golden-parity strategy with random weights standing
in for the released checkpoints (no network in this environment); the
converter (weights.py) is identical either way.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import lightglue_tpu.models.lightglue as lg
from lightglue_tpu.configs import LightGlueConfig
from lightglue_tpu import weights as w

from ref_loader import load_ref_module, torch_state_dict_to_numpy

torch = pytest.importorskip("torch")
ref_lg = load_ref_module("lightglue")


def make_ref_model(**conf):
    torch.manual_seed(42)
    model = ref_lg.LightGlue(features=None, weights=None, flash=False, **conf)
    model.eval()
    return model


def make_inputs(seed, b, m, n, d, with_scales=False):
    rng = np.random.default_rng(seed)
    kpts0 = rng.uniform(0, 1024, (b, m, 2)).astype(np.float32)
    kpts1 = rng.uniform(0, 768, (b, n, 2)).astype(np.float32)
    desc0 = rng.standard_normal((b, m, d)).astype(np.float32)
    desc1 = rng.standard_normal((b, n, d)).astype(np.float32)
    desc0 /= np.linalg.norm(desc0, axis=-1, keepdims=True)
    desc1 /= np.linalg.norm(desc1, axis=-1, keepdims=True)
    size0 = np.tile(np.array([1024.0, 768.0], np.float32), (b, 1))
    size1 = np.tile(np.array([800.0, 600.0], np.float32), (b, 1))
    out = dict(
        kpts0=kpts0, kpts1=kpts1, desc0=desc0, desc1=desc1, size0=size0, size1=size1
    )
    if with_scales:
        out["scales0"] = rng.uniform(1, 4, (b, m)).astype(np.float32)
        out["scales1"] = rng.uniform(1, 4, (b, n)).astype(np.float32)
        out["oris0"] = rng.uniform(-3, 3, (b, m)).astype(np.float32)
        out["oris1"] = rng.uniform(-3, 3, (b, n)).astype(np.float32)
    return out


def run_ref(model, inp, with_scales=False):
    data0 = {
        "keypoints": torch.from_numpy(inp["kpts0"]),
        "descriptors": torch.from_numpy(inp["desc0"]),
        "image_size": torch.from_numpy(inp["size0"]),
    }
    data1 = {
        "keypoints": torch.from_numpy(inp["kpts1"]),
        "descriptors": torch.from_numpy(inp["desc1"]),
        "image_size": torch.from_numpy(inp["size1"]),
    }
    if with_scales:
        data0["scales"] = torch.from_numpy(inp["scales0"])
        data0["oris"] = torch.from_numpy(inp["oris0"])
        data1["scales"] = torch.from_numpy(inp["scales1"])
        data1["oris"] = torch.from_numpy(inp["oris1"])
    with torch.no_grad():
        return model({"image0": data0, "image1": data1})


def run_ours(params, conf, inp, with_scales=False, mask_pad=0):
    kw = {}
    inp = dict(inp)
    if mask_pad:
        # pad every per-point array and pass masks — results must be invariant
        m, n = inp["kpts0"].shape[1], inp["kpts1"].shape[1]
        for k in ("kpts0", "desc0", "scales0", "oris0"):
            if k in inp:
                pad = [(0, 0), (0, mask_pad)] + [(0, 0)] * (inp[k].ndim - 2)
                inp[k] = np.pad(inp[k], pad, constant_values=1.0)
        for k in ("kpts1", "desc1", "scales1", "oris1"):
            if k in inp:
                pad = [(0, 0), (0, mask_pad)] + [(0, 0)] * (inp[k].ndim - 2)
                inp[k] = np.pad(inp[k], pad, constant_values=1.0)
        b = inp["kpts0"].shape[0]
        kw["mask0"] = jnp.asarray(np.arange(m + mask_pad)[None] < m).repeat(b, 0)
        kw["mask1"] = jnp.asarray(np.arange(n + mask_pad)[None] < n).repeat(b, 0)
    if with_scales:
        kw.update(
            scales0=jnp.asarray(inp["scales0"]),
            oris0=jnp.asarray(inp["oris0"]),
            scales1=jnp.asarray(inp["scales1"]),
            oris1=jnp.asarray(inp["oris1"]),
        )
    fwd = jax.jit(lg.forward, static_argnames=("conf",))
    return fwd(
        params,
        conf,
        kpts0=jnp.asarray(inp["kpts0"]),
        kpts1=jnp.asarray(inp["kpts1"]),
        desc0=jnp.asarray(inp["desc0"]),
        desc1=jnp.asarray(inp["desc1"]),
        size0=jnp.asarray(inp["size0"]),
        size1=jnp.asarray(inp["size1"]),
        **kw,
    )


def assert_match(out, ref, m=None, n=None, score_atol=2e-3):
    m0 = np.asarray(out.matches0)
    m1 = np.asarray(out.matches1)
    ms0 = np.asarray(out.matching_scores0)
    ms1 = np.asarray(out.matching_scores1)
    rm0 = ref["matches0"].numpy()
    rm1 = ref["matches1"].numpy()
    if m is not None:
        m0, ms0 = m0[:, :m], ms0[:, :m]
        m1, ms1 = m1[:, :n], ms1[:, :n]
    np.testing.assert_array_equal(m0, rm0)
    np.testing.assert_array_equal(m1, rm1)
    np.testing.assert_allclose(ms0, ref["matching_scores0"].numpy(), atol=score_atol)
    np.testing.assert_allclose(ms1, ref["matching_scores1"].numpy(), atol=score_atol)


@pytest.fixture(scope="module")
def fixed_setup():
    conf_kw = dict(depth_confidence=-1.0, width_confidence=-1.0)
    model = make_ref_model(**conf_kw)
    sd = torch_state_dict_to_numpy(model)
    conf = LightGlueConfig(**conf_kw)
    params = w.convert_lightglue(sd, conf)
    return model, params, conf


def test_fixed_forward_parity(fixed_setup):
    model, params, conf = fixed_setup
    inp = make_inputs(0, 1, 64, 96, 256)
    ref = run_ref(model, inp)
    out = run_ours(params, conf, inp)
    assert_match(out, ref)
    assert int(out.stop) == ref["stop"]


def test_fixed_forward_parity_batched(fixed_setup):
    model, params, conf = fixed_setup
    inp = make_inputs(1, 3, 48, 48, 256)
    ref = run_ref(model, inp)
    out = run_ours(params, conf, inp)
    assert_match(out, ref)


def test_fixed_forward_masked_invariance(fixed_setup):
    """Padding + masks must reproduce the unpadded result exactly."""
    model, params, conf = fixed_setup
    inp = make_inputs(2, 1, 40, 56, 256)
    ref = run_ref(model, inp)
    out = run_ours(params, conf, inp, mask_pad=24)
    assert_match(out, ref, m=40, n=56)
    # padded slots must be unmatched with zero score
    assert (np.asarray(out.matches0)[:, 40:] == -1).all()
    assert (np.asarray(out.matching_scores0)[:, 40:] == 0).all()


def test_scale_ori_parity():
    conf_kw = dict(
        depth_confidence=-1.0, width_confidence=-1.0, input_dim=128,
        add_scale_ori=True,
    )
    model = make_ref_model(**conf_kw)
    sd = torch_state_dict_to_numpy(model)
    conf = LightGlueConfig(**conf_kw)
    params = w.convert_lightglue(sd, conf)
    inp = make_inputs(3, 1, 32, 40, 128, with_scales=True)
    ref = run_ref(model, inp, with_scales=True)
    out = run_ours(params, conf, inp, with_scales=True)
    assert_match(out, ref)


def test_early_stop_parity():
    """Bias token confidence high -> both implementations stop after layer 0."""
    conf_kw = dict(depth_confidence=0.95, width_confidence=-1.0)
    model = make_ref_model(**conf_kw)
    with torch.no_grad():
        for tc in model.token_confidence:
            tc.token[0].bias.fill_(10.0)
    sd = torch_state_dict_to_numpy(model)
    conf = LightGlueConfig(**conf_kw)
    params = w.convert_lightglue(sd, conf)
    inp = make_inputs(4, 1, 64, 64, 256)
    ref = run_ref(model, inp)
    out = run_ours(params, conf, inp)
    assert ref["stop"] == 1
    assert int(out.stop) == 1
    assert_match(out, ref)


def test_adaptive_no_trigger_matches_fixed():
    """With thresholds that never trigger, adaptive path == fixed path."""
    model = make_ref_model(depth_confidence=-1.0, width_confidence=-1.0)
    sd = torch_state_dict_to_numpy(model)
    base = LightGlueConfig(depth_confidence=-1.0, width_confidence=-1.0)
    params = w.convert_lightglue(sd, base)
    inp = make_inputs(5, 1, 32, 48, 256)
    out_fixed = run_ours(params, base, inp)
    # depth_confidence > 1 can never be satisfied -> no early exit;
    # width_confidence ~ 1 -> keep threshold 0 -> nothing pruned
    adapt = base.replace(depth_confidence=1.1, width_confidence=-1.0)
    out_adapt = run_ours(params, adapt, inp)
    np.testing.assert_array_equal(
        np.asarray(out_fixed.matches0), np.asarray(out_adapt.matches0)
    )
    np.testing.assert_allclose(
        np.asarray(out_fixed.matching_scores0),
        np.asarray(out_adapt.matching_scores0),
        atol=1e-5,
    )
    assert int(out_adapt.stop) == base.n_layers


def test_width_pruning_parity():
    """Pruning active (pruning_min_kpts=-1 mirrors reference CPU threshold).

    Masked pruning must reproduce the reference's index_select pruning."""
    conf_kw = dict(depth_confidence=0.95, width_confidence=0.99)
    model = make_ref_model(**conf_kw)
    sd = torch_state_dict_to_numpy(model)
    conf = LightGlueConfig(pruning_min_kpts=-1, **conf_kw)
    params = w.convert_lightglue(sd, conf)
    inp = make_inputs(6, 1, 96, 128, 256)
    ref = run_ref(model, inp)
    out = run_ours(params, conf, inp)
    assert int(out.stop) == ref["stop"]
    np.testing.assert_array_equal(np.asarray(out.prune0), ref["prune0"].numpy())
    np.testing.assert_array_equal(np.asarray(out.prune1), ref["prune1"].numpy())
    assert_match(out, ref)


def test_scale_ori_masked_pruning_parity():
    """All features at once: scale/ori encoding + padding masks + width
    pruning + early-stop heads, vs the reference."""
    conf_kw = dict(
        depth_confidence=0.95, width_confidence=0.99, input_dim=128,
        add_scale_ori=True,
    )
    model = make_ref_model(**conf_kw)
    sd = torch_state_dict_to_numpy(model)
    conf = LightGlueConfig(pruning_min_kpts=-1, **conf_kw)
    params = w.convert_lightglue(sd, conf)
    inp = make_inputs(10, 1, 48, 64, 128, with_scales=True)
    ref = run_ref(model, inp, with_scales=True)
    out = run_ours(params, conf, inp, with_scales=True)
    assert int(out.stop) == ref["stop"]
    np.testing.assert_array_equal(np.asarray(out.prune0), ref["prune0"].numpy())
    assert_match(out, ref)
