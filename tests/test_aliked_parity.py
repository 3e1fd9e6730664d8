"""ALIKED parity vs the torch reference (random weights, torchvision stubbed
with a pure-torch deform_conv2d)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import torchvision_stub

torch = pytest.importorskip("torch")
torchvision_stub.install()

from ref_loader import load_ref_module, torch_state_dict_to_numpy  # noqa: E402

ref_aliked = load_ref_module("aliked")

from lightglue_tpu.configs import ALIKEDConfig  # noqa: E402
from lightglue_tpu.models import aliked as jal  # noqa: E402
from lightglue_tpu.ops import deform  # noqa: E402
from lightglue_tpu import weights as w  # noqa: E402


def t2n(x):
    return x.detach().cpu().numpy()


def test_deform_conv_stub_vs_jax():
    """The pure-torch stub and the JAX gather implementation must agree."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 8, 12, 16)).astype(np.float32)  # B,C,H,W
    off = (rng.standard_normal((1, 18, 12, 16)) * 2).astype(np.float32)
    wgt = rng.standard_normal((10, 8, 3, 3)).astype(np.float32)
    bias = rng.standard_normal((10,)).astype(np.float32)
    ref = torchvision_stub.deform_conv2d(
        torch.from_numpy(x), torch.from_numpy(off), torch.from_numpy(wgt),
        torch.from_numpy(bias), padding=(1, 1),
    )
    got = deform.deform_conv2d(
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(off.transpose(0, 2, 3, 1)),
        jnp.asarray(wgt.transpose(2, 3, 1, 0)),
        jnp.asarray(bias),
        padding=1,
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), t2n(ref), atol=1e-4
    )


@pytest.fixture(scope="module")
def models():
    torch.manual_seed(7)
    ref = ref_aliked.ALIKED(
        model_name="aliked-t16", max_num_keypoints=32,
        detection_threshold=0.005, nms_radius=2,
    )
    ref.eval()
    sd = torch_state_dict_to_numpy(ref)
    params = w.convert_aliked(sd)
    conf = ALIKEDConfig(
        model_name="aliked-t16", max_num_keypoints=32,
        detection_threshold=0.005, nms_radius=2,
    )
    return ref, params, conf


def test_dense_map_parity(models):
    ref, params, conf = models
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (1, 64, 96, 3)).astype(np.float32)
    with torch.no_grad():
        ref_feat, ref_score = ref.extract_dense_map(
            torch.from_numpy(img.transpose(0, 3, 1, 2))
        )
    feat, score = jax.jit(jal.extract_dense_map)(params, jnp.asarray(img))
    np.testing.assert_allclose(
        np.asarray(score), t2n(ref_score)[:, 0], atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(feat), t2n(ref_feat).transpose(0, 2, 3, 1), atol=2e-3
    )


def test_forward_parity(models):
    ref, params, conf = models
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 1, (1, 64, 96, 3)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref({"image": torch.from_numpy(img.transpose(0, 3, 1, 2))})
    out = jax.jit(jal.forward, static_argnames=("conf",))(
        params, conf, jnp.asarray(img)
    )
    valid = np.asarray(out.valid)[0]
    got_k = np.asarray(out.keypoints)[0][valid]
    got_s = np.asarray(out.keypoint_scores)[0][valid]
    got_d = np.asarray(out.descriptors)[0][valid]
    ref_k = t2n(ref_out["keypoints"])[0]
    ref_s = t2n(ref_out["keypoint_scores"])[0]
    ref_d = t2n(ref_out["descriptors"])[0]
    # reference threshold mode returns all above threshold (n_limit 32);
    # ours returns static top-32 with valid = >threshold
    kmin = min(len(ref_k), len(got_k))
    order_ref = np.argsort(-ref_s)[:kmin]
    order_got = np.argsort(-got_s)[:kmin]
    np.testing.assert_allclose(
        got_k[order_got], ref_k[order_ref], atol=5e-3
    )
    np.testing.assert_allclose(
        got_s[order_got], ref_s[order_ref], atol=1e-3
    )
    np.testing.assert_allclose(
        got_d[order_got], ref_d[order_ref], atol=5e-3
    )


def test_lazy_fm_matches_dense():
    """conf.lazy_fm (branch-map row evaluation, models/aliked.py
    ``sddh_describe_lazy``) vs the dense concat dataflow: identical
    keypoints, descriptors equal to fp32 lerp-association tolerance."""
    import jax
    import jax.numpy as jnp

    from lightglue_tpu.configs import ALIKEDConfig
    from lightglue_tpu.models import aliked

    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.uniform(0, 1, (2, 64, 96, 3)).astype(np.float32))
    c = ALIKEDConfig(model_name="aliked-n16", max_num_keypoints=64,
                     detection_threshold=0.005)
    p = aliked.init_params(jax.random.key(1), c)
    lazy = aliked.forward(p, c.replace(lazy_fm=True), img)
    dense = aliked.forward(p, c.replace(lazy_fm=False), img)
    np.testing.assert_allclose(
        np.asarray(lazy.keypoints), np.asarray(dense.keypoints), atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(lazy.valid), np.asarray(dense.valid)
    )
    np.testing.assert_allclose(
        np.asarray(lazy.descriptors), np.asarray(dense.descriptors),
        atol=2e-5,
    )


def test_aliked_twolevel_topk_forward_exact():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from lightglue_tpu.configs import ALIKEDConfig
    from lightglue_tpu.models import aliked

    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.uniform(0, 1, (1, 64, 96, 3)).astype(np.float32))
    c = ALIKEDConfig(model_name="aliked-t16", max_num_keypoints=64,
                     detection_threshold=0.005)
    p = aliked.init_params(jax.random.key(0), c)
    ref = aliked.forward(p, c, img)
    got = aliked.forward(p, c.replace(twolevel_topk=True), img)
    np.testing.assert_array_equal(
        np.asarray(ref.keypoints), np.asarray(got.keypoints)
    )
    np.testing.assert_array_equal(np.asarray(ref.valid), np.asarray(got.valid))
