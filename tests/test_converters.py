"""Converter hardening tests (VERDICT r1 item 5).

kornia is unavailable offline, so its DISK / HardNet architectures are
RECONSTRUCTED here as executable torch modules emitting kornia-layout state
dicts (`unet.path_down.{i}.conv.{j}.*`, `features.{i}.*`). The converters
must (a) roundtrip these synthetic checkpoints and (b) produce JAX models
whose outputs match the executed torch reconstruction — catching any
transpose/layout/stat mapping error. Strict mode must also REJECT malformed
layouts rather than silently guessing.

Plus: analytic deform_conv2d cases derived from the documented torchvision
semantics (offset channel 2t=dy / 2t+1=dx, bilinear, zero outside) that do
not depend on the pure-torch stub used elsewhere.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from lightglue_tpu import nn, weights as w  # noqa: E402
from lightglue_tpu.configs import DISKConfig  # noqa: E402
from lightglue_tpu.models import disk as jdisk  # noqa: E402
from lightglue_tpu.models import hardnet as jhard  # noqa: E402
from lightglue_tpu.ops import deform  # noqa: E402


# ---------------------------------------------------------------------------
# HardNet: torch reconstruction of kornia.feature.HardNet
# ---------------------------------------------------------------------------


def _torch_hardnet():
    feats = tnn.Sequential(
        tnn.Conv2d(1, 32, 3, padding=1, bias=False),
        tnn.BatchNorm2d(32, affine=False),
        tnn.ReLU(),
        tnn.Conv2d(32, 32, 3, padding=1, bias=False),
        tnn.BatchNorm2d(32, affine=False),
        tnn.ReLU(),
        tnn.Conv2d(32, 64, 3, padding=1, stride=2, bias=False),
        tnn.BatchNorm2d(64, affine=False),
        tnn.ReLU(),
        tnn.Conv2d(64, 64, 3, padding=1, bias=False),
        tnn.BatchNorm2d(64, affine=False),
        tnn.ReLU(),
        tnn.Conv2d(64, 128, 3, padding=1, stride=2, bias=False),
        tnn.BatchNorm2d(128, affine=False),
        tnn.ReLU(),
        tnn.Conv2d(128, 128, 3, padding=1, bias=False),
        tnn.BatchNorm2d(128, affine=False),
        tnn.ReLU(),
        tnn.Dropout(0.3),
        tnn.Conv2d(128, 128, 8, bias=False),
        tnn.BatchNorm2d(128, affine=False),
    )

    class HardNet(tnn.Module):
        def __init__(self):
            super().__init__()
            self.features = feats

        def forward(self, x):
            flat = x.view(x.size(0), -1)
            mp = flat.mean(dim=1)[:, None, None, None]
            sp = flat.std(dim=1)[:, None, None, None] + 1e-6
            y = self.features((x - mp) / sp)
            y = y.view(y.size(0), -1)
            return F.normalize(y, p=2, dim=1)

    m = HardNet()
    # randomize running stats so a mean/var mapping error cannot hide
    g = torch.Generator().manual_seed(3)
    for mod in m.modules():
        if isinstance(mod, tnn.BatchNorm2d):
            mod.running_mean.copy_(torch.randn(mod.running_mean.shape, generator=g) * 0.2)
            mod.running_var.copy_(torch.rand(mod.running_var.shape, generator=g) + 0.5)
    m.eval()
    return m


def test_hardnet_converter_roundtrip_parity():
    torch.manual_seed(11)
    m = _torch_hardnet()
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    params = w.convert_hardnet(sd)  # strict
    patches = np.random.default_rng(5).uniform(
        0, 1, (7, 32, 32, 1)
    ).astype(np.float32)
    with torch.no_grad():
        ref = m(torch.from_numpy(patches.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(
        jax.jit(jhard.describe_patches)(params, jnp.asarray(patches))
    )
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_hardnet_converter_strict_rejects():
    m = _torch_hardnet()
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    bad = dict(sd)
    bad["features.99.weight"] = np.zeros((4, 4, 3, 3), np.float32)
    with pytest.raises(ValueError):
        w.convert_hardnet(bad)
    # dropped BN stats -> count mismatch
    bad2 = {k: v for k, v in sd.items() if "features.1.running" not in k}
    with pytest.raises(ValueError):
        w.convert_hardnet(bad2)


# ---------------------------------------------------------------------------
# DISK: torch reconstruction of the thin U-Net (jatentaki/unets layout)
# ---------------------------------------------------------------------------


class _TorchThinBlock(tnn.Module):
    """conv Sequential [PReLU, InstanceNorm2d, Conv2d(5, pad 2)] — first
    block is [Conv2d] only."""

    def __init__(self, cin, cout, is_first=False):
        super().__init__()
        if is_first:
            self.conv = tnn.Sequential(tnn.Conv2d(cin, cout, 5, padding=2))
        else:
            self.conv = tnn.Sequential(
                tnn.PReLU(cin),
                tnn.InstanceNorm2d(cin),
                tnn.Conv2d(cin, cout, 5, padding=2),
            )

    def forward(self, x):
        return self.conv(x)


class _TorchThinUnet(tnn.Module):
    def __init__(self, desc_dim=128):
        super().__init__()
        down, up = [16, 32, 64, 64, 64], [64, 64, 64, desc_dim + 1]
        dd = [3] + down
        self.path_down = tnn.ModuleList(
            _TorchThinBlock(dd[i], dd[i + 1], is_first=(i == 0))
            for i in range(len(down))
        )
        cin = down[-1]
        self.path_up = tnn.ModuleList()
        for i, cout in enumerate(up):
            skip = down[len(down) - 2 - i]
            self.path_up.append(_TorchThinBlock(cin + skip, cout))
            cin = cout

    def forward(self, x):
        feats = []
        for i, blk in enumerate(self.path_down):
            if i > 0:
                x = F.avg_pool2d(x, 2)
            x = blk(x)
            feats.append(x)
        y = feats[-1]
        for i, blk in enumerate(self.path_up):
            y = F.interpolate(y, scale_factor=2, mode="bilinear",
                              align_corners=False)
            y = torch.cat([y, feats[len(feats) - 2 - i]], dim=1)
            y = blk(y)
        return y


def test_disk_converter_roundtrip_parity():
    torch.manual_seed(12)
    tm = tnn.Module()
    tm.unet = _TorchThinUnet()
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = w.convert_disk(sd)  # strict
    img = np.random.default_rng(6).uniform(0, 1, (1, 32, 48, 3)).astype(
        np.float32
    )
    with torch.no_grad():
        ref = tm.unet(torch.from_numpy(img.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(jax.jit(jdisk.unet_forward)(params, jnp.asarray(img)))
    np.testing.assert_allclose(
        got, ref.transpose(0, 2, 3, 1), atol=5e-4
    )


def test_disk_converter_strict_rejects():
    tm = tnn.Module()
    tm.unet = _TorchThinUnet()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    # channel-plan violation
    bad = dict(sd)
    bad["unet.path_down.1.conv.2.weight"] = np.zeros((32, 99, 5, 5), np.float32)
    with pytest.raises(ValueError):
        w.convert_disk(bad)
    # ambiguous extra 1-d tensor (e.g. affine InstanceNorm) must not be
    # silently taken as the gate
    bad2 = dict(sd)
    bad2["unet.path_up.0.conv.1.weight"] = np.ones((128,), np.float32)
    with pytest.raises(ValueError):
        w.convert_disk(bad2)
    # leftovers refused
    bad3 = dict(sd)
    bad3["unet.extra.weight"] = np.zeros((3, 3), np.float32)
    with pytest.raises(ValueError):
        w.convert_disk(bad3)


# ---------------------------------------------------------------------------
# deform_conv2d: analytic cases from the documented torchvision semantics
# (independent of the pure-torch stub used in test_aliked_parity)
# ---------------------------------------------------------------------------


def _rand(shape, seed):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


def test_deform_conv_zero_offsets_equals_conv():
    x = jnp.asarray(_rand((1, 9, 11, 6), 0))
    wgt = jnp.asarray(_rand((3, 3, 6, 4), 1))
    off = jnp.zeros((1, 9, 11, 18))
    got = deform.deform_conv2d(x, off, wgt, padding=1)
    ref = nn.conv2d({"w": wgt}, x, padding=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_deform_conv_integer_offset_channel_layout():
    """Channel 2t is dy, 2t+1 is dx (torchvision layout): shifting ONLY tap
    t=0 (kernel corner ki=kj=0) by dy=+1 must equal a conv whose tap-0 input
    is the image shifted up by one row (zero pad below)."""
    x = _rand((1, 8, 10, 3), 2)
    wgt = _rand((3, 3, 3, 2), 3)
    off = np.zeros((1, 8, 10, 18), np.float32)
    off[..., 0] = 1.0  # dy of tap (0, 0)
    got = deform.deform_conv2d(
        jnp.asarray(x), jnp.asarray(off), jnp.asarray(wgt), padding=1
    )
    # reference: remaining taps = plain conv without tap 0; tap-0
    # contribution computed directly: sample (y-1+dy, x-1) = (y, x-1)
    wr = wgt.copy()
    wr[0, 0] = 0
    base = np.asarray(nn.conv2d({"w": jnp.asarray(wr)}, jnp.asarray(x), padding=1))
    xleft = np.pad(x, ((0, 0), (0, 0), (1, 0), (0, 0)))[:, :, :-1]  # x[y, x-1]
    tap0 = np.einsum("bhwc,co->bhwo", xleft, wgt[0, 0])
    np.testing.assert_allclose(np.asarray(got), base + tap0, atol=1e-4)


def test_deform_conv_fractional_offset_is_lerp():
    """dx=0.5 on every tap => average of dx=0 and dx=1 outputs (bilinear
    sampling is linear, conv is linear in the samples)."""
    x = jnp.asarray(_rand((1, 7, 9, 4), 4))
    wgt = jnp.asarray(_rand((3, 3, 4, 5), 5))
    off0 = np.zeros((1, 7, 9, 18), np.float32)
    off1 = off0.copy()
    off1[..., 1::2] = 1.0  # dx channels
    offh = off0.copy()
    offh[..., 1::2] = 0.5
    y0 = deform.deform_conv2d(x, jnp.asarray(off0), wgt, padding=1)
    y1 = deform.deform_conv2d(x, jnp.asarray(off1), wgt, padding=1)
    yh = deform.deform_conv2d(x, jnp.asarray(offh), wgt, padding=1)
    np.testing.assert_allclose(
        np.asarray(yh), (np.asarray(y0) + np.asarray(y1)) / 2, atol=1e-4
    )


def test_deform_conv_far_outside_zero():
    """Samples pushed far outside contribute exactly zero."""
    x = jnp.asarray(np.ones((1, 6, 6, 2), np.float32))
    wgt = jnp.asarray(np.ones((3, 3, 2, 1), np.float32))
    off = np.zeros((1, 6, 6, 18), np.float32)
    off[..., 0::2] = 100.0  # all dy far below the image
    got = deform.deform_conv2d(x, jnp.asarray(off), wgt, padding=1)
    np.testing.assert_allclose(np.asarray(got), 0.0, atol=1e-6)


def test_deform_conv_dcnv2_mask():
    """DCNv2 modulation scales each tap's sampled patch."""
    x = jnp.asarray(_rand((1, 6, 8, 3), 7))
    wgt = jnp.asarray(_rand((3, 3, 3, 2), 8))
    off = jnp.zeros((1, 6, 8, 18))
    mask = jnp.full((1, 6, 8, 9), 0.5)
    got = deform.deform_conv2d(x, off, wgt, padding=1, mask=mask)
    ref = nn.conv2d({"w": wgt}, x, padding=1) * 0.5
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)
