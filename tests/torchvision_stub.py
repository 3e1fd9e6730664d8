"""Minimal torchvision stand-in for loading the reference aliked.py offline.

Provides ``torchvision.ops.deform_conv2d`` (pure-torch gather/bilinear
implementation of the documented semantics, stride 1, dilation 1) and
``torchvision.models.resnet.conv1x1/conv3x3``. Installed into sys.modules by
``install()`` before ref_loader imports the reference module.
"""

import sys
import types

import torch


def deform_conv2d(input, offset, weight, bias=None, stride=(1, 1),
                  padding=(0, 0), dilation=(1, 1), mask=None):
    """torchvision.ops.deform_conv2d semantics (DCNv2, offset_groups=1).

    input: (B, C, H, W); offset: (B, 2*kh*kw, Ho, Wo) with channel 2*t = dy,
    2*t+1 = dx for row-major tap t; weight: (Cout, C, kh, kw);
    mask: (B, kh*kw, Ho, Wo) or None.
    """
    if isinstance(padding, int):
        padding = (padding, padding)
    b, c, h, w = input.shape
    cout, _, kh, kw = weight.shape
    k2 = kh * kw
    ho, wo = offset.shape[-2:]
    dev = input.device
    off = offset.reshape(b, k2, 2, ho, wo)
    dy = off[:, :, 0]
    dx = off[:, :, 1]
    ys = torch.arange(ho, device=dev, dtype=input.dtype).view(1, 1, ho, 1)
    xs = torch.arange(wo, device=dev, dtype=input.dtype).view(1, 1, 1, wo)
    ki = torch.arange(kh, device=dev, dtype=input.dtype)
    kj = torch.arange(kw, device=dev, dtype=input.dtype)
    tap_y = ki.repeat_interleave(kw).view(1, k2, 1, 1)
    tap_x = kj.repeat(kh).view(1, k2, 1, 1)
    fy = ys - padding[0] + tap_y + dy
    fx = xs - padding[1] + tap_x + dx

    y0 = torch.floor(fy)
    x0 = torch.floor(fx)
    wy = fy - y0
    wx = fx - x0
    flat = input.reshape(b, c, h * w)

    def gather(yi, xi):
        inside = (yi >= 0) & (yi <= h - 1) & (xi >= 0) & (xi <= w - 1)
        yc = yi.clamp(0, h - 1).long()
        xc = xi.clamp(0, w - 1).long()
        idx = (yc * w + xc).reshape(b, 1, -1).expand(b, c, -1)
        vals = torch.gather(flat, 2, idx).reshape(b, c, k2, ho, wo)
        return vals * inside.unsqueeze(1)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    wy = wy.unsqueeze(1)
    wx = wx.unsqueeze(1)
    patches = ((v00 * (1 - wx) + v01 * wx) * (1 - wy)
               + (v10 * (1 - wx) + v11 * wx) * wy)  # (B, C, k2, Ho, Wo)
    if mask is not None:
        patches = patches * mask.unsqueeze(1)
    out = torch.einsum("bckhw,ock->bohw", patches, weight.reshape(cout, c, k2))
    if bias is not None:
        out = out + bias.view(1, -1, 1, 1)
    return out


def install():
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    ops = types.ModuleType("torchvision.ops")
    ops.deform_conv2d = deform_conv2d
    models = types.ModuleType("torchvision.models")
    resnet = types.ModuleType("torchvision.models.resnet")

    def conv1x1(in_planes, out_planes, stride=1):
        return torch.nn.Conv2d(in_planes, out_planes, 1, stride=stride,
                               bias=False)

    def conv3x3(in_planes, out_planes, stride=1, groups=1, dilation=1):
        return torch.nn.Conv2d(in_planes, out_planes, 3, stride=stride,
                               padding=dilation, groups=groups, bias=False,
                               dilation=dilation)

    resnet.conv1x1 = conv1x1
    resnet.conv3x3 = conv3x3
    models.resnet = resnet
    tv.ops = ops
    tv.models = models
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = ops
    sys.modules["torchvision.models"] = models
    sys.modules["torchvision.models.resnet"] = resnet
