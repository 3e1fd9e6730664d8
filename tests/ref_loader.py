"""Load reference (torch) modules from /root/reference for golden-output
parity tests — WITHOUT network access or the kornia dependency.

The reference package __init__ imports every extractor (some need kornia /
torchvision / weight downloads), so we synthesize a package named ``refglue``
whose __path__ points at the reference source tree and import only the
submodules a test needs. Weight-download calls are stubbed to return empty
dicts (models are then randomly initialized, which is exactly what the parity
tests want: run both frameworks with the SAME random weights).
"""

from __future__ import annotations

import importlib
import importlib.util
import sys
import types

REF_PATH = "/root/reference/lightglue"


def _install_kornia_stub():
    if "kornia" in sys.modules:
        return
    import torch

    kornia = types.ModuleType("kornia")
    color = types.ModuleType("kornia.color")

    def rgb_to_grayscale(image):
        w = torch.tensor([0.299, 0.587, 0.114], dtype=image.dtype).view(1, 3, 1, 1)
        return (image * w).sum(1, keepdim=True)

    def grayscale_to_rgb(image):
        return image.repeat(1, 3, 1, 1)

    color.rgb_to_grayscale = rgb_to_grayscale
    color.grayscale_to_rgb = grayscale_to_rgb

    geometry = types.ModuleType("kornia.geometry")
    transform = types.ModuleType("kornia.geometry.transform")

    def resize(img, size, side="long", antialias=True, align_corners=None):
        import torch.nn.functional as F

        h, w = img.shape[-2:]
        if isinstance(size, int):
            factor = size / (max(h, w) if side == "long" else min(h, w))
            size = (int(round(h * factor)), int(round(w * factor)))
        return F.interpolate(
            img, size=size, mode="bilinear", antialias=antialias,
            align_corners=False,
        )

    transform.resize = resize
    geometry.transform = transform
    kornia.color = color
    kornia.geometry = geometry
    kornia.feature = types.ModuleType("kornia.feature")
    sys.modules["kornia"] = kornia
    sys.modules["kornia.color"] = color
    sys.modules["kornia.geometry"] = geometry
    sys.modules["kornia.geometry.transform"] = transform
    sys.modules["kornia.feature"] = kornia.feature


def _install_refglue_pkg():
    if "refglue" in sys.modules:
        return
    pkg = types.ModuleType("refglue")
    pkg.__path__ = [REF_PATH]
    pkg.__package__ = "refglue"
    sys.modules["refglue"] = pkg


def _stub_hub_downloads():
    import torch

    def _empty_sd(*a, **k):
        return {}

    torch.hub.load_state_dict_from_url = _empty_sd
    # Empty state dicts must no-op instead of erroring on missing keys.
    orig = torch.nn.Module.load_state_dict

    def tolerant(self, sd, strict=True, **kw):
        if not sd:
            return torch.nn.modules.module._IncompatibleKeys([], [])
        return orig(self, sd, strict=strict, **kw)

    torch.nn.Module.load_state_dict = tolerant


def load_ref_module(name: str):
    """Import e.g. ``load_ref_module('lightglue')`` -> reference module."""
    _install_kornia_stub()
    _install_refglue_pkg()
    _stub_hub_downloads()
    full = f"refglue.{name}"
    if full in sys.modules:
        return sys.modules[full]
    spec = importlib.util.spec_from_file_location(
        full, f"{REF_PATH}/{name}.py",
        submodule_search_locations=None,
    )
    mod = importlib.util.module_from_spec(spec)
    mod.__package__ = "refglue"
    sys.modules[full] = mod
    spec.loader.exec_module(mod)
    return mod


def torch_state_dict_to_numpy(module) -> dict:
    import numpy as np

    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}
