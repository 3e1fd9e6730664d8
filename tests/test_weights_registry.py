"""Released-checkpoint registry + golden layout fixtures (offline).

The fixtures in tests/fixtures/*.json pin the key names and shapes of the
published checkpoints (captured from executed reference torch modules —
scripts/capture_weight_fixtures.py; the released files load into those
modules strictly, so state_dict layout == released layout). These tests
assert, without network:

1. every matcher feature preset maps to a registry entry (reference
   lightglue.py:351-374 + 416-421 version URL scheme);
2. every registry entry's fixture layout CONVERTS, and the converted
   pytree has exactly the shapes of the corresponding init_params tree —
   so converter drift or model drift fails here first.
"""

import json
from pathlib import Path

import jax
import numpy as np
import pytest

from lightglue_tpu import weights as w
from lightglue_tpu.configs import (
    ALIKEDConfig, DISKConfig, SuperPointConfig, FEATURES, lightglue_config,
)

FIX = Path(__file__).parent / "fixtures"


def _zeros_sd(name):
    rec = json.loads((FIX / f"{name}.json").read_text())
    return {k: np.zeros(s, np.float32) for k, s in rec["keys"].items()}


def _tree_shapes(tree):
    return {k: tuple(v.shape) for k, v in w.flatten_tree(tree).items()}


def test_every_preset_has_registry_entry_and_fixture():
    for feats in FEATURES:
        name = f"{feats}_lightglue"
        assert name in w.REGISTRY, name
        assert (FIX / f"{name}.json").exists(), name
    for name, spec in w.REGISTRY.items():
        assert spec.url.startswith("https://"), name
        assert spec.converter in w._CONVERTERS, name
        assert (FIX / f"{name}.json").exists(), name


@pytest.mark.parametrize("feats", sorted(FEATURES))
def test_lightglue_fixture_layout_converts(feats):
    from lightglue_tpu.models import lightglue as lg

    conf = lightglue_config(feats)
    params = w.convert_lightglue(_zeros_sd(f"{feats}_lightglue"), conf)
    want = _tree_shapes(lg.init_params(jax.random.key(0), conf))
    assert _tree_shapes(params) == want


def test_superpoint_fixture_layout_converts():
    from lightglue_tpu.models import superpoint as sp

    params = w.convert_superpoint(_zeros_sd("superpoint_v1"))
    want = _tree_shapes(sp.init_params(jax.random.key(0), SuperPointConfig()))
    assert _tree_shapes(params) == want


@pytest.mark.parametrize(
    "name", ["aliked-t16", "aliked-n16", "aliked-n16rot", "aliked-n32"]
)
def test_aliked_fixture_layout_converts(name):
    from lightglue_tpu.models import aliked as al

    params = w.convert_aliked(_zeros_sd(name))
    want = _tree_shapes(
        al.init_params(jax.random.key(0), ALIKEDConfig(model_name=name))
    )
    assert _tree_shapes(params) == want


def test_disk_fixture_layout_converts():
    from lightglue_tpu.models import disk as dk

    params = w.convert_disk(_zeros_sd("disk_depth"))
    want = _tree_shapes(dk.init_params(jax.random.key(0), DISKConfig()))
    assert _tree_shapes(params) == want


def test_hardnet_fixture_layout_converts():
    from lightglue_tpu.models import hardnet as hn

    params = w.convert_hardnet(_zeros_sd("hardnet_liberty_aug"))
    want = _tree_shapes(hn.init_params(jax.random.key(0)))
    assert _tree_shapes(params) == want


def test_fetch_offline_raises_with_instructions(tmp_path, monkeypatch):
    def no_net(url, dest, retries=2, timeout=30.0):
        raise w.WeightsUnavailableError(f"could not download {url}: offline")

    monkeypatch.setattr(w, "_download", no_net)
    with pytest.raises(w.WeightsUnavailableError):
        w.fetch("superpoint_lightglue", cache_dir=tmp_path)
    with pytest.raises(KeyError):
        w.fetch("nonexistent_weights", cache_dir=tmp_path)


def test_pipeline_pretrained_uses_registry(monkeypatch):
    """pretrained=True routes through weights.fetch with the preset's
    registry name (reference auto-download, lightglue.py:415-421)."""
    import jax

    from lightglue_tpu import pipeline as pl
    from lightglue_tpu.models import lightglue as lg

    asked = []
    real = lg.init_params(jax.random.key(0), lightglue_config("superpoint"))

    def fake_fetch(name, cache_dir=None, retries=2):
        asked.append(name)
        return real

    monkeypatch.setattr(w, "fetch", fake_fetch)
    m = pl.LightGlue("superpoint", pretrained=True)
    assert asked == ["superpoint_lightglue"]
    assert m.params is real

    # offline: the registry error propagates instead of silently
    # falling back to random weights
    def offline_fetch(name, cache_dir=None, retries=2):
        raise w.WeightsUnavailableError("offline")

    monkeypatch.setattr(w, "fetch", offline_fetch)
    with pytest.raises(w.WeightsUnavailableError):
        pl.LightGlue("disk", pretrained=True)


def test_fetch_converts_cached_pth_and_caches_npz(tmp_path, monkeypatch):
    """Full offline fetch path: a .pth dropped in the cache (the documented
    offline escape hatch) is unwrapped, converted, and cached as npz."""
    torch = pytest.importorskip("torch")
    from lightglue_tpu.models import superpoint as sp

    sd = {k: torch.zeros(s) for k, s in json.loads(
        (FIX / "superpoint_v1.json").read_text())["keys"].items()}
    torch.save(sd, tmp_path / "superpoint_v1.pth")

    def no_net(url, dest, retries=2, timeout=30.0):  # must not be reached
        raise AssertionError("download attempted despite cached .pth")

    monkeypatch.setattr(w, "_download", no_net)
    params = w.fetch("superpoint_v1", cache_dir=tmp_path)
    want = _tree_shapes(sp.init_params(jax.random.key(0), SuperPointConfig()))
    assert _tree_shapes(params) == want
    assert (tmp_path / "superpoint_v1.npz").exists()
    # second fetch: served from the converted npz
    params2 = w.fetch("superpoint_v1", cache_dir=tmp_path)
    assert _tree_shapes(params2) == want
