"""Degraded-mode observability: every silent fallback warns exactly once.

Reference pattern: flash unavailable warning (lightglue.py:100-105), buggy
pycolmap warning (sift.py:117-123). Here the equivalents are Pallas->XLA
attention fallback, native C++ -> numpy fallback, and approximate top-k.
"""

import sys
import types
import warnings

import numpy as np
import pytest

from lightglue_tpu.utils import diagnostics


@pytest.fixture(autouse=True)
def _fresh_registry():
    diagnostics.reset()
    yield
    diagnostics.reset()


def _catch():
    return warnings.catch_warnings(record=True)


def test_warn_once_fires_exactly_once():
    with _catch() as rec:
        warnings.simplefilter("always")
        assert diagnostics.warn_once("k", "msg") is True
        assert diagnostics.warn_once("k", "msg") is False
        assert diagnostics.warn_once("k2", "msg2") is True
    assert len(rec) == 2
    assert all(issubclass(w.category, diagnostics.DegradedModeWarning) for w in rec)


def test_flash_fallback_warns_once_per_reason():
    from lightglue_tpu.configs import lightglue_config
    from lightglue_tpu.models import lightglue as lg

    conf = lightglue_config("superpoint", flash=True)
    with _catch() as rec:
        warnings.simplefilter("always")
        # CPU backend in tests -> platform fallback
        assert lg._flash_ok(conf, 256) is False
        assert lg._flash_ok(conf, 256) is False  # second call: silent
    msgs = [str(w.message) for w in rec]
    assert len(msgs) == 1 and "not TPU" in msgs[0]

    # flash disabled explicitly: no warning at all
    with _catch() as rec:
        warnings.simplefilter("always")
        assert lg._flash_ok(conf.replace(flash=False), 256) is False
    assert len(rec) == 0


def test_approx_topk_warns_once():
    import jax.numpy as jnp

    from lightglue_tpu.ops.sampling import top_k_keypoints

    scores = jnp.asarray(np.random.default_rng(0).random((1, 16, 16), np.float32))
    with _catch() as rec:
        warnings.simplefilter("always")
        top_k_keypoints(scores, 8, 0.0, approx_recall=0.95)
        top_k_keypoints(scores, 8, 0.0, approx_recall=0.95)
    msgs = [str(w.message) for w in rec]
    assert len(msgs) == 1 and "approximate top-k" in msgs[0]
    # exact path: silent
    with _catch() as rec:
        warnings.simplefilter("always")
        top_k_keypoints(scores, 8, 0.0)
    assert len(rec) == 0


def test_compaction_config_guard_warns_on_low_agreement():
    """User-facing guard for two-stage compaction configs in measured
    <0.99-agreement regions (VERDICT r3 weak 7: prefix=1/bucket=256 at
    1024 kpts keeps ~29% of the exact path's matches)."""
    from lightglue_tpu.configs import lightglue_config
    from lightglue_tpu.models import lightglue as lg

    bad = lightglue_config(
        "superpoint", compaction_bucket=256, compaction_prefix=1
    )
    with _catch() as rec:
        warnings.simplefilter("always")
        lg._check_compaction_config(bad, 1024)
        lg._check_compaction_config(bad, 1024)  # second call: silent
    msgs = [str(w.message) for w in rec]
    assert len(msgs) == 1 and "compaction" in msgs[0] and "0.99" in msgs[0]

    # measured >=0.99 region (p3 b640 @1024): silent
    good = lightglue_config(
        "superpoint", compaction_bucket=640, compaction_prefix=3
    )
    with _catch() as rec:
        warnings.simplefilter("always")
        lg._check_compaction_config(good, 1024)
    assert len(rec) == 0

    # 2048 kpts: nothing measured reaches 0.99 -> warn even at p3 b640
    with _catch() as rec:
        warnings.simplefilter("always")
        lg._check_compaction_config(good, 2048)
    assert len(rec) == 1


def test_native_fallback_warns_once(monkeypatch, tmp_path):
    import lightglue_tpu.native as native

    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", False)
    monkeypatch.setattr(native, "_NATIVE_DIR", tmp_path)  # no Makefile here
    monkeypatch.setattr(native, "_LIB_PATH", tmp_path / "liblg_host.so")
    with _catch() as rec:
        warnings.simplefilter("always")
        assert native.available() is False
        assert native.available() is False
    msgs = [str(w.message) for w in rec]
    assert len(msgs) == 1 and "numpy fallback" in msgs[0]


def test_pycolmap_version_warning(monkeypatch):
    from lightglue_tpu.configs import SIFTConfig
    from lightglue_tpu.models import sift as sift_mod

    class _FakeSift:
        def __init__(self, options=None, device=None):
            pass

        def extract(self, img):
            det = np.zeros((3, 4), np.float32)
            det[:, 2] = 1.0  # scale
            desc = np.random.default_rng(0).random((3, 128)).astype(np.float32)
            return det, desc

    fake = types.ModuleType("pycolmap")
    fake.__version__ = "0.4.0"
    fake.Normalization = types.SimpleNamespace(L2="l2")
    fake.Sift = _FakeSift
    monkeypatch.setitem(sys.modules, "pycolmap", fake)

    conf = SIFTConfig(backend="pycolmap_cpu")
    img = np.zeros((32, 32), np.float32)
    with _catch() as rec:
        warnings.simplefilter("always")
        sift_mod.extract_single_image_pycolmap(img, conf)
        sift_mod.extract_single_image_pycolmap(img, conf)
    msgs = [
        str(w.message) for w in rec
        if isinstance(w.message, diagnostics.DegradedModeWarning)
    ]
    assert len(msgs) == 1 and "0.4.0" in msgs[0]
