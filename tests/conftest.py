"""Test env: force CPU with 8 virtual devices so sharding/multi-chip paths are
testable without TPU hardware (SURVEY.md §4 device-free testing)."""

import os
import sys

# Must happen before jax is imported anywhere. Forced (not setdefault):
# the session environment pins JAX_PLATFORMS to the TPU plugin, but unit
# tests must run hermetically on host CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import pytest  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var in-process; force
# the CPU backend through the config API before any backend initializes.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Exact fp32 matmuls for golden-parity comparisons.
jax.config.update("jax_default_matmul_precision", "highest")

# Tier-2 files: torch-reference parity + compaction-accuracy suites that
# dominate suite wall time on the 1-core host (full suite >10 min; the
# default `pytest -q` tier excludes these — run them with -m tier2 or
# `-m ""`; CI runs both tiers).
_TIER2_FILES = {
    # opt-in kernel (ALIKEDConfig.fused_score_head defaults False): its
    # interpret-mode agreement runs cost ~68 s of the default tier
    "test_score_head_pallas.py",
    "test_matcher_parity.py",
    "test_superpoint_parity.py",
    "test_aliked_parity.py",
    "test_sift_parity.py",
    "test_converters.py",
    "test_compaction_accuracy.py",
    "test_adaptive_compact.py",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if os.path.basename(str(item.fspath)) in _TIER2_FILES:
            item.add_marker(pytest.mark.tier2)
