"""One-shot degraded-mode warnings.

The reference warns when it silently changes execution strategy — flash
attention unavailable (reference lightglue.py:100-105), compiled pruning
disabled (lightglue.py:442-446), buggy pycolmap (sift.py:117-123). This
module is the TPU-native equivalent: every fallback that changes the
executed path (Pallas -> XLA, native C++ -> numpy, exact -> approximate
top-k) announces itself exactly once per process so a user can tell which
path they actually got.
"""

from __future__ import annotations

import warnings
from typing import Set


class DegradedModeWarning(UserWarning):
    """A requested fast path was replaced by a fallback."""


_seen: Set[str] = set()


def warn_once(key: str, message: str) -> bool:
    """Emit ``message`` as a DegradedModeWarning the first time ``key`` is
    seen; return True iff the warning fired."""
    if key in _seen:
        return False
    _seen.add(key)
    warnings.warn(message, DegradedModeWarning, stacklevel=3)
    return True


def reset() -> None:
    """Forget emitted warnings (for tests)."""
    _seen.clear()
