"""ctypes bindings for the C++ host runtime (native/lg_host.cpp).

The library is built on demand (``make -C native``); every entry point has a
numpy fallback so the package works without a toolchain. The native path
matters at serving rates: match compaction and ragged batch packing are
per-element Python loops otherwise.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

from .utils import diagnostics

_NATIVE_DIR = Path(__file__).parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "liblg_host.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not _LIB_PATH.exists():
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)], check=True,
                capture_output=True, timeout=120,
            )
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.compact_matches.restype = ctypes.c_int64
        lib.compact_matches.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.pack_ragged.restype = None
        lib.pack_ragged.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_float, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.filter_matches_host.restype = None
        lib.filter_matches_host.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_float, ctypes.c_void_p, ctypes.c_void_p,
        ]
        _lib = lib
    except Exception as e:
        diagnostics.warn_once(
            "native-host-lib",
            "native C++ host runtime (liblg_host.so) unavailable "
            f"({type(e).__name__}: {e}); using numpy fallbacks for match "
            "compaction / ragged packing. Build with `make -C native`.",
        )
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def compact_matches(
    matches0: np.ndarray, mscores0: np.ndarray
) -> Tuple[List[np.ndarray], List[np.ndarray]]:
    """(B, M) -> per-batch ([K_b, 2] pairs, [K_b] scores)."""
    lib = _load()
    matches0 = np.ascontiguousarray(matches0, np.int32)
    mscores0 = np.ascontiguousarray(mscores0, np.float32)
    b, m = matches0.shape
    if lib is None:
        out_m, out_s = [], []
        for i in range(b):
            valid = matches0[i] > -1
            idx = np.nonzero(valid)[0]
            out_m.append(
                np.stack([idx, matches0[i][idx]], -1).astype(np.int32)
            )
            out_s.append(mscores0[i][idx])
        return out_m, out_s
    pairs = np.empty((b * m, 2), np.int32)
    scores = np.empty((b * m,), np.float32)
    counts = np.empty((b,), np.int64)
    lib.compact_matches(
        matches0.ctypes.data, mscores0.ctypes.data, b, m,
        pairs.ctypes.data, scores.ctypes.data, counts.ctypes.data,
    )
    out_m, out_s = [], []
    off = 0
    for i in range(b):
        c = int(counts[i])
        out_m.append(pairs[off : off + c].copy())
        out_s.append(scores[off : off + c].copy())
        off += c
    return out_m, out_s


def pack_ragged(
    arrays: List[np.ndarray], k: int, pad_value: float = 1.0
) -> Tuple[np.ndarray, np.ndarray]:
    """List of (n_i, D) float32 -> ((B, K, D) padded, (B, K) valid)."""
    lib = _load()
    b = len(arrays)
    d = arrays[0].shape[1]
    if lib is None:
        out = np.full((b, k, d), pad_value, np.float32)
        valid = np.zeros((b, k), bool)
        for i, a in enumerate(arrays):
            n = min(len(a), k)
            out[i, :n] = a[:n]
            valid[i, :n] = True
        return out, valid
    rows = np.ascontiguousarray(np.concatenate(arrays, 0), np.float32)
    offsets = np.zeros((b + 1,), np.int64)
    np.cumsum([len(a) for a in arrays], out=offsets[1:])
    out = np.empty((b, k, d), np.float32)
    valid_u8 = np.empty((b, k), np.uint8)
    lib.pack_ragged(
        rows.ctypes.data, offsets.ctypes.data, b, k, d,
        ctypes.c_float(pad_value), out.ctypes.data, valid_u8.ctypes.data,
    )
    return out, valid_u8.astype(bool)


def filter_matches_host(
    scores: np.ndarray, threshold: float
) -> Tuple[np.ndarray, np.ndarray]:
    """(M, N) inner log-assignment -> (matches0 (M,), mscores0 (M,))."""
    lib = _load()
    scores = np.ascontiguousarray(scores, np.float32)
    m, n = scores.shape
    if lib is None:
        m0 = scores.argmax(1)
        m1 = scores.argmax(0)
        mutual = m1[m0] == np.arange(m)
        sc = np.exp(scores[np.arange(m), m0])
        ok = mutual & (sc > threshold)
        return (
            np.where(ok, m0, -1).astype(np.int32),
            np.where(mutual, sc, 0.0).astype(np.float32),
        )
    matches0 = np.empty((m,), np.int32)
    mscores0 = np.empty((m,), np.float32)
    lib.filter_matches_host(
        scores.ctypes.data, m, n, ctypes.c_float(threshold),
        matches0.ctypes.data, mscores0.ctypes.data,
    )
    return matches0, mscores0
