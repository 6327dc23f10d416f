"""ctypes bindings for the native LUMA featurizer (native/luma_featurizer.cc).

Builds the shared library on demand (g++ is baked into the image) and falls
back to the pure-numpy pipeline in data/audio.py when unavailable. The two
implementations agree to f32 round-off
(tests/test_data.py::test_wav_roundtrip_and_native_parity).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import List, Optional

import numpy as np

NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
LIB_PATH = NATIVE_DIR / "libluma_featurizer.so"

_lib = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    src = NATIVE_DIR / "luma_featurizer.cc"
    stale = (
        not LIB_PATH.exists()
        or (src.exists() and src.stat().st_mtime > LIB_PATH.stat().st_mtime)
    )
    if stale:
        try:
            subprocess.run(
                ["make", "-C", str(NATIVE_DIR)], check=True, capture_output=True
            )
        except (subprocess.CalledProcessError, FileNotFoundError):
            if not LIB_PATH.exists():
                return None  # no library at all; a stale one still works
    try:
        lib = ctypes.CDLL(str(LIB_PATH))
    except OSError:
        return None
    lib.mfcc_mean.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.mfcc_mean.restype = ctypes.c_int
    lib.featurize_wav.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_double, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.featurize_wav.restype = ctypes.c_int
    lib.featurize_batch.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_double,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float),
    ]
    lib.featurize_batch.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def mfcc_mean_native(
    mono: np.ndarray, sample_rate: int = 16000, n_mfcc: int = 40,
    n_mels: int = 40, n_fft: int = 400, hop: int = 200,
) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    mono = np.ascontiguousarray(mono, dtype=np.float32)
    out = np.zeros(n_mfcc, np.float32)
    rc = lib.mfcc_mean(
        mono.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), mono.size,
        sample_rate, n_mfcc, n_mels, n_fft, hop,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out if rc == 0 else None


def featurize_wav_files(
    paths: List[str], sample_rate: int = 16000, max_length_s: float = 3.0,
    n_mfcc: int = 40,
) -> np.ndarray:
    """Batch wav -> MFCC-mean features; native when possible, numpy fallback."""
    lib = _load()
    if lib is not None:
        blob = b"\0".join(str(p).encode() for p in paths) + b"\0"
        out = np.zeros((len(paths), n_mfcc), np.float32)
        failures = lib.featurize_batch(
            blob, len(paths), sample_rate, max_length_s, n_mfcc,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if failures == 0:
            return out
        # repair ONLY the failed rows (the C side NaN-fills them — an
        # unambiguous per-row marker, unlike the old all-zero sentinel a
        # legitimate row could in principle collide with) instead of
        # re-running the whole corpus through the slow numpy path
        from .audio import wav_to_mfcc_mean

        bad = np.where(np.isnan(out).any(axis=1))[0]
        for i in bad:
            out[i] = wav_to_mfcc_mean(paths[i], sample_rate, max_length_s, n_mfcc)
        return out
    from .audio import wav_to_mfcc_mean

    return np.stack([
        wav_to_mfcc_mean(p, sample_rate, max_length_s, n_mfcc) for p in paths
    ])
