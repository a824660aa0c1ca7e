"""ctypes bindings for the native C++ MIDI tokenizer.

``tokenize_midi_native(bytes) → (npenc, ins_dict)`` is a drop-in,
bit-identical replacement for the Python `load_score` → `score_to_npenc`
pipeline (validated in tests), at native throughput. Falls back to the pure
Python path when the shared library is absent; ``ensure_built()`` compiles it
on demand with the repo Makefile.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libdmg_midi.so")
_lib = None


def ensure_built(force: bool = False) -> bool:
    """Build the shared library if missing. Returns availability."""
    global _lib
    if _lib is not None and not force:
        return True
    if force or not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return False
    return _load()


def _load() -> bool:
    global _lib
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.dmg_tokenize_midi.restype = ctypes.c_int
        lib.dmg_tokenize_midi.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ]
        _lib = lib
        return True
    except OSError:
        return False


def available() -> bool:
    return _lib is not None or (os.path.exists(_LIB_PATH) and _load())


def tokenize_midi_native(data: bytes, quantize: bool = True,
                         max_rows: int = 1 << 18
                         ) -> Optional[Tuple[np.ndarray, Dict[int, str]]]:
    """MIDI bytes → (npenc (N,3) int64, ins_dict part→class-name).

    Returns None when the native library is unavailable or parsing fails
    (callers fall back to the Python path).
    """
    from ..vocab import ACCEP_INS_REV

    if _lib is None and not available():
        return None
    buf = np.frombuffer(data, dtype=np.uint8)
    out = np.empty((max_rows, 3), dtype=np.int32)
    ins = np.empty(64, dtype=np.int32)
    n_parts = ctypes.c_int32(0)
    n = _lib.dmg_tokenize_midi(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), max_rows,
        ins.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), 64,
        ctypes.byref(n_parts), 1 if quantize else 0)
    if n < 0:
        return None
    npenc = out[:n].astype(np.int64)
    ins_dict = {i: ACCEP_INS_REV[int(ins[i])] for i in range(min(n_parts.value, 64))}
    return npenc, ins_dict


def tokenize_file_native(path, quantize: bool = True):
    with open(path, "rb") as f:
        return tokenize_midi_native(f.read(), quantize)
