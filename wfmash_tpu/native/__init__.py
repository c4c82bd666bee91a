"""Native (C++) host components, loaded via ctypes.

The shared library is compiled lazily from winnow.cpp on first use (g++ -O3)
and cached next to the source. Every entry point has a pure-Python
equivalent (wfmash_tpu.sketch.winnow / kmers) used as a fallback and as the
cross-check oracle in tests.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import tempfile
from pathlib import Path

import numpy as np

from ..sketch.winnow import RECORD_DTYPE

_DIR = Path(__file__).parent
_SRC = _DIR / "winnow.cpp"
_LIB = _DIR / "_winnow.so"

_lib = None
_tried = False

# disk layout of the C Record struct (packed to 8-byte alignment)
_C_RECORD_DTYPE = np.dtype(
    [
        ("hash", "<u8"),
        ("wpos", "<i8"),
        ("wend", "<i8"),
        ("seq_id", "<i4"),
        ("strand", "<i1"),
        ("_pad", "V3"),
    ]
)


def _compile() -> bool:
    try:
        cmd = [
            "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
            str(_SRC), "-o", str(_LIB),
        ]
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        print(f"[wfmash-tpu] native build failed ({e}); using Python fallback",
              file=sys.stderr)
        return False


def get_lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        if not _compile():
            return None
    try:
        lib = ctypes.CDLL(str(_LIB))
    except OSError:
        return None
    lib.winnow_scan.restype = ctypes.c_int64
    lib.winnow_scan.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int32, ctypes.POINTER(ctypes.c_void_p),
    ]
    lib.free_records.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def winnow_minmers_native(seq: bytes, k: int, window_size: int,
                          sketch_size: int, seq_id: int = 0):
    """Native windowed minmer scan; returns RECORD_DTYPE array or None if
    the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    out = ctypes.c_void_p()
    n = lib.winnow_scan(
        bytes(seq), len(seq), k, window_size, sketch_size, seq_id,
        ctypes.byref(out),
    )
    if n <= 0 or not out.value:
        if out.value:
            lib.free_records(out)
        return np.empty(0, dtype=RECORD_DTYPE)
    raw = ctypes.string_at(out.value, n * _C_RECORD_DTYPE.itemsize)
    lib.free_records(out)
    c_rec = np.frombuffer(raw, dtype=_C_RECORD_DTYPE)
    rec = np.empty(n, dtype=RECORD_DTYPE)
    rec["hash"] = c_rec["hash"]
    rec["wpos"] = c_rec["wpos"]
    rec["wpos_end"] = c_rec["wend"]
    rec["seq_id"] = c_rec["seq_id"]
    rec["strand"] = c_rec["strand"]
    return rec
