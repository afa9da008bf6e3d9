"""Native (C++) host-side components, loaded via ctypes.

Compiled on first use with the system toolchain and cached next to the
source; every consumer keeps a pure-Python fallback, so environments
without a compiler lose speed, not functionality. See fasttable.cpp.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import warnings

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "fasttable.cpp")
_SO = os.path.join(_HERE, f"_fasttable_{sys.implementation.cache_tag}.so")

_lib_cache = None
_build_failed = False


def _build() -> bool:
    cxx = os.environ.get("CXX", "g++")
    cmd = [cxx, "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # compiler missing, sandboxed, ...
        warnings.warn(f"native fasttable build failed ({e}); using Python fallback")
        return False


def _lib():
    global _lib_cache, _build_failed
    if _lib_cache is not None:
        return _lib_cache
    if _build_failed:
        return None
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        if not _build():
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError as e:
        warnings.warn(f"native fasttable load failed ({e})")
        _build_failed = True
        return None
    lib.fasttable_parse.restype = ctypes.c_int
    lib.fasttable_parse.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_char, ctypes.c_char,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
        ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long),
    ]
    lib.fasttable_free.restype = None
    lib.fasttable_free.argtypes = [ctypes.POINTER(ctypes.c_double)]
    _lib_cache = lib
    return lib


def available() -> bool:
    """True when the native parser compiled and loaded."""
    return _lib() is not None


def parse_numeric_table(path, *, delimiter: str | None = None, skip: int = 0,
                        comment: str | None = "#") -> np.ndarray:
    """Parse a numeric text table natively -> (rows, cols) float64 array.

    delimiter: a single character (e.g. ","), or None for whitespace.
    skip: leading lines to skip (headers). comment: line-comment char.
    Non-numeric fields become NaN. Raises RuntimeError if the native
    library is unavailable (callers should fall back) or the file is
    ragged/unreadable.
    """
    lib = _lib()
    if lib is None:
        raise RuntimeError("native fasttable unavailable")
    data_p = ctypes.POINTER(ctypes.c_double)()
    rows = ctypes.c_long()
    cols = ctypes.c_long()
    rc = lib.fasttable_parse(
        os.fsencode(path), skip,
        delimiter.encode("ascii") if delimiter else b"\x00",
        comment.encode("ascii") if comment else b"\x00",
        ctypes.byref(data_p), ctypes.byref(rows), ctypes.byref(cols),
    )
    if rc != 0:
        raise RuntimeError(
            f"fasttable_parse({path!r}) failed with code {rc} "
            "(1=open, 2=read, 3=ragged rows, 4=alloc)"
        )
    try:
        n = rows.value * cols.value
        if n == 0:
            return np.zeros((rows.value, cols.value))
        arr = np.ctypeslib.as_array(data_p, shape=(rows.value, cols.value)).copy()
    finally:
        lib.fasttable_free(data_p)
    return arr


def read_csv_columns(path) -> dict[str, np.ndarray]:
    """Fast CSV -> dict of float64 columns keyed by (stripped) header
    names; non-numeric cells are NaN. Native fast path for the GOST
    scan-law/RV-archive loaders."""
    with open(path, "r") as f:
        header = f.readline()
    names = [c.strip() for c in header.rstrip("\n\r").split(",")]
    arr = parse_numeric_table(path, delimiter=",", skip=1, comment=None)
    if arr.shape[1] != len(names):
        raise RuntimeError(
            f"{path}: header has {len(names)} columns, data {arr.shape[1]}"
        )
    return {n: arr[:, i] for i, n in enumerate(names)}


__all__ = ["available", "parse_numeric_table", "read_csv_columns"]
