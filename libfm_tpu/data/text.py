"""libFM text-format reader/writer.

The libFM text format is one example per line:

    <target> <feature_id>:<value> <feature_id>:<value> ...

Lines starting with '#' and blank lines are skipped; '#' also starts a
trailing comment. Reference parser (two-pass sscanf):
/root/reference/src/libfm/src/Data.h:191-285.

This implementation is vectorised host code: the whole file is split with
numpy string ops instead of a per-token scanf loop, and an optional C++
native parser (libfm_tpu.native) is used when available for large files.
"""

from __future__ import annotations

import numpy as np


def _clean_lines(raw: str) -> list[str]:
    out = []
    for line in raw.split("\n"):
        # strip trailing comment, then whitespace
        hash_pos = line.find("#")
        if hash_pos >= 0:
            line = line[:hash_pos]
        line = line.strip()
        if line:
            out.append(line)
    return out


def parse_libfm_text(path: str):
    """Parse a libFM text file into CSR arrays.

    Returns (indptr[int64, n+1], cols[int32, nnz], vals[float32, nnz],
    target[float32, n], num_features).

    num_features is max(feature_id)+1 as in the reference
    (/root/reference/src/libfm/src/Data.h:227-229).
    """
    try:
        from libfm_tpu.native import fastdata

        if fastdata.available():
            return fastdata.parse_libfm_text(path)
    except ImportError:
        pass
    return _parse_libfm_text_numpy(path)


def _parse_libfm_text_numpy(path: str):
    with open(path, "r") as f:
        raw = f.read()
    lines = _clean_lines(raw)
    n = len(lines)
    target = np.empty(n, dtype=np.float32)
    indptr = np.zeros(n + 1, dtype=np.int64)
    cols_parts: list[np.ndarray] = []
    vals_parts: list[np.ndarray] = []

    # Vectorised parse: join everything, split tokens per line.
    nnz = 0
    for i, line in enumerate(lines):
        toks = line.split()
        target[i] = float(toks[0])
        row_nnz = len(toks) - 1
        if row_nnz:
            pairs = np.char.partition(np.asarray(toks[1:]), ":")
            cols_parts.append(pairs[:, 0].astype(np.int32))
            vals_parts.append(pairs[:, 2].astype(np.float32))
        nnz += row_nnz
        indptr[i + 1] = nnz

    if cols_parts:
        cols = np.concatenate(cols_parts)
        vals = np.concatenate(vals_parts)
        num_features = int(cols.max()) + 1
    else:
        cols = np.empty(0, dtype=np.int32)
        vals = np.empty(0, dtype=np.float32)
        num_features = 0
    return indptr, cols, vals, target, num_features


def write_libfm_text(path: str, indptr, cols, vals, target) -> None:
    """Write CSR arrays to libFM text format (inverse of parse_libfm_text)."""
    try:
        from libfm_tpu.native import fastdata

        if fastdata.available() and fastdata.write_libfm_text(
            path, indptr, cols, vals, target
        ):
            return
    except ImportError:
        pass
    n = len(target)
    with open(path, "w") as f:
        for i in range(n):
            s, e = int(indptr[i]), int(indptr[i + 1])
            feats = " ".join(
                f"{int(cols[j])}:{_fmt(vals[j])}" for j in range(s, e)
            )
            t = _fmt(target[i])
            f.write(f"{t} {feats}\n" if feats else f"{t}\n")


def _fmt(x) -> str:
    x = float(x)
    if x == int(x) and abs(x) < 1e15:
        return str(int(x))
    return repr(x)
