"""Transpose a binary sparse matrix (.x -> .xt).

Equivalent of the reference `transpose` tool
(/root/reference/src/libfm/tools/transpose.cpp:53-170), same flags
(--ifile, --ofile, --cache_size in MiB, default 200 like the
reference's :83).

Two paths, chosen by the cache budget like the reference:

- whole matrix fits in the cache: one in-memory counting-sort pass
  (native C++ when available);
- otherwise MULTI-PASS OUT-OF-CORE: one streaming pass counts entries
  per column, then consecutive column blocks sized to the cache are
  filled by re-streaming the input and appended to the output — the
  bounded column-block algorithm of transpose.cpp:125-161, so matrices
  far larger than host RAM transpose in
  O(num_passes * input_size) I/O with O(cache) memory.
"""

from __future__ import annotations

import argparse
import struct
import sys

import numpy as np


def transpose_streaming(
    ifile: str, ofile: str, cache_entries: int, entry_budget: int | None = None
) -> None:
    """Out-of-core transpose with at most ~cache_entries entries of
    column-block cache resident at once."""
    from libfm_tpu.data.binary import FMATRIX_FILE_ID, _FMATRIX_HEADER
    from libfm_tpu.data.streaming import stream_sparse_binary

    if entry_budget is None:
        entry_budget = max(1, min(cache_entries, 10_000_000))

    with open(ifile, "rb") as f:
        head = f.read(_FMATRIX_HEADER.size)
    fid, float_size, num_values, num_rows, num_cols = _FMATRIX_HEADER.unpack(head)
    if fid != FMATRIX_FILE_ID:
        raise ValueError(f"{ifile}: bad sparse-matrix file id {fid}")

    # pass 1: entries per column (transpose.cpp:89-97)
    counts = np.zeros(num_cols, dtype=np.int64)
    for _, _, cols, _, _, _ in stream_sparse_binary(ifile, entry_budget):
        if len(cols):
            counts += np.bincount(cols, minlength=num_cols)

    with open(ofile, "wb") as out:
        out.write(
            _FMATRIX_HEADER.pack(
                FMATRIX_FILE_ID, 4, int(num_values), num_cols, num_rows
            )
        )
        # passes 2..N: fill consecutive column blocks sized to the cache
        # (transpose.cpp:125-161)
        col_lo = 0
        while col_lo < num_cols:
            col_hi = col_lo
            total = 0
            while col_hi < num_cols and (
                total + counts[col_hi] <= cache_entries or col_hi == col_lo
            ):
                total += int(counts[col_hi])
                col_hi += 1
            blk_counts = counts[col_lo:col_hi]
            blk_indptr = np.zeros(len(blk_counts) + 1, dtype=np.int64)
            np.cumsum(blk_counts, out=blk_indptr[1:])
            blk_rows = np.empty(int(total), dtype="<u4")
            blk_vals = np.empty(int(total), dtype="<f4")
            cursor = blk_indptr[:-1].copy()
            for row0, indptr, cols, vals, _, _ in stream_sparse_binary(
                ifile, entry_budget
            ):
                if not len(cols):
                    continue
                sel = (cols >= col_lo) & (cols < col_hi)
                if not sel.any():
                    continue
                c_sel = cols[sel].astype(np.int64) - col_lo
                rows_of = row0 + np.repeat(
                    np.arange(len(indptr) - 1, dtype=np.int64),
                    np.diff(indptr),
                )[sel]
                v_sel = vals[sel]
                # stable per-column placement preserving row order:
                # entries stream in row-major order, so a running cursor
                # per column keeps each column's rows sorted
                order = np.argsort(c_sel, kind="stable")
                c_o = c_sel[order]
                uniq, start_idx, cnt = np.unique(
                    c_o, return_index=True, return_counts=True
                )
                pos = (
                    np.repeat(cursor[uniq], cnt)
                    + np.arange(len(c_o), dtype=np.int64)
                    - np.repeat(start_idx, cnt)
                )
                cursor[uniq] += cnt
                blk_rows[pos] = rows_of[order].astype("<u4")
                blk_vals[pos] = v_sel[order].astype("<f4")
            # append the block's columns to the output
            for j in range(col_hi - col_lo):
                s, e = int(blk_indptr[j]), int(blk_indptr[j + 1])
                out.write(struct.pack("<I", e - s))
                if e > s:
                    inter = np.empty(2 * (e - s), dtype="<u4")
                    inter[0::2] = blk_rows[s:e]
                    inter[1::2] = blk_vals[s:e].view("<u4")
                    out.write(inter.tobytes())
            col_lo = col_hi


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="libfm-tpu-transpose")
    p.add_argument("--ifile", required=True)
    p.add_argument("--ofile", required=True)
    p.add_argument(
        "--cache_size", type=float, default=200.0,
        help="column-block cache budget in MiB (reference default 200, "
        "transpose.cpp:83); matrices larger than this transpose "
        "out-of-core in multiple passes",
    )
    args = p.parse_args(argv)

    from libfm_tpu.data import binary as binio
    from libfm_tpu.data.binary import _FMATRIX_HEADER

    with open(args.ifile, "rb") as f:
        head = f.read(_FMATRIX_HEADER.size)
    _, _, num_values, num_rows, num_cols = _FMATRIX_HEADER.unpack(head)
    print(
        f"num_rows={num_rows}\tnum_values={int(num_values)}\t"
        f"num_features={num_cols}"
    )
    cache_entries = int(args.cache_size * (1 << 20)) // 8  # 8 B/entry
    if num_values > cache_entries:
        transpose_streaming(args.ifile, args.ofile, cache_entries)
        return 0

    from libfm_tpu.data.dataset import _csr_transpose

    indptr, cols, vals, num_rows, num_cols = binio.read_sparse_binary(args.ifile)
    try:
        from libfm_tpu.native import fastdata

        if fastdata.available():
            t_indptr, t_rows, t_vals = fastdata.csr_transpose(
                indptr, cols, vals, num_rows, num_cols
            )
        else:
            raise ImportError
    except ImportError:
        t_indptr, t_rows, t_vals = _csr_transpose(
            indptr, cols, vals, num_rows, num_cols
        )
    binio.write_sparse_binary(args.ofile, t_indptr, t_rows, t_vals, num_rows)
    return 0


if __name__ == "__main__":
    sys.exit(main())
