"""Out-of-core data path (data >> host RAM).

Reference counterpart: LargeSparseMatrixHD — a disk-backed sparse matrix
with a bounded row/entry cache refilled on demand
(/root/reference/src/util/fmatrix.h:165-281; auto cache sizing :193-230).

Two TPU-native mechanisms replace it:

1. `stream_sparse_binary(path, entry_budget)` — a generator over the
   reference's interleaved binary format yielding bounded CSR windows
   (the readcache() analog), used by the tools and the streaming trainer.

2. The **flat binary format** (`.fm.npz`, uncompressed numpy archive of
   indptr/cols/vals/target) — memory-mappable, so `Dataset.from_flat(...,
   mmap=True)` gives O(1)-RAM random access that the interleaved format
   cannot; `StreamingDataset` batches from either source without
   materialising the whole matrix.

SGD trains out-of-core via `SGDLearner` + `StreamingDataset.iter_batches`
(each epoch streams padded fixed-shape batches to the device). The
MCMC/ALS engines need resident caches by design (like the reference,
whose MCMC also loads transposes fully); their scale axis is the device
mesh, not host streaming.
"""

from __future__ import annotations

import struct

import numpy as np

from libfm_tpu.data.binary import FMATRIX_FILE_ID, _FMATRIX_HEADER
from libfm_tpu.data.dataset import Dataset


def stream_sparse_binary(path: str, entry_budget: int = 10_000_000):
    """Yield (row_start, indptr, cols, vals) windows with at most
    ~entry_budget entries each (>= 1 row). indptr is window-local."""
    with open(path, "rb") as f:
        head = f.read(_FMATRIX_HEADER.size)
        fid, float_size, num_values, num_rows, num_cols = _FMATRIX_HEADER.unpack(
            head
        )
        if fid != FMATRIX_FILE_ID:
            raise ValueError(f"{path}: bad sparse-matrix file id {fid}")
        if float_size != 4:
            raise ValueError(f"{path}: unsupported float size {float_size}")

        row_start = 0
        while row_start < num_rows:
            sizes = [0]
            chunks = []
            total = 0
            rows_here = 0
            while row_start + rows_here < num_rows and total < entry_budget:
                (size,) = struct.unpack("<I", f.read(4))
                raw = f.read(8 * size)
                chunks.append(np.frombuffer(raw, dtype=np.uint8))
                total += size
                sizes.append(total)
                rows_here += 1
            entries = (
                np.concatenate(chunks).view("<u4").reshape(-1, 2)
                if chunks
                else np.empty((0, 2), "<u4")
            )
            cols = entries[:, 0].astype(np.int32)
            vals = entries[:, 1].copy().view("<f4").astype(np.float32)
            yield (
                row_start,
                np.asarray(sizes, dtype=np.int64),
                cols,
                vals,
                num_rows,
                num_cols,
            )
            row_start += rows_here


# ------------------------------------------------------------- flat format


def save_flat(ds: Dataset, prefix: str) -> None:
    """Write the memmap-able flat format: one .npy per array under
    `<prefix>.<name>.npy` (np.load(mmap_mode='r') memory-maps plain .npy
    files, unlike npz members)."""
    np.save(prefix + ".indptr.npy", np.asarray(ds.indptr, dtype=np.int64))
    np.save(prefix + ".cols.npy", np.asarray(ds.cols, dtype=np.int32))
    np.save(prefix + ".vals.npy", np.asarray(ds.vals, dtype=np.float32))
    np.save(prefix + ".target.npy", np.asarray(ds.target, dtype=np.float32))
    np.save(
        prefix + ".meta.npy", np.asarray([ds.num_features], dtype=np.int64)
    )


def load_flat(prefix: str, mmap: bool = True) -> Dataset:
    mm = "r" if mmap else None
    return Dataset(
        np.load(prefix + ".indptr.npy", mmap_mode=mm),
        np.load(prefix + ".cols.npy", mmap_mode=mm),
        np.load(prefix + ".vals.npy", mmap_mode=mm),
        np.asarray(np.load(prefix + ".target.npy")),
        int(np.load(prefix + ".meta.npy")[0]),
    )


class StreamingDataset:
    """Bounded-memory batch iterator over a binary pair (.x, .y).

    Targets are loaded resident (4 bytes/row); the design matrix streams
    in entry-budgeted windows like the reference's HD cache.
    """

    def __init__(self, x_path: str, y_path: str, entry_budget: int = 10_000_000):
        from libfm_tpu.data import binary as binio

        self.x_path = x_path
        self.target = binio.read_dvector_binary(y_path, dtype=np.float32)
        self.entry_budget = entry_budget
        # one cheap pass for dims
        with open(x_path, "rb") as fh:
            head = fh.read(_FMATRIX_HEADER.size)
        _, _, self.nnz, self.num_rows, self.num_features = (
            _FMATRIX_HEADER.unpack(head)
        )
        if self.num_rows != len(self.target):
            raise ValueError(
                f"{x_path}: {self.num_rows} rows != {len(self.target)} targets"
            )
        self.min_target = float(self.target.min()) if len(self.target) else 0.0
        self.max_target = float(self.target.max()) if len(self.target) else 0.0
        self._max_row_nnz: int | None = None
        #: rows truncated by the most recent iter_batches() pass
        self.truncated_rows = 0
        #: entries dropped by the most recent iter_batches() pass
        self.truncated_entries = 0

    def binarize_targets(self) -> None:
        """Map targets to +-1 for classification
        (/root/reference/src/libfm/libfm.cpp:302-305)."""
        self.target = np.where(self.target > 0.0, 1.0, -1.0).astype(np.float32)
        self.min_target, self.max_target = -1.0, 1.0

    def max_row_nnz(self) -> int:
        """Max entries in any row, from one buffered streaming pass
        (window-sized numpy diffs, not per-row syscalls — at ML-10M
        scale a Python read/seek per row costs tens of seconds)."""
        if self._max_row_nnz is None:
            best = 0
            for _, indptr, _, _, _, _ in stream_sparse_binary(
                self.x_path, self.entry_budget
            ):
                if len(indptr) > 1:
                    best = max(best, int(np.diff(indptr).max()))
            self._max_row_nnz = best
        return self._max_row_nnz

    def iter_batches(self, batch_size: int, max_nnz: int):
        """Yield (ids[B, L], vals[B, L], y[B], mask[B]) padded batches.

        Rows with more than max_nnz entries are truncated; the count of
        truncated rows/entries for the pass is recorded in
        `self.truncated_rows` / `self.truncated_entries` (use
        `max_row_nnz()` to pick a lossless max_nnz). The final partial
        batch is zero-padded.
        """
        buf_ids = np.zeros((batch_size, max_nnz), dtype=np.int32)
        buf_vals = np.zeros((batch_size, max_nnz), dtype=np.float32)
        buf_y = np.zeros(batch_size, dtype=np.float32)
        fill = 0
        self.truncated_rows = 0
        self.truncated_entries = 0
        for row_start, indptr, cols, vals, _, _ in stream_sparse_binary(
            self.x_path, self.entry_budget
        ):
            for i in range(len(indptr) - 1):
                s, e = indptr[i], indptr[i + 1]
                ln = min(int(e - s), max_nnz)
                if e - s > ln:
                    self.truncated_rows += 1
                    self.truncated_entries += int(e - s) - ln
                buf_ids[fill, :ln] = cols[s : s + ln]
                buf_vals[fill, :ln] = vals[s : s + ln]
                buf_y[fill] = self.target[row_start + i]
                fill += 1
                if fill == batch_size:
                    mask = np.ones(batch_size, dtype=bool)
                    yield buf_ids, buf_vals, buf_y, mask
                    buf_ids = np.zeros_like(buf_ids)
                    buf_vals = np.zeros_like(buf_vals)
                    buf_y = np.zeros_like(buf_y)
                    fill = 0
        if fill:
            mask = np.zeros(batch_size, dtype=bool)
            mask[:fill] = True
            yield buf_ids, buf_vals, buf_y, mask
