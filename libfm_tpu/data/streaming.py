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

Every learner trains out-of-core from these sources: SGD/SGDA via
`SGDLearner.learn_stream` / `SGDALearner.learn_stream` (each epoch
streams padded fixed-shape batches to the device), and the vector
MCMC/ALS engines via `MCMCVectorLearner.learn(StreamingDataset, ...)`
— their slot-layout build walks bounded `.x`/`.xt` windows and uploads
device chunks incrementally, so the full host matrix never exists
(mcmc_vector.py `_gen_stream` / `_chunk_rows_stream`). The device-side
[e|Q] caches ARE resident in HBM (that is the engine's design — the
reference's per-case `e_q_term cache[]` analog), so the per-CASE scale
axis beyond one chip's HBM is the device mesh; the HOST-memory axis
streams for every supported engine, including `-engine exact` (blocks
built from streamed `.xt` windows, COO uploaded window-by-window —
`mcmc._build_layout_stream`) and SGDA's validation stream (README
support matrix).
"""

from __future__ import annotations

import struct

import numpy as np

from libfm_tpu.data.binary import FMATRIX_FILE_ID, _FMATRIX_HEADER
from libfm_tpu.data.dataset import Dataset


def stream_sparse_binary(path: str, entry_budget: int = 10_000_000):
    """Yield (row_start, indptr, cols, vals) windows with at most
    ~entry_budget entries each (>= 1 row). indptr is window-local.

    Rows are parsed from large bulk reads (one size-walk per row over an
    in-memory buffer, one vectorised gather for all entry payloads) —
    two `f.read` syscalls per ROW would dominate every out-of-core SGD
    epoch (~10M Python-level reads at ML-10M scale)."""
    with open(path, "rb") as f:
        head = f.read(_FMATRIX_HEADER.size)
        fid, float_size, num_values, num_rows, num_cols = _FMATRIX_HEADER.unpack(
            head
        )
        if fid != FMATRIX_FILE_ID:
            raise ValueError(f"{path}: bad sparse-matrix file id {fid}")
        if float_size != 4:
            raise ValueError(f"{path}: unsupported float size {float_size}")

        CHUNK = max(1 << 22, min(entry_budget, 1 << 27) * 9)
        buf = b""
        row_start = 0
        rows_done = 0

        def _emit(wb, first, end, starts):
            """One window from buffer words [first, end): every byte
            offset is 4-aligned (rows advance by 4 + 8*size), and the
            entry payloads are contiguous except for the interleaved
            4-byte size words — mask-deleting those yields the whole
            window's (col, val) stream in one vectorised compress."""
            nonlocal row_start
            st = np.asarray(starts, dtype=np.int64)
            words = wb[first >> 2 : end >> 2]
            mask = np.ones(len(words), dtype=bool)
            mask[(st - 4 - first) >> 2] = False
            ent = words[mask]
            sizes = wb[(st - 4) >> 2].astype(np.int64)
            out = (
                row_start,
                np.concatenate([[0], np.cumsum(sizes)]),
                ent[0::2].astype(np.int32),
                ent[1::2].copy().view("<f4").astype(np.float32),
                num_rows,
                num_cols,
            )
            row_start += len(starts)
            return out

        while rows_done < num_rows:
            more = f.read(CHUNK)
            buf = buf + more if buf else more
            wb = np.frombuffer(buf, dtype="<u4", count=len(buf) >> 2)
            pos = 0
            win_first = 0
            n = len(buf)
            starts: list[int] = []  # entry byte offsets, current window
            total = 0
            while rows_done < num_rows and pos + 4 <= n:
                size = int(wb[pos >> 2])
                end = pos + 4 + 8 * size
                if end > n:
                    break
                starts.append(pos + 4)
                total += size
                pos = end
                rows_done += 1
                if total >= entry_budget:
                    yield _emit(wb, win_first, pos, starts)
                    win_first, starts, total = pos, [], 0
            if starts:
                # emit before trimming: offsets are buffer-relative
                yield _emit(wb, win_first, pos, starts)
            if rows_done < num_rows and not more and pos == 0:
                raise ValueError(f"{path}: truncated sparse-matrix file")
            buf = buf[pos:]


# ------------------------------------------- streaming MCMC layout build


def infer_position_groups(
    x_path: str, num_features: int, entry_budget: int = 10_000_000
):
    """Infer a conflict-free feature partition from a streamed .x binary:
    block := position-of-entry-within-row (the streaming analog of the
    in-memory fast path in batching.conflict_free_blocks). Returns an
    int32[num_features] block-id array, or None when the data is not
    position-structured (some feature appears at two different within-row
    positions). One bounded pass, O(num_features) host memory."""
    first = np.full(num_features, -1, dtype=np.int64)
    ok = True
    for _, indptr, cols, _, _, _ in stream_sparse_binary(x_path, entry_budget):
        lengths = np.diff(indptr).astype(np.int64)
        pos = np.arange(int(indptr[-1]), dtype=np.int64) - np.repeat(
            indptr[:-1], lengths
        )
        new = first[cols] == -1
        first[cols[new]] = pos[new]
        if not bool((first[cols] == pos).all()):
            ok = False
            break
    if not ok:
        return None
    first[first == -1] = 0  # unobserved features: any block
    return first.astype(np.int32)


def stream_greedy_partition(
    xt_path: str, num_rows: int, entry_budget: int = 10_000_000
):
    """Greedy first-fit conflict-free partition from a streamed transpose
    (.xt) — the out-of-core analog of batching.conflict_free_blocks'
    greedy path, for UNSTRUCTURED data with no -meta groups and no
    within-row position structure. Produces the IDENTICAL partition
    (same Welsh-Powell order, same first-fit, same tie-breaking) so a
    streamed run's trajectory equals the resident run's exactly.

    Pass 1 streams only the per-feature entry counts; features are then
    visited in degree-descending order through a byte-offset index into
    the .xt (one seek+read per active feature — a one-time build cost;
    the reference's HD cache seeks every refill, fmatrix.h:244-269).
    Host memory: one packed row-bitmap (num_rows/8 bytes) per block plus
    one feature's rows. Returns (block_of_feature int32,
    entries_per_feature int64) for stream_feature_blocks_any."""
    counts_l: list[np.ndarray] = []
    for _, indptr, _, _, _, _ in stream_sparse_binary(
        xt_path, entry_budget
    ):
        counts_l.append(np.diff(indptr).astype(np.int64))
    counts = (
        np.concatenate(counts_l) if counts_l else np.empty(0, np.int64)
    )
    nf = len(counts)
    # byte offset of each feature's row within the interleaved format:
    # rows are [size u32][(id u32, val f32) x size]
    offs = np.zeros(nf + 1, dtype=np.int64)
    np.cumsum(4 + 8 * counts, out=offs[1:])
    offs += _FMATRIX_HEADER.size

    active = np.nonzero(counts > 0)[0]
    order = active[np.argsort(-counts[active], kind="stable")]

    nbytes = (num_rows + 7) >> 3
    bit = np.left_shift(np.uint8(1), np.arange(8, dtype=np.uint8))
    blocks: list[np.ndarray] = []  # packed row-usage bitmaps
    block_of = np.zeros(nf, dtype=np.int32)
    with open(xt_path, "rb") as fh:
        for fi in order:
            fh.seek(offs[fi] + 4)
            raw = np.frombuffer(
                fh.read(8 * int(counts[fi])), dtype="<u4"
            )
            rf = raw[0::2].astype(np.int64)
            if len(np.unique(rf)) != len(rf):
                raise ValueError(
                    f"feature {int(fi)} appears more than once in a "
                    "single row; duplicate (row, feature) entries are "
                    "not supported — coalesce the input first"
                )
            by = rf >> 3
            bi = bit[rf & 7]
            placed = -1
            for b, used in enumerate(blocks):
                if not (used[by] & bi).any():
                    placed = b
                    break
            if placed < 0:
                blocks.append(np.zeros(nbytes, dtype=np.uint8))
                placed = len(blocks) - 1
            np.bitwise_or.at(blocks[placed], by, bi)
            block_of[fi] = placed
    return block_of, counts


def stream_feature_blocks_any(
    xt_path: str,
    block_of_feature: np.ndarray,
    num_rows: int,
    entry_budget: int = 10_000_000,
    entries_per_feature: np.ndarray | None = None,
):
    """Yield conflict-free FeatureBlocks for an ARBITRARY partition whose
    blocks interleave across the feature range (a greedy partition), with
    bounded host memory: blocks are grouped into WAVES whose total
    entries fit the budget, and the .xt is re-streamed once per wave
    collecting only that wave's features. The re-reads happen once, at
    layout-build time (the reference's HD cache re-reads every
    iteration, /root/reference/src/util/fmatrix.h:244-269)."""
    block_of_feature = np.asarray(block_of_feature, dtype=np.int64)
    if entries_per_feature is None:
        entries_per_feature = np.zeros(len(block_of_feature), np.int64)
        for f0, indptr, _, _, _, _ in stream_sparse_binary(
            xt_path, entry_budget
        ):
            entries_per_feature[f0 : f0 + len(indptr) - 1] = np.diff(indptr)
    nb = int(block_of_feature.max()) + 1 if len(block_of_feature) else 0
    per_block = np.bincount(
        block_of_feature, weights=entries_per_feature, minlength=nb
    ).astype(np.int64)
    wave: list[int] = []
    tot = 0
    waves: list[list[int]] = []
    for b in range(nb):
        if wave and tot + per_block[b] > entry_budget:
            waves.append(wave)
            wave, tot = [], 0
        wave.append(b)
        tot += int(per_block[b])
    if wave:
        waves.append(wave)
    for wv in waves:
        in_wave = np.zeros(nb, dtype=bool)
        in_wave[wv] = True
        # features outside the wave map to -1 (skipped by the streamer);
        # the partition pass already proved conflict-freeness
        bmap = np.where(
            in_wave[block_of_feature], block_of_feature, -1
        ).astype(np.int64)
        # the streamer finalises blocks by last-feature position; re-sort
        # to block-id (creation) order so the sweep order — and thus the
        # RNG trajectory — matches the in-memory greedy path exactly
        got = list(
            stream_feature_blocks(
                xt_path, bmap, num_rows, entry_budget,
                check_conflicts=False,
            )
        )
        got.sort(key=lambda blk: int(block_of_feature[blk.features[0]]))
        yield from got


def stream_feature_blocks(
    xt_path: str,
    block_of_feature: np.ndarray,
    num_rows: int,
    entry_budget: int = 10_000_000,
    check_conflicts: bool = True,
):
    """Yield conflict-free FeatureBlocks from a TRANSPOSED design matrix
    (.xt, one binary row per feature — the reference's data_t file,
    /root/reference/src/libfm/libfm.cpp:141-174) without ever holding the
    full transpose in host memory.

    `block_of_feature` assigns each feature to its block (from -meta
    groups or `infer_position_groups`). Features of a block should be
    (near-)contiguous in feature order — host memory is bounded by the
    entries of blocks still open plus one stream window; for contiguous
    blocks that is one block at a time. Conflict-freeness (no training
    row holding two features of one block) is verified exactly per block
    via a row-seen bitmap when `check_conflicts`; a violation raises
    ValueError (the in-memory builder falls back to a greedy partition;
    out-of-core cannot)."""
    from libfm_tpu.data.batching import FeatureBlock

    block_of_feature = np.asarray(block_of_feature)
    n_blocks = int(block_of_feature.max()) + 1 if len(block_of_feature) else 0
    # last feature id of each block: a block can be finalised once the
    # stream has passed it. Features with block id < 0 are SKIPPED
    # (stream_feature_blocks_any streams one wave at a time).
    sel = block_of_feature >= 0
    bmax = np.zeros(n_blocks, dtype=np.int64)
    bmax[block_of_feature[sel]] = np.nonzero(sel)[0]

    open_acc: dict[int, dict] = {}

    def _finalize(b):
        acc = open_acc.pop(b)
        feats = np.concatenate(acc["feats"])
        counts = np.concatenate(acc["counts"])
        nz = counts > 0  # zero-entry features are "unobserved": prior draws
        feats, counts = feats[nz], counts[nz]
        if not len(feats):
            return None
        return FeatureBlock(
            features=feats.astype(np.int32),
            entry_rows=np.concatenate(acc["rows"]).astype(np.int32),
            entry_vals=np.concatenate(acc["vals"]).astype(np.float32),
            entry_feat=np.repeat(
                np.arange(len(feats), dtype=np.int32), counts
            ),
            exact=True,
        )

    for f0, indptr, rows, vals, nfeat_total, _ in stream_sparse_binary(
        xt_path, entry_budget
    ):
        nf = len(indptr) - 1
        b_win = block_of_feature[f0 : f0 + nf]
        cuts = np.nonzero(np.diff(b_win))[0] + 1
        run_lo = np.concatenate([[0], cuts])
        run_hi = np.concatenate([cuts, [nf]])
        for s_, e_ in zip(run_lo, run_hi):
            b = int(b_win[s_])
            if b < 0:
                continue
            lo, hi = int(indptr[s_]), int(indptr[e_])
            acc = open_acc.setdefault(
                b,
                {
                    "feats": [],
                    "counts": [],
                    "rows": [],
                    "vals": [],
                    "used": (
                        np.zeros(num_rows, dtype=bool)
                        if check_conflicts
                        else None
                    ),
                },
            )
            acc["feats"].append(
                np.arange(f0 + s_, f0 + e_, dtype=np.int64)
            )
            acc["counts"].append(
                np.diff(indptr[s_ : e_ + 1]).astype(np.int64)
            )
            acc["rows"].append(rows[lo:hi].copy())
            acc["vals"].append(vals[lo:hi].copy())
            if check_conflicts and hi > lo:
                r = rows[lo:hi]
                if acc["used"][r].any():
                    raise ValueError(
                        f"block {b} is not conflict-free: a training row "
                        "holds two of its features (fix the -meta groups "
                        "or train in-memory)"
                    )
                acc["used"][r] = True
        last_seen = f0 + nf - 1
        for b in sorted(b for b in open_acc if bmax[b] <= last_seen):
            blk = _finalize(b)
            if blk is not None:
                yield blk
    for b in sorted(open_acc):
        blk = _finalize(b)
        if blk is not None:
            yield blk


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
            # pad the whole window at once (one fancy-indexed scatter),
            # then copy batch-sized slabs — no per-row Python loop
            nwin = len(indptr) - 1
            lengths = np.diff(indptr).astype(np.int64)
            offs = np.arange(int(indptr[-1]), dtype=np.int64) - np.repeat(
                indptr[:-1], lengths
            )
            keep = offs < max_nnz
            n_trunc = int(indptr[-1]) - int(keep.sum())
            if n_trunc:
                self.truncated_rows += int((lengths > max_nnz).sum())
                self.truncated_entries += n_trunc
            rows_e = np.repeat(
                np.arange(nwin, dtype=np.int64), lengths
            )[keep]
            offs_e = offs[keep]
            w_ids = np.zeros((nwin, max_nnz), dtype=np.int32)
            w_vals = np.zeros((nwin, max_nnz), dtype=np.float32)
            w_ids[rows_e, offs_e] = cols[keep]
            w_vals[rows_e, offs_e] = vals[keep]
            w_y = np.asarray(
                self.target[row_start : row_start + nwin], dtype=np.float32
            )
            done = 0
            while done < nwin:
                take = min(batch_size - fill, nwin - done)
                buf_ids[fill : fill + take] = w_ids[done : done + take]
                buf_vals[fill : fill + take] = w_vals[done : done + take]
                buf_y[fill : fill + take] = w_y[done : done + take]
                fill += take
                done += take
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
