"""Device batch layouts.

Two layouts feed the compute kernels:

1. `BatchedCSR` — padded row-major batches `(ids[B,L], vals[B,L], y[B])`
   for the forward / SGD path. Rows are padded to a per-dataset max-nnz
   bucket; padding entries use feature id 0 with value 0.0 so every
   contribution they make to the model (w[id]*0, v[id]*0) vanishes —
   no masks needed in the hot loop.

2. `conflict_free_blocks` — the ALS/MCMC coordinate-sweep partition:
   a CSC ordering (entries sorted by feature) sliced into conflict-free
   feature blocks, plus the row-sorted CSR ordering used to rebuild the
   per-case q caches. This is the device-friendly restatement of the
   reference's transpose iteration (/root/reference/src/libfm/src/
   fm_learn_mcmc.h:176-305) with the per-coordinate serial chain replaced
   by block-parallel segment-sums (see learners/mcmc.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from libfm_tpu.data.dataset import Dataset


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclass
class BatchedCSR:
    """Padded row-major batches. ids/vals have shape [num_batches, B, L]."""

    ids: np.ndarray  # int32
    vals: np.ndarray  # float32
    y: np.ndarray  # float32 [num_batches, B]
    row_mask: np.ndarray  # bool [num_batches, B] — False for padded rows
    num_rows: int  # true number of examples
    num_features: int

    @property
    def num_batches(self) -> int:
        return self.ids.shape[0]

    @property
    def batch_size(self) -> int:
        return self.ids.shape[1]

    @property
    def max_nnz(self) -> int:
        return self.ids.shape[2]


def pad_rows(ds: Dataset, max_nnz: int | None = None, align: int = 8):
    """Pad every row to a common length. Returns (ids[n,L], vals[n,L]).

    Rows longer than an explicit max_nnz are TRUNCATED (keeping the
    first max_nnz entries, like the streaming reader); previously such
    rows crashed the scatter with an opaque IndexError."""
    lengths = np.diff(ds.indptr).astype(np.int64)
    L = int(lengths.max()) if max_nnz is None and len(lengths) else (max_nnz or 1)
    L = max(1, _round_up(L, align))
    # truncate at the REQUESTED max_nnz, not the align-rounded width —
    # keeps in-core and streamed passes over the same data identical
    cut = L if max_nnz is None else max(1, min(max_nnz, L))
    n = ds.num_rows
    ids = np.zeros((n, L), dtype=np.int32)
    vals = np.zeros((n, L), dtype=np.float32)
    # scatter entries into the padded layout
    row = np.repeat(np.arange(n, dtype=np.int64), lengths)
    offs = np.arange(ds.nnz, dtype=np.int64) - np.repeat(ds.indptr[:-1], lengths)
    keep = offs < cut
    ids[row[keep], offs[keep]] = ds.cols[keep]
    vals[row[keep], offs[keep]] = ds.vals[keep]
    return ids, vals


def batch_dataset(
    ds: Dataset,
    batch_size: int,
    max_nnz: int | None = None,
    align: int = 1,
    drop_remainder: bool = False,
) -> BatchedCSR:
    """Batch a dataset into padded [num_batches, B, L] arrays.

    The final partial batch is padded with zero rows (row_mask False);
    padded rows have target 0 and contribute nothing when masked metrics
    are used.

    align=1 (the default) pads L to the true max row nnz: padded
    entries are mathematically inert (id 0, value 0) but still cost one
    gather + one scatter row-op each in the SGD epoch — measured
    ~14-22 ns/entry, so an L=2 dataset padded to 8 wastes 3/4 of the
    epoch (BENCHNOTES "SGD scatter pipeline").
    """
    ids, vals = pad_rows(ds, max_nnz=max_nnz, align=align)
    n = ds.num_rows
    if drop_remainder:
        nb = n // batch_size
        n_used = nb * batch_size
        ids, vals = ids[:n_used], vals[:n_used]
        y = ds.target[:n_used]
        mask = np.ones(n_used, dtype=bool)
    else:
        nb = max(1, (n + batch_size - 1) // batch_size)
        n_pad = nb * batch_size
        pad = n_pad - n
        ids = np.pad(ids, ((0, pad), (0, 0)))
        vals = np.pad(vals, ((0, pad), (0, 0)))
        y = np.pad(ds.target, (0, pad))
        mask = np.zeros(n_pad, dtype=bool)
        mask[:n] = True
    L = ids.shape[1]
    return BatchedCSR(
        ids.reshape(nb, batch_size, L),
        vals.reshape(nb, batch_size, L),
        y.reshape(nb, batch_size).astype(np.float32),
        mask.reshape(nb, batch_size),
        num_rows=n,
        num_features=ds.num_features,
    )


# --------------------------------------------------------------------------
# Coordinate-sweep layout (ALS / MCMC)
# --------------------------------------------------------------------------


@dataclass
class FeatureBlock:
    """A conflict-free set of features: no training row contains two
    features of the same block, so all coordinates in the block can be
    updated in parallel from a cache snapshot with results identical to
    updating them sequentially (they are conditionally independent given
    the rest)."""

    features: np.ndarray  # int32 [F] global feature ids in this block
    entry_rows: np.ndarray  # int32 [E] training-row index of each entry
    entry_vals: np.ndarray  # float32 [E]
    entry_feat: np.ndarray  # int32 [E] position (0..F-1) within `features`
    exact: bool = True  # False if the block was formed heuristically


def _groups_conflict_free(ds: Dataset, attr_group: np.ndarray) -> bool:
    """True iff no training row holds two features of the same group."""
    g_of_entry = attr_group[ds.cols].astype(np.int64)
    key = ds.row_of_entry.astype(np.int64) * (int(attr_group.max()) + 1) + g_of_entry
    return len(np.unique(key)) == len(key)


def conflict_free_blocks(
    ds: Dataset,
    attr_group: np.ndarray | None = None,
    max_greedy_features: int = 2_000_000,
):
    """Partition features into conflict-free blocks.

    Fast path: if an attribute->group map is given and every training row
    contains at most one active feature per group (field-structured data:
    one-hot recommender or CTR data), each group is a conflict-free block.
    Otherwise first-fit greedy over features using per-row block-usage
    bitmasks; for field-structured data this also recovers the fields.

    Returns list[FeatureBlock] covering all features that appear in the
    data (features with zero entries are handled separately by the
    learner: their posterior is the prior, matching
    /root/reference/src/libfm/src/fm_learn_mcmc.h:467-476).
    """
    t_indptr, t_rows, t_vals = ds.transpose()
    n_feat = ds.num_features
    n_rows = ds.num_rows

    if attr_group is not None and ds.nnz:
        attr_group = np.asarray(attr_group)
        # skip the O(nnz log nnz) uniqueness check when it cannot succeed
        # (a single group with any multi-entry row is never conflict-free)
        trivial = int(attr_group.max()) == 0 and bool(
            (np.diff(ds.indptr) > 1).any()
        )
        if not trivial and _groups_conflict_free(ds, attr_group):
            # every (row, group) pair is unique -> groups are conflict-free
            return _blocks_from_feature_sets(
                t_indptr,
                t_rows,
                t_vals,
                [
                    np.nonzero(
                        (attr_group == g) & (np.diff(t_indptr) > 0)
                    )[0].astype(np.int32)
                    for g in range(int(attr_group.max()) + 1)
                ],
            )

    # Vectorised fast path: try block := position-of-entry-within-row.
    # For field-structured data with per-row sorted columns (one-hot
    # recommender / CTR data) every feature always occupies the same
    # position, which yields a conflict-free partition in O(nnz) numpy —
    # the greedy loop below costs ~20 s at ML-10M scale, this costs <1 s.
    if ds.nnz:
        lengths = np.diff(ds.indptr).astype(np.int64)
        pos = np.arange(ds.nnz, dtype=np.int64) - np.repeat(
            ds.indptr[:-1], lengths
        )
        # feature -> candidate block = position of its FIRST occurrence
        first = np.full(n_feat, -1, dtype=np.int64)
        # reversed so earlier entries win
        first[ds.cols[::-1]] = pos[::-1]
        blk_of_entry = first[ds.cols]
        if bool((blk_of_entry == pos).all()):
            # block == within-row position makes (row, block) unique by
            # construction: an exact conflict-free partition
            n_blocks = int(pos.max()) + 1
            feats_by_block = [
                np.nonzero((first == b) & (np.diff(t_indptr) > 0))[0]
                .astype(np.int32)
                for b in range(n_blocks)
            ]
            return _blocks_from_feature_sets(
                t_indptr, t_rows, t_vals, feats_by_block
            )

    # Greedy first-fit: maintain for each block a boolean row-usage array.
    # To stay O(nnz * avg_probes) we try blocks in order and pick the first
    # with no overlap. For field-structured data the number of blocks is
    # the max row nnz (tiny), so this is fast.
    blocks_used: list[np.ndarray] = []  # per block: bool[n_rows]
    blocks_feats: list[list[int]] = []

    active = np.nonzero(np.diff(t_indptr) > 0)[0]
    # Welsh-Powell order (degree = rows touched, descending): high-degree
    # features placed first pack into fewer, more size-balanced blocks
    # than natural order — measured 29 -> 23 blocks (sizes 1..1730 ->
    # ~1000 uniform) on the fat-block BS probe, which directly cuts the
    # engine's sequential block-step count (BENCHNOTES round-3 BS notes)
    deg = (t_indptr[active + 1] - t_indptr[active]).astype(np.int64)
    active = active[np.argsort(-deg, kind="stable")]
    for f in active:
        rows_f = t_rows[t_indptr[f] : t_indptr[f + 1]]
        if len(np.unique(rows_f)) != len(rows_f):
            # a row listing the same feature twice would silently break
            # the layouts' one-slot-per-(row, feature) assumption (and
            # the unique-indices scatter promises); the conflict-free
            # fast paths above reject such data by construction
            raise ValueError(
                f"feature {int(f)} appears more than once in a single "
                "row; duplicate (row, feature) entries are not supported "
                "— coalesce the input first"
            )
        placed = False
        for b in range(len(blocks_used)):
            if not blocks_used[b][rows_f].any():
                blocks_used[b][rows_f] = True
                blocks_feats[b].append(int(f))
                placed = True
                break
        if not placed:
            used = np.zeros(n_rows, dtype=bool)
            used[rows_f] = True
            blocks_used.append(used)
            blocks_feats.append([int(f)])

    # within-block feature order: natural ascending (the Welsh-Powell
    # VISIT order must not leak into the layout — the streamed greedy
    # partition collects block features in natural order, and the two
    # paths must build identical layouts for exact streamed==resident
    # trajectory parity)
    return _blocks_from_feature_sets(
        t_indptr,
        t_rows,
        t_vals,
        [np.sort(np.asarray(f, dtype=np.int32)) for f in blocks_feats],
    )


def _blocks_from_feature_sets(t_indptr, t_rows, t_vals, feature_sets):
    out = []
    for feats_arr in feature_sets:
        if len(feats_arr) == 0:
            continue
        sizes = (t_indptr[feats_arr + 1] - t_indptr[feats_arr]).astype(np.int64)
        entry_feat = np.repeat(np.arange(len(feats_arr), dtype=np.int32), sizes)
        # gather each feature's CSC slice (vectorised index build)
        starts = np.repeat(t_indptr[feats_arr], sizes)
        offs = np.arange(int(sizes.sum()), dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(sizes)[:-1]]), sizes
        )
        idx = starts + offs
        out.append(
            FeatureBlock(
                feats_arr,
                t_rows[idx].astype(np.int32),
                t_vals[idx].astype(np.float32),
                entry_feat,
                exact=True,
            )
        )
    return out
