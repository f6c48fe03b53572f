"""Bucketed slot layout for the vector-sweep (joint-draw) engine.

Motivation (measured on v5e, see BENCHNOTES.md): every XLA gather /
scatter / segment-sum on TPU costs ~10-15 ns per ROW regardless of row
width up to ~256B, while dense math is nearly free in comparison. The
coordinate-wise Gibbs sweep (learners/mcmc.py) does O(k) row passes per
iteration; the vector engine does O(1) row passes by drawing each
feature's whole (w_j, v_j) vector jointly from its exact conditional
(blocked Gibbs; ALS becomes vector-wise block coordinate descent).

This module builds the static device layout for that engine. For one
conflict-free feature block (no training row holds two of its features):

- entries are sorted by feature;
- each feature's entry list is cut into SEGMENTS of a fixed width W,
  with W chosen per feature count from `widths` (padding <= 2x), large
  features spanning several segments;
- per width bucket: `slot_case[nseg, W]` (train-row index, sentinel
  `num_rows` for padding), `slot_val[nseg, W]` (0 at padding), and
  `seg_feat[nseg]` (the feature of each segment, sorted — so per-feature
  reduction over segments is a sorted segment-sum over a SMALL array).

All index arrays are static across iterations — only the gathered values
change — so XLA caches the layouts in HBM untouched.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class WidthBucket:
    width: int
    slot_case: np.ndarray  # int32 [nseg, W] (sentinel = num_rows)
    slot_val: np.ndarray  # float32 [nseg, W]
    seg_feat: np.ndarray  # int32 [nseg] — index into the block's features

    @property
    def nseg(self) -> int:
        return len(self.seg_feat)


@dataclass
class VectorBlockLayout:
    """One conflict-free block, bucketed for the vector sweep."""

    features: np.ndarray  # int32 [F] global feature ids
    groups: np.ndarray  # int32 [F]
    buckets: list  # list[WidthBucket]
    num_features: int  # F


def build_block_layout(
    features: np.ndarray,
    entry_rows: np.ndarray,
    entry_vals: np.ndarray,
    entry_feat: np.ndarray,  # position 0..F-1 within `features`
    groups: np.ndarray,
    num_rows: int,
    widths: tuple = (8, 64, 512),
) -> VectorBlockLayout:
    F = len(features)
    order = np.argsort(entry_feat, kind="stable")
    ef = entry_feat[order]
    er = entry_rows[order]
    ev = entry_vals[order]
    counts = np.bincount(ef, minlength=F)
    starts = np.zeros(F + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])

    # Chunk each feature's entry list, minimising padded slots first and
    # segment count second: full chunks use the largest width <= the
    # remaining count, but a tail is emitted as ONE rounded-up segment
    # whenever that wastes no more slots than chopping it (a 126-entry
    # feature becomes 64 + 62->64pad, never seven 8-wide segments).
    per_bucket: dict[int, list] = {w: [] for w in widths}  # w -> [(feat, lo, hi)]
    desc = sorted(widths, reverse=True)
    asc = sorted(widths)
    for j in range(F):
        c = int(counts[j])
        if c == 0:
            continue
        lo = int(starts[j])
        while c > 0:
            w_fit = next((x for x in desc if x <= c), None)
            w_up = next((x for x in asc if x >= c), None)
            if w_fit is None:  # c smaller than every width
                per_bucket[w_up].append((j, lo, lo + c))
                break
            chop_slots = -(-c // w_fit) * w_fit
            if w_up is not None and w_up <= chop_slots:
                per_bucket[w_up].append((j, lo, lo + c))
                break
            per_bucket[w_fit].append((j, lo, lo + w_fit))
            lo += w_fit
            c -= w_fit

    buckets = []
    for w in widths:
        segs = per_bucket[w]
        if not segs:
            continue
        nseg = len(segs)
        slot_case = np.full((nseg, w), num_rows, dtype=np.int32)
        slot_val = np.zeros((nseg, w), dtype=np.float32)
        seg_feat = np.empty(nseg, dtype=np.int32)
        for s, (j, lo, hi) in enumerate(segs):
            seg_feat[s] = j
            slot_case[s, : hi - lo] = er[lo:hi]
            slot_val[s, : hi - lo] = ev[lo:hi]
        buckets.append(WidthBucket(w, slot_case, slot_val, seg_feat))

    return VectorBlockLayout(
        features=np.asarray(features, dtype=np.int32),
        groups=np.asarray(groups, dtype=np.int32),
        buckets=buckets,
        num_features=F,
    )


def padded_rows_layout(indptr, cols, vals, align: int = 1):
    """Padded [num_rows, L] (ids, vals) arrays for dense per-case passes
    (prediction / e-refresh). Sentinel id = num_features is NOT used;
    padding uses id 0 with value 0 (contributes nothing)."""
    lengths = np.diff(indptr).astype(np.int64)
    n = len(lengths)
    L = max(1, int(lengths.max()) if n else 1)
    L = ((L + align - 1) // align) * align
    ids = np.zeros((n, L), dtype=np.int32)
    vs = np.zeros((n, L), dtype=np.float32)
    row = np.repeat(np.arange(n, dtype=np.int64), lengths)
    offs = np.arange(int(indptr[-1]), dtype=np.int64) - np.repeat(
        indptr[:-1], lengths
    )
    ids[row, offs] = cols
    vs[row, offs] = vals
    return ids, vs
