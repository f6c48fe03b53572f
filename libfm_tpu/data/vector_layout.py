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
    seg_whole: np.ndarray = None  # bool [nseg] — segment holds the WHOLE
    # feature (single-segment feature): eligible for the dual (Woodbury)
    # c x c draw instead of the dense d x d one
    unique_feats: bool = False  # one segment PER feature, in feature
    # order — per-chunk stats rows are then contiguous GG rows and the
    # engine stores them with slice writes instead of fat-row scatters

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
    widths: tuple = (32, 256),  # learner default; see MCMCVectorLearner
) -> VectorBlockLayout:
    F = len(features)
    order = np.argsort(entry_feat, kind="stable")
    ef = entry_feat[order]
    er = entry_rows[order]
    ev = entry_vals[order]
    counts = np.bincount(ef, minlength=F)
    starts = np.zeros(F + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])

    # Whole-feature mode: when the block's feature counts are uniform
    # enough, give EVERY feature one segment of a common width. The
    # per-chunk stats rows are then contiguous GG rows in feature order,
    # so the engine replaces its fat-row GG scatter-add (measured 0.51
    # s/iter of the ML-10M headline — BENCHNOTES r4) with pure slice
    # writes. Costs only the extra padding slots, hence the 1.5x budget.
    W_whole = max(8, int(-(-int(counts.max()) // 8)) * 8) if F else 8
    total = int(counts.sum())
    if (
        F > 0
        and total > 0
        and W_whole <= 4096
        and F * W_whole <= 1.5 * total
    ):
        slot_case = np.full((F, W_whole), num_rows, dtype=np.int32)
        slot_val = np.zeros((F, W_whole), dtype=np.float32)
        within = np.arange(total, dtype=np.int64) - np.repeat(
            starts[:-1], counts
        )
        rows_ix = np.repeat(np.arange(F, dtype=np.int64), counts)
        slot_case[rows_ix, within] = er
        slot_val[rows_ix, within] = ev
        return VectorBlockLayout(
            features=np.asarray(features, dtype=np.int32),
            groups=np.asarray(groups, dtype=np.int32),
            buckets=[
                WidthBucket(
                    W_whole, slot_case, slot_val,
                    np.arange(F, dtype=np.int32),
                    np.ones(F, dtype=bool),
                    unique_feats=True,
                )
            ],
            num_features=F,
        )

    # Chunk each feature's entry list, minimising padded slots first and
    # segment count second: full chunks use the largest width <= the
    # remaining count, but a tail is emitted as ONE rounded-up segment
    # whenever that wastes no more slots than chopping it (a 126-entry
    # feature becomes 64 + 62->64pad, never seven 8-wide segments).
    # Vectorised over features (the per-feature Python loop costs minutes
    # at 1M-vocab scale): walk the width ladder from largest to smallest,
    # computing for every feature at once how many full chunks of this
    # width it emits and whether its remainder is absorbed as a single
    # rounded-up segment of this width.
    per_bucket: dict[int, list] = {w: [] for w in widths}  # w -> [(feat, lo, hi)]
    desc = sorted(widths, reverse=True)

    rem = counts.astype(np.int64).copy()  # remaining entries per feature
    lo_now = starts[:-1].copy()  # next unchunked entry per feature
    feat_ids = np.arange(F, dtype=np.int64)
    for li, w in enumerate(desc):
        larger = desc[li - 1] if li > 0 else None
        # full chunks of width w: while rem >= w (but stop one short when
        # the final remainder would round up INTO this same width level —
        # handled by the absorb rule below)
        n_full = rem // w
        tail = rem - n_full * w
        # absorb rule: after emitting the full chunks, a tail t with
        # 0 < t < w is a candidate for a single segment of width w
        # (cost w) vs chopping at smaller widths (cost >= roundup at the
        # next width down). Absorb here iff w <= roundup(t, next_smaller)
        # ... which for a width ladder means t > w - next_smaller, or
        # this is the smallest width.
        smaller = desc[li + 1] if li + 1 < len(desc) else None
        if smaller is None:
            absorb = tail > 0
        else:
            absorb = tail > (w - smaller)
        # ALSO: a remainder that rounds up past the next-larger width
        # never happens (rem < larger by construction after level li-1).
        n_seg = n_full + absorb.astype(np.int64)
        has = n_seg > 0
        if has.any():
            js = feat_ids[has]
            reps = n_seg[has]
            seg_feat_w = np.repeat(js, reps)
            # per-segment lo offsets: lo_now[j] + w * (0..n_seg-1)
            seg_idx = np.arange(int(reps.sum()), dtype=np.int64) - np.repeat(
                np.concatenate([[0], np.cumsum(reps)[:-1]]), reps
            )
            seg_lo = np.repeat(lo_now[has], reps) + w * seg_idx
            # hi: full chunks end at lo+w; an absorbed tail segment ends
            # at the feature's last entry
            last_of_feat = np.repeat(
                (lo_now + n_full * w + tail)[has], reps
            )
            seg_hi = np.minimum(seg_lo + w, last_of_feat)
            per_bucket[w] = list(zip(seg_feat_w, seg_lo, seg_hi))
        consumed = n_full * w + np.where(absorb, tail, 0)
        lo_now = lo_now + consumed
        rem = rem - consumed

    buckets = []
    for w in widths:
        segs = per_bucket[w]
        if not segs:
            continue
        seg_feat_w, seg_lo, seg_hi = (
            np.asarray(x, dtype=np.int64) for x in zip(*segs)
        )
        # sort segments by feature so per-feature combination downstream
        # is a sorted segment-sum
        order2 = np.argsort(seg_feat_w, kind="stable")
        seg_feat_w, seg_lo, seg_hi = (
            seg_feat_w[order2], seg_lo[order2], seg_hi[order2]
        )
        nseg = len(seg_feat_w)
        seg_len = seg_hi - seg_lo
        total = int(seg_len.sum())
        slot_case = np.full((nseg, w), num_rows, dtype=np.int32)
        slot_val = np.zeros((nseg, w), dtype=np.float32)
        # vectorised ragged fill (a Python per-segment loop costs minutes
        # at 1M-vocab scale)
        prefix = np.concatenate([[0], np.cumsum(seg_len)[:-1]])
        flat = np.arange(total, dtype=np.int64)
        within = flat - np.repeat(prefix, seg_len)
        src = np.repeat(seg_lo, seg_len) + within
        dst_row = np.repeat(np.arange(nseg, dtype=np.int64), seg_len)
        slot_case[dst_row, within] = er[src]
        slot_val[dst_row, within] = ev[src]
        seg_whole = seg_len == counts[seg_feat_w]
        buckets.append(
            WidthBucket(
                w, slot_case, slot_val, seg_feat_w.astype(np.int32),
                seg_whole,
            )
        )

    return VectorBlockLayout(
        features=np.asarray(features, dtype=np.int32),
        groups=np.asarray(groups, dtype=np.int32),
        buckets=buckets,
        num_features=F,
    )


def slab_partition(
    slot_case: np.ndarray,
    slot_val: np.ndarray,
    seg_feat: np.ndarray,
    slab: int,
    num_rows: int,
    pad_feat: int | None = None,
):
    """Regroup a CASE-SORTED block's segments into case windows < `slab`.

    Precondition (established by the learner's case reordering): the
    block's features own contiguous, ascending case-id ranges, so each
    segment's real slot ids span a narrow window. The stats/dual passes
    can then `dynamic_slice` a chip-resident slab of A and gather from
    the slice at the small-table rate (~2.2 ns/row vs the ~45 ns/row
    big-table floor — BENCHNOTES "Gather cost vs table size").

    Returns (sc_rel [ns, ms, W], sv [ns, ms, W], sf [ns, ms],
    starts [ns]) with slab-relative slot ids (padding -> id 0, val 0),
    or None when the layout is infeasible (non-monotone ranges, a
    feature wider than the slab, or pathological slab skew).
    """
    nseg, W = slot_case.shape
    if nseg == 0 or num_rows + 1 < slab:
        return None
    real = slot_case < num_rows
    any_real = real.any(axis=1)
    hi = np.where(real, slot_case, -1).max(axis=1)
    lo = np.where(real, slot_case, num_rows + 1).min(axis=1)
    if (hi[any_real] - lo[any_real] >= slab).any():
        return None
    # greedy monotone walk (segments arrive feature-sorted = case-sorted)
    slab_of = np.zeros(nseg, dtype=np.int64)
    starts = []
    cur_start = -1
    for s in range(nseg):
        if not any_real[s]:
            if not starts:
                starts.append(0)
                cur_start = 0
            slab_of[s] = len(starts) - 1
            continue
        if cur_start < 0 or hi[s] - cur_start >= slab:
            if lo[s] < cur_start:
                return None  # ranges not monotone: not a sorted block
            cur_start = int(lo[s])
            starts.append(cur_start)
        elif lo[s] < cur_start:
            return None
        slab_of[s] = len(starts) - 1
    ns = len(starts)
    counts = np.bincount(slab_of, minlength=ns)
    ms = int(counts.max())
    if ms * ns > 4 * nseg + 4 * ns:
        return None  # skewed slabs: padding would dominate
    starts = np.minimum(
        np.asarray(starts, dtype=np.int64), num_rows + 1 - slab
    )
    sc_rel = np.zeros((ns, ms, W), dtype=np.int32)
    sv = np.zeros((ns, ms, W), dtype=np.float32)
    sf = np.zeros((ns, ms), dtype=np.int32)
    # scatter segments into their slab rows (vectorised ragged fill)
    order = np.argsort(slab_of, kind="stable")
    pos = np.arange(nseg, dtype=np.int64) - np.repeat(
        np.concatenate([[0], np.cumsum(counts)[:-1]]), counts
    )
    src = order
    dst_slab = np.repeat(np.arange(ns, dtype=np.int64), counts)
    st = starts[dst_slab][:, None]
    rel = np.where(
        slot_case[src] < num_rows, slot_case[src] - st, 0
    ).astype(np.int32)
    sc_rel[dst_slab, pos] = rel
    sv[dst_slab, pos] = np.where(
        slot_case[src] < num_rows, slot_val[src], 0.0
    )
    sf[dst_slab, pos] = seg_feat[src]
    # padding segments: the stats path needs a MONOTONE per-slab sf
    # (sorted GG scatters) -> duplicate the slab's last real feature id
    # with zero payload; the dual-draw path instead needs the sentinel
    # feature (`pad_feat` = F) so padding never overdraws a real feature
    for i in range(ns):
        c = counts[i]
        if c < ms:
            if pad_feat is not None:
                sf[i, c:] = pad_feat
            else:
                sf[i, c:] = sf[i, c - 1] if c else 0
    return sc_rel, sv, sf, starts.astype(np.int32)


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
