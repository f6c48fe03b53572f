"""Segment-reduction helpers for the coordinate-sweep learners.

All sweeps are expressed as gathers + segment_sums + scatters over flat
entry arrays; this module centralises the conventions (static
num_segments, sorted-indices hints) so XLA lowers them to efficient
one-pass reductions on TPU.
"""

from __future__ import annotations

import jax


def seg_sum(data, segment_ids, num_segments: int, sorted_ids: bool = True):
    return jax.ops.segment_sum(
        data,
        segment_ids,
        num_segments=num_segments,
        indices_are_sorted=sorted_ids,
    )


def scatter_add(target, idx, updates, unique: bool = False):
    """target[idx] += updates. Set unique=True when idx has no duplicates
    (lets XLA skip the atomic combine)."""
    return target.at[idx].add(
        updates, indices_are_sorted=False, unique_indices=unique
    )
