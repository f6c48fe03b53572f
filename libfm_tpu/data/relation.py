"""Relational block structure (BS) data containers.

Reference: /root/reference/src/libfm/src/relation.h (VLDB 2013 paper
"Scaling Factorization Machines to Relational Data"). A RelationData is a
shared block of feature columns with its own design matrix; each training
dataset holds, per relation, a `data_row_to_relation_row` join map. The
joined attribute space offsets each relation's features by `attr_offset`
(/root/reference/src/libfm/libfm.cpp:213-216).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from libfm_tpu.data import binary as binio
from libfm_tpu.data.dataset import DataMetaInfo


class RelationData:
    """A shared feature block. Reference:
    /root/reference/src/libfm/src/relation.h:32-113."""

    def __init__(self, indptr, cols, vals, num_features: int):
        self.indptr = np.asarray(indptr, dtype=np.int64)
        self.cols = np.asarray(cols, dtype=np.int32)
        self.vals = np.asarray(vals, dtype=np.float32)
        self.num_features = int(num_features)
        self.attr_offset = 0
        self.meta = DataMetaInfo(self.num_features)

    @property
    def num_cases(self) -> int:
        return len(self.indptr) - 1

    @property
    def nnz(self) -> int:
        return int(self.indptr[-1])

    @property
    def row_of_entry(self) -> np.ndarray:
        return np.repeat(
            np.arange(self.num_cases, dtype=np.int32),
            np.diff(self.indptr).astype(np.int64),
        )

    @classmethod
    def load(cls, prefix: str, entry_budget: int | None = None) -> "RelationData":
        """Load `<prefix>.x` (+ optional `.groups`) like the reference
        (/root/reference/src/libfm/src/relation.h:71-113).

        With `entry_budget` (the -cache_size path) the .x is read through
        the bounded streaming window reader instead of one whole-file
        read — the reference wires cache_size into the relation loads the
        same way (relation.h:62-78). The assembled table is resident
        either way: the BS algorithms' premise is that block tables are
        small (that is what the dedup buys)."""
        if entry_budget:
            from libfm_tpu.data.streaming import stream_sparse_binary

            ips, css, vss = [np.zeros(1, np.int64)], [], []
            num_cols = 0
            base = 0
            for _, ip, cs, vs, _, nc_ in stream_sparse_binary(
                prefix + ".x", entry_budget
            ):
                num_cols = nc_
                ips.append(np.asarray(ip[1:], np.int64) + base)
                base += int(ip[-1])
                css.append(cs)
                vss.append(vs)
            indptr = np.concatenate(ips)
            cols = (
                np.concatenate(css) if css else np.empty(0, np.int32)
            )
            vals = (
                np.concatenate(vss) if vss else np.empty(0, np.float32)
            )
        else:
            indptr, cols, vals, num_rows, num_cols = binio.read_sparse_binary(
                prefix + ".x"
            )
        rd = cls(indptr, cols, vals, num_cols)
        if os.path.exists(prefix + ".groups"):
            rd.meta.load_groups(prefix + ".groups")
        return rd

    @classmethod
    def from_dataset(cls, ds) -> "RelationData":
        return cls(ds.indptr, ds.cols, ds.vals, ds.num_features)

    def save(self, prefix: str) -> None:
        binio.write_sparse_binary(
            prefix + ".x", self.indptr, self.cols, self.vals, self.num_features
        )


@dataclass
class RelationJoin:
    """Join map from training rows to relation-block rows. Reference:
    /root/reference/src/libfm/src/relation.h:53-59,127-150."""

    data: RelationData
    row_map: np.ndarray  # int32 [num_train_rows]

    @classmethod
    def load(cls, data: RelationData, path: str, expected_rows: int) -> "RelationJoin":
        if binio.is_dvector_binary(path, type_size=4):
            row_map = binio.read_dvector_binary(path, dtype=np.uint32).astype(np.int32)
        else:
            row_map = np.loadtxt(path, dtype=np.int64).reshape(-1).astype(np.int32)
        if len(row_map) != expected_rows:
            raise ValueError(
                f"{path}: join map has {len(row_map)} rows, expected {expected_rows}"
            )
        return cls(data, row_map)

    def permuted(self, perm) -> "RelationJoin":
        return RelationJoin(self.data, self.row_map[perm])


def expand_join(ds) -> "Dataset":
    """Materialise the relational join of `ds` into a flat Dataset.

    Produces the design matrix the reference logically trains on
    (/root/reference/src/libfm/libfm.cpp:199-243 joins attribute spaces;
    the BS caches of fm_learn_mcmc.h only avoid materialising it): each
    case's row = its main-table entries followed by, per relation, the
    entries of its joined block row shifted by `attr_offset`. Targets
    and attribute groups are unchanged, so training on the expansion is
    statistically identical to the BS algorithm.
    """
    from libfm_tpu.data.dataset import Dataset

    cases, cols, vals = [ds.row_of_entry], [ds.cols], [ds.vals]
    nf = ds.num_features
    nc = ds.num_rows
    for join in ds.relations:
        rd = join.data
        rmap = join.row_map.astype(np.int64)
        lens = np.diff(rd.indptr).astype(np.int64)[rmap]
        total = int(lens.sum())
        starts = rd.indptr[rmap].astype(np.int64)
        off = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(lens)[:-1]]), lens
        )
        idx = np.repeat(starts, lens) + off
        cases.append(np.repeat(np.arange(nc, dtype=np.int32), lens))
        cols.append(rd.cols[idx].astype(np.int32) + rd.attr_offset)
        vals.append(rd.vals[idx])
        nf = max(nf, rd.attr_offset + rd.num_features)
    case = np.concatenate(cases)
    order = np.argsort(case, kind="stable")  # main first, then relations
    case = case[order]
    cols_f = np.concatenate(cols)[order]
    vals_f = np.concatenate(vals)[order].astype(np.float32)
    counts = np.bincount(case, minlength=nc).astype(np.int64)
    indptr = np.concatenate([[0], np.cumsum(counts)])
    return Dataset(indptr, cols_f, vals_f, ds.target, nf)


def expansion_cost(ds) -> tuple[int, int]:
    """(expanded_nnz, bs_nnz): the entry counts of the materialised join
    vs the BS representation (main + blocks + one join id per relation
    per case). The BS algorithm pays off when the ratio is large."""
    exp = int(ds.nnz)
    base = int(ds.nnz)
    for ri, join in enumerate(ds.relations):
        rd = join.data
        if len(join.row_map) and int(join.row_map.max()) >= rd.num_cases:
            raise ValueError(
                f"relation #{ri} join map references block row "
                f"{int(join.row_map.max())} but the relation has only "
                f"{rd.num_cases} rows — wrong relation file for this "
                "join map?"
            )
        lens = np.diff(rd.indptr).astype(np.int64)
        exp += int(lens[join.row_map].sum())
        base += int(rd.nnz) + ds.num_rows
    return exp, base
