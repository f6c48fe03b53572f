"""Data-layer tests: text format, binary interop, transpose, batching."""

import numpy as np
import pytest

from libfm_tpu.data import binary as binio
from libfm_tpu.data.batching import batch_dataset, conflict_free_blocks, pad_rows
from libfm_tpu.data.dataset import DataMetaInfo, Dataset


def test_text_roundtrip(tmp_path, tiny_dataset):
    p = str(tmp_path / "d.libfm")
    tiny_dataset.to_libfm_text(p)
    ds = Dataset.from_libfm_text(p)
    np.testing.assert_array_equal(ds.indptr, tiny_dataset.indptr)
    np.testing.assert_array_equal(ds.cols, tiny_dataset.cols)
    np.testing.assert_allclose(ds.vals, tiny_dataset.vals)
    np.testing.assert_allclose(ds.target, tiny_dataset.target)
    assert ds.num_features == tiny_dataset.num_features


def test_text_comments_and_blanks(tmp_path):
    p = str(tmp_path / "d.libfm")
    with open(p, "w") as f:
        f.write("# a comment\n\n")
        f.write("2.5 0:1 3:0.5  # trailing comment\n")
        f.write("   \n")
        f.write("-1 1:2\n")
    ds = Dataset.from_libfm_text(p)
    assert ds.num_rows == 2
    np.testing.assert_allclose(ds.target, [2.5, -1.0])
    np.testing.assert_array_equal(ds.cols, [0, 3, 1])
    np.testing.assert_allclose(ds.vals, [1.0, 0.5, 2.0])
    assert ds.num_features == 4
    assert ds.min_target == -1.0 and ds.max_target == 2.5


def test_binary_roundtrip(tmp_path, tiny_dataset):
    prefix = str(tmp_path / "d")
    tiny_dataset.to_binary(prefix)
    ds = Dataset.from_binary(prefix)
    np.testing.assert_array_equal(ds.cols, tiny_dataset.cols)
    np.testing.assert_allclose(ds.vals, tiny_dataset.vals)
    np.testing.assert_allclose(ds.target, tiny_dataset.target)

    # header layout: exactly 24 bytes, little-endian, id==2
    raw = open(prefix + ".x", "rb").read(24)
    import struct

    fid, fsize, nvals, nrows, ncols = struct.unpack("<IIQII", raw)
    assert (fid, fsize) == (2, 4)
    assert nvals == tiny_dataset.nnz
    assert nrows == tiny_dataset.num_rows
    assert ncols == tiny_dataset.num_features


def test_dvector_binary_roundtrip(tmp_path):
    p = str(tmp_path / "v.bin")
    x = np.array([1.5, -2.0, 3.25], dtype=np.float32)
    binio.write_dvector_binary(p, x)
    y = binio.read_dvector_binary(p, dtype=np.float32)
    np.testing.assert_array_equal(x, y)
    assert binio.is_dvector_binary(p, 4)
    assert not binio.is_dvector_binary(p, 8)


def test_transpose(tiny_dataset):
    ti, tr, tv = tiny_dataset.transpose()
    # rebuild dense and compare
    dense = np.zeros((tiny_dataset.num_rows, tiny_dataset.num_features))
    for i in range(tiny_dataset.num_rows):
        for j in range(tiny_dataset.indptr[i], tiny_dataset.indptr[i + 1]):
            dense[i, tiny_dataset.cols[j]] = tiny_dataset.vals[j]
    dense_t = np.zeros_like(dense.T)
    for c in range(tiny_dataset.num_features):
        for j in range(ti[c], ti[c + 1]):
            dense_t[c, tr[j]] = tv[j]
    np.testing.assert_allclose(dense_t, dense.T)


def test_binary_transpose_loader(tmp_path, tiny_dataset):
    prefix = str(tmp_path / "d")
    tiny_dataset.to_binary(prefix, with_transpose=True)
    ds = Dataset.from_binary_transpose(prefix + ".xt", prefix + ".y")
    dense_a = _to_dense(tiny_dataset)
    dense_b = _to_dense(ds)
    np.testing.assert_allclose(dense_a, dense_b)


def _to_dense(ds):
    out = np.zeros((ds.num_rows, ds.num_features))
    for i in range(ds.num_rows):
        for j in range(ds.indptr[i], ds.indptr[i + 1]):
            out[i, ds.cols[j]] = ds.vals[j]
    return out


def test_pad_rows(tiny_dataset):
    ids, vals = pad_rows(tiny_dataset)
    assert ids.shape == (6, 8)  # padded to align=8
    assert (vals != 0).sum() == tiny_dataset.nnz


def test_batching_masks(tiny_dataset):
    b = batch_dataset(tiny_dataset, batch_size=4)
    assert b.num_batches == 2
    assert b.row_mask.sum() == 6
    assert b.y.shape == (2, 4)


def test_conflict_free_blocks(tiny_dataset):
    blocks = conflict_free_blocks(tiny_dataset)
    # one-hot user x item -> 2 blocks (users 0-2, items 3-6)
    assert len(blocks) == 2
    all_feats = np.sort(np.concatenate([b.features for b in blocks]))
    np.testing.assert_array_equal(all_feats, np.arange(7))
    # within a block, no row appears twice
    for b in blocks:
        assert len(np.unique(b.entry_rows)) == len(b.entry_rows)


def test_conflict_free_blocks_group_fastpath(tiny_dataset):
    attr_group = np.array([0, 0, 0, 1, 1, 1, 1], dtype=np.int32)
    blocks = conflict_free_blocks(tiny_dataset, attr_group=attr_group)
    assert len(blocks) == 2
    for b in blocks:
        assert len(np.unique(b.entry_rows)) == len(b.entry_rows)


def test_meta_groups(tmp_path):
    meta = DataMetaInfo(5)
    assert meta.num_attr_groups == 1
    p = str(tmp_path / "groups")
    np.savetxt(p, [0, 0, 1, 2, 2], fmt="%d")
    meta.load_groups(p)
    assert meta.num_attr_groups == 3
    np.testing.assert_array_equal(meta.num_attr_per_group, [2, 1, 2])


def test_shuffle_preserves_content(tiny_dataset):
    ds = tiny_dataset.shuffled(seed=3)
    assert ds.num_rows == tiny_dataset.num_rows
    assert sorted(ds.target.tolist()) == sorted(tiny_dataset.target.tolist())
    a = _to_dense(tiny_dataset)
    b = _to_dense(ds)
    # every row of b must be a row of a
    for r in b:
        assert any(np.allclose(r, x) for x in a)


def test_dataset_explicit_target_range_preserved():
    """Caller-specified min/max_target (e.g. the training range applied
    to a narrower test split) must not be overwritten by the observed
    range."""
    from libfm_tpu.data.dataset import Dataset

    ds = Dataset(
        np.array([0, 1], np.int64), np.zeros(1, np.int32),
        np.ones(1, np.float32), np.array([3.0], np.float32), 1,
        min_target=1.0, max_target=5.0,
    )
    assert ds.min_target == 1.0 and ds.max_target == 5.0
    ds2 = Dataset(
        np.array([0, 1], np.int64), np.zeros(1, np.int32),
        np.ones(1, np.float32), np.array([3.0], np.float32), 1,
    )
    assert ds2.min_target == 3.0 and ds2.max_target == 3.0


def test_pad_rows_truncates_at_explicit_max_nnz():
    from libfm_tpu.data.batching import pad_rows
    from libfm_tpu.data.dataset import Dataset

    ds = Dataset(
        np.array([0, 10, 12], np.int64),
        np.arange(12, dtype=np.int32),
        np.arange(1, 13, dtype=np.float32),
        np.array([1.0, 2.0], np.float32),
        12,
    )
    ids, vals = pad_rows(ds, max_nnz=8, align=8)
    assert ids.shape == (2, 8)
    np.testing.assert_array_equal(ids[0], np.arange(8))
    np.testing.assert_array_equal(ids[1][:2], [10, 11])
    # the cut is at the REQUESTED max_nnz, not the align-rounded width
    # (parity with StreamingDataset.iter_batches truncation)
    ids5, vals5 = pad_rows(ds, max_nnz=5, align=8)
    assert ids5.shape == (2, 8)
    np.testing.assert_array_equal(ids5[0], [0, 1, 2, 3, 4, 0, 0, 0])
    np.testing.assert_array_equal(vals5[0], [1, 2, 3, 4, 5, 0, 0, 0])
