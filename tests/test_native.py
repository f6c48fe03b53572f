"""Native C++ fast-data-path tests (skipped when g++ is unavailable)."""

import numpy as np
import pytest

from libfm_tpu.data.text import _parse_libfm_text_numpy

fastdata = pytest.importorskip("libfm_tpu.native.fastdata")

pytestmark = pytest.mark.skipif(
    not fastdata.available(), reason="native library not built"
)


@pytest.fixture
def sample_file(tmp_path):
    p = tmp_path / "sample.libfm"
    p.write_text(
        "# a comment line\n"
        "3.5 0:1 4:0.5 7:2\n"
        "\n"
        "-1 2:1.25e-1\n"
        "0 \n"
        "2 1:3 # trailing comment 9:9\n"
    )
    return str(p)


def test_native_matches_python_parser(sample_file):
    a = fastdata.parse_libfm_text(sample_file)
    b = _parse_libfm_text_numpy(sample_file)
    for x, y in zip(a, b):
        if isinstance(x, np.ndarray):
            assert np.allclose(x, y)
        else:
            assert x == y
    indptr, cols, vals, target, nf = a
    assert target.tolist() == [3.5, -1.0, 0.0, 2.0]
    assert nf == 8
    assert cols.tolist() == [0, 4, 7, 2, 1]
    assert np.allclose(vals, [1, 0.5, 2, 0.125, 3])


def test_native_write_read_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    n, nnz_per = 50, 3
    indptr = np.arange(0, n * nnz_per + 1, nnz_per, dtype=np.int64)
    cols = rng.integers(0, 100, n * nnz_per).astype(np.int32)
    vals = rng.standard_normal(n * nnz_per).astype(np.float32)
    target = rng.standard_normal(n).astype(np.float32)
    p = str(tmp_path / "rt.libfm")
    assert fastdata.write_libfm_text(p, indptr, cols, vals, target)
    i2, c2, v2, t2, _ = fastdata.parse_libfm_text(p)
    assert np.array_equal(i2, indptr)
    assert np.array_equal(c2, cols)
    assert np.allclose(v2, vals, rtol=1e-5)
    assert np.allclose(t2, target, rtol=1e-5)


def test_native_write_large_integer_values(tmp_path):
    # Integer-valued floats >= 2^32 (e.g. millisecond timestamps) must not
    # be written modulo 2^32 (round-1 advisor finding on write_float).
    big = np.float32(2.0**33)  # 8589934592, exactly representable in f32
    indptr = np.array([0, 1, 2], dtype=np.int64)
    cols = np.array([0, 1], dtype=np.int32)
    vals = np.array([big, -big], dtype=np.float32)
    target = np.array([big, 7.0], dtype=np.float32)
    p = str(tmp_path / "big.libfm")
    assert fastdata.write_libfm_text(p, indptr, cols, vals, target)
    text = open(p).read()
    assert "8589934592" in text
    assert "-8589934592" in text
    i2, c2, v2, t2, _ = fastdata.parse_libfm_text(p)
    assert np.array_equal(v2, vals)
    assert np.array_equal(t2, target)


def test_native_transpose_matches_python():
    from libfm_tpu.data.dataset import _csr_transpose

    rng = np.random.default_rng(1)
    n_rows, n_cols = 40, 25
    lens = rng.integers(0, 6, n_rows)
    indptr = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(lens, out=indptr[1:])
    cols = rng.integers(0, n_cols, int(lens.sum())).astype(np.int32)
    vals = rng.standard_normal(int(lens.sum())).astype(np.float32)
    a = fastdata.csr_transpose(indptr, cols, vals, n_rows, n_cols)
    b = _csr_transpose(indptr, cols, vals, n_rows, n_cols)
    for x, y in zip(a, b):
        assert np.allclose(x, y)


def test_native_write_huge_row_roundtrip(tmp_path):
    """A single row whose text exceeds the writer's flush slack must not
    overflow the buffer (previously heap corruption past ~40K entries)."""
    from libfm_tpu.data.dataset import Dataset

    n = 60_000
    ds = Dataset(
        np.array([0, n], np.int64),
        np.arange(n, dtype=np.int32),
        np.full(n, 1.5, np.float32),
        np.array([2.0], np.float32),
        n,
    )
    p = str(tmp_path / "huge.libfm")
    ds.to_libfm_text(p)
    back = Dataset.from_libfm_text(p)
    assert back.nnz == n
    np.testing.assert_array_equal(back.cols, ds.cols)
    np.testing.assert_allclose(back.vals, ds.vals)


def test_native_rejects_line_missing_target(tmp_path):
    """'3:1 4:2' (no target) must fail like the python parser instead of
    silently fabricating a feature-0 entry."""
    from libfm_tpu.data.dataset import Dataset

    p = str(tmp_path / "bad.libfm")
    with open(p, "w") as f:
        f.write("1.0 0:1 1:1\n3:1 4:2\n")
    with pytest.raises((ValueError, OSError)):
        Dataset.from_libfm_text(p)


def test_native_transpose_rejects_out_of_range_cols():
    from libfm_tpu.native import fastdata

    if not fastdata.available():
        pytest.skip("native lib unavailable")
    indptr = np.array([0, 2], np.int64)
    cols = np.array([0, 7], np.int32)  # 7 >= num_cols=3
    vals = np.ones(2, np.float32)
    with pytest.raises(ValueError, match="out of range"):
        fastdata.csr_transpose(indptr, cols, vals, 1, 3)
