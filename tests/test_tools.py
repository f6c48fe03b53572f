"""Data-prep tool tests: convert / transpose / triple-format converter,
including interop with the reference binaries where available."""

import os
import shutil
import subprocess

import numpy as np
import pytest

from libfm_tpu.data import binary as binio
from libfm_tpu.data.dataset import Dataset
from libfm_tpu.tools import convert, transpose, triple_format_to_libfm


@pytest.fixture
def text_file(tmp_path):
    p = tmp_path / "d.libfm"
    p.write_text("1.5 0:1 3:2.5\n-0.5 1:1\n3 2:1 4:0.25\n")
    return str(p)


def test_convert_roundtrip(text_file, tmp_path):
    x, y = str(tmp_path / "d.x"), str(tmp_path / "d.y")
    convert.main(["--ifile", text_file, "--ofilex", x, "--ofiley", y])
    indptr, cols, vals, num_rows, num_cols = binio.read_sparse_binary(x)
    target = binio.read_dvector_binary(y, dtype=np.float32)
    assert num_rows == 3 and num_cols == 5
    assert target.tolist() == [1.5, -0.5, 3.0]
    assert cols.tolist() == [0, 3, 1, 2, 4]
    assert np.allclose(vals, [1, 2.5, 1, 1, 0.25])


def test_transpose_tool(text_file, tmp_path):
    x, y = str(tmp_path / "d.x"), str(tmp_path / "d.y")
    xt = str(tmp_path / "d.xt")
    convert.main(["--ifile", text_file, "--ofilex", x, "--ofiley", y])
    transpose.main(["--ifile", x, "--ofile", xt])
    ti, tc, tv, t_rows, t_cols = binio.read_sparse_binary(xt)
    # transpose of transpose == original
    ds = Dataset.from_libfm_text(text_file)
    ei, er, ev = ds.transpose()
    assert np.array_equal(ti, ei)
    assert np.array_equal(tc, er)
    assert np.allclose(tv, ev)


def test_binary_autodetect_load(text_file, tmp_path):
    """Dataset.load finds .x/.y like the reference
    (/root/reference/src/libfm/src/Data.h:120-124)."""
    prefix = str(tmp_path / "d")
    convert.main(["--ifile", text_file, "--ofilex", prefix + ".x",
                  "--ofiley", prefix + ".y"])
    ds = Dataset.load(prefix)
    ref = Dataset.from_libfm_text(text_file)
    assert np.array_equal(ds.indptr, ref.indptr)
    assert np.array_equal(ds.cols, ref.cols)
    assert np.allclose(ds.target, ref.target)


@pytest.fixture
def triples(tmp_path):
    a = tmp_path / "ratings.txt"
    a.write_text("u1 i1 5\nu2 i1 3\nu1 i2 4\n")
    b = tmp_path / "ratings_test.txt"
    b.write_text("u2 i2 2\nu3 i1 1\n")
    return str(a), str(b)


def test_triple_format(triples, tmp_path):
    a, b = triples
    meta = str(tmp_path / "meta.groups")
    triple_format_to_libfm.main(
        ["--in", f"{a},{b}", "--target_column", "2", "--outmeta", meta]
    )
    out_a = open(a + ".libfm").read().splitlines()
    out_b = open(b + ".libfm").read().splitlines()
    # ids assigned in encounter order, shared across files:
    # u1->0, i1->1, u2->2, i2->3, u3->4
    assert out_a == ["5 0:1 1:1", "3 2:1 1:1", "4 0:1 3:1"]
    assert out_b == ["2 2:1 3:1", "1 4:1 1:1"]
    groups = open(meta).read().split()
    assert groups == ["0", "1", "0", "1", "0"]


def test_triple_format_matches_perl(triples, tmp_path):
    if shutil.which("perl") is None or not os.path.exists(
        "/root/reference/scripts/triple_format_to_libfm.pl"
    ):
        pytest.skip("perl or reference script unavailable")
    a, b = triples
    # run ours into .libfm, then rename; rerun perl and compare
    triple_format_to_libfm.main(["--in", f"{a},{b}", "--target_column", "2"])
    ours_a = open(a + ".libfm").read()
    ours_b = open(b + ".libfm").read()
    subprocess.run(
        ["perl", "/root/reference/scripts/triple_format_to_libfm.pl",
         "--in", f"{a},{b}", "--target_column", "2"],
        check=True, capture_output=True,
    )
    assert open(a + ".libfm").read() == ours_a
    assert open(b + ".libfm").read() == ours_b


def test_reference_binary_reads_our_convert_output(text_file, tmp_path):
    """The reference libFM binary must accept our .x/.y files."""
    ref_bin = "/tmp/refbuild_test/bin/libFM"
    if not os.path.exists(ref_bin):
        pytest.skip("reference binary not built (run golden tests first)")
    prefix = str(tmp_path / "d")
    convert.main(["--ifile", text_file, "--ofilex", prefix + ".x",
                  "--ofiley", prefix + ".y"])
    out = subprocess.run(
        [ref_bin, "-task", "r", "-train", prefix, "-test", prefix,
         "-method", "sgd", "-dim", "1,1,2", "-iter", "1", "-verbosity", "1",
         "-learn_rate", "0.1"],
        check=True, capture_output=True, text=True,
    ).stdout
    assert "num_cases=3" in out
    assert "num_values=5" in out
    assert "#Iter" in out  # training actually ran on our binary files


def test_reference_transpose_interop(text_file, tmp_path):
    """Our transpose output must equal the reference transpose tool's."""
    ref_bin = "/tmp/refbuild_test/bin/transpose"
    if not os.path.exists(ref_bin):
        pytest.skip("reference transpose not built")
    x = str(tmp_path / "d.x")
    convert.main(["--ifile", text_file, "--ofilex", x,
                  "--ofiley", str(tmp_path / "d.y")])
    ours = str(tmp_path / "ours.xt")
    ref = str(tmp_path / "ref.xt")
    transpose.main(["--ifile", x, "--ofile", ours])
    subprocess.run([ref_bin, "--ifile", x, "--ofile", ref],
                   check=True, capture_output=True)
    assert open(ours, "rb").read() == open(ref, "rb").read()


def test_reference_convert_interop(text_file, tmp_path):
    """Reference convert output must load through our binary reader and
    equal our own convert output byte-for-byte."""
    ref_bin = "/tmp/refbuild_test/bin/convert"
    if not os.path.exists(ref_bin):
        pytest.skip("reference convert not built")
    rx, ry = str(tmp_path / "r.x"), str(tmp_path / "r.y")
    ox, oy = str(tmp_path / "o.x"), str(tmp_path / "o.y")
    subprocess.run([ref_bin, "--ifile", text_file, "--ofilex", rx,
                    "--ofiley", ry], check=True, capture_output=True)
    convert.main(["--ifile", text_file, "--ofilex", ox, "--ofiley", oy])
    assert open(rx, "rb").read() == open(ox, "rb").read()
    assert open(ry, "rb").read() == open(oy, "rb").read()


def test_transpose_out_of_core_matches_in_memory(tmp_path):
    """The bounded-cache multi-pass transpose (transpose.cpp:125-161
    analog) must produce a byte-identical file to the in-memory path."""
    rng = np.random.default_rng(5)
    n_rows, n_cols = 400, 157
    lens = rng.integers(0, 20, n_rows)
    indptr = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(lens, out=indptr[1:])
    nnz = int(lens.sum())
    cols = rng.integers(0, n_cols, nnz).astype(np.int32)
    vals = rng.standard_normal(nnz).astype(np.float32)
    x = str(tmp_path / "big.x")
    binio.write_sparse_binary(x, indptr, cols, vals, n_cols)

    mem = str(tmp_path / "mem.xt")
    transpose.main(["--ifile", x, "--ofile", mem])  # default 200 MiB cache

    ooc = str(tmp_path / "ooc.xt")
    # ~500-entry cache, ~40-entry stream windows: many column blocks AND
    # many stream windows per block
    transpose.transpose_streaming(x, ooc, cache_entries=500, entry_budget=40)
    assert open(mem, "rb").read() == open(ooc, "rb").read()

    # the CLI flag drives the same path for sub-cache-size files
    ooc2 = str(tmp_path / "ooc2.xt")
    transpose.main(["--ifile", x, "--ofile", ooc2, "--cache_size", "0.004"])
    assert open(mem, "rb").read() == open(ooc2, "rb").read()
