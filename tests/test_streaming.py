"""Out-of-core streaming tests: windowed binary reader, flat memmap
format, and streaming SGD parity with in-memory SGD."""

import numpy as np
import pytest

from libfm_tpu.data import streaming
from libfm_tpu.data.dataset import Dataset
from libfm_tpu.data.synth import movielens_like
from libfm_tpu.learners.sgd import SGDLearner
from libfm_tpu.models.fm import FMConfig


def _write_pair(ds, tmp_path, name):
    ds.to_binary(str(tmp_path / name), with_transpose=False)
    return str(tmp_path / f"{name}.x"), str(tmp_path / f"{name}.y")


def test_stream_windows_reassemble(tmp_path):
    train, _ = movielens_like(num_users=50, num_items=40, num_ratings=3000, seed=1)
    xp, yp = _write_pair(train, tmp_path, "s")
    cols_all, vals_all, nrows = [], [], 0
    for row_start, indptr, cols, vals, num_rows, num_cols in (
        streaming.stream_sparse_binary(xp, entry_budget=500)
    ):
        assert row_start == nrows
        assert int(indptr[-1]) == len(cols)
        cols_all.append(cols)
        vals_all.append(vals)
        nrows += len(indptr) - 1
    assert nrows == train.num_rows
    assert np.array_equal(np.concatenate(cols_all), train.cols)
    assert np.allclose(np.concatenate(vals_all), train.vals)


def test_flat_format_mmap_roundtrip(tmp_path):
    train, _ = movielens_like(num_users=30, num_items=20, num_ratings=1000, seed=2)
    p = str(tmp_path / "flat")
    streaming.save_flat(train, p)
    ds = streaming.load_flat(p, mmap=True)
    assert isinstance(ds.cols, np.memmap)
    assert np.array_equal(np.asarray(ds.indptr), train.indptr)
    assert np.array_equal(np.asarray(ds.cols), train.cols)
    assert np.allclose(np.asarray(ds.target), train.target)
    assert ds.num_features == train.num_features


def test_streaming_sgd_matches_inmemory(tmp_path):
    train, test = movielens_like(num_users=60, num_items=50, num_ratings=4000, seed=3)
    xp, yp = _write_pair(train, tmp_path, "tr")
    cfg = FMConfig(num_features=train.num_features, num_factors=4, regv=0.01)
    kwargs = dict(num_iter=3, learn_rate=0.01, batch_size=128, seed=1, verbose=False)

    mem = SGDLearner(cfg, **kwargs)
    h_mem = mem.learn(train, test)

    stream = streaming.StreamingDataset(xp, yp, entry_budget=1000)
    st = SGDLearner(cfg, **kwargs)
    h_st = st.learn_stream(stream, test, max_nnz=8)

    # identical batch order and math -> same trajectory
    assert abs(h_mem[-1][1] - h_st[-1][1]) < 1e-4, (h_mem[-1], h_st[-1])


def test_streaming_max_row_nnz_and_truncation(tmp_path):
    train, test = movielens_like(num_users=30, num_items=25, num_ratings=800, seed=5)
    xp, yp = _write_pair(train, tmp_path, "mx")
    stream = streaming.StreamingDataset(xp, yp, entry_budget=500)
    true_max = int(np.diff(train.indptr).max())
    assert stream.max_row_nnz() == true_max

    # default (lossless) streaming pass: nothing truncated
    cfg = FMConfig(num_features=train.num_features, num_factors=2)
    l = SGDLearner(cfg, num_iter=1, learn_rate=0.01, batch_size=64,
                   seed=1, verbose=False)
    l.learn_stream(stream, test)
    assert stream.truncated_rows == 0

    # forced truncation is counted and warned about
    import warnings

    l2 = SGDLearner(cfg, num_iter=1, learn_rate=0.01, batch_size=64,
                    seed=1, verbose=False)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        l2.learn_stream(stream, test, max_nnz=1)
    assert stream.truncated_rows > 0
    assert any("truncated" in str(w.message) for w in rec)


def test_streaming_sgda_matches_inmemory(tmp_path):
    """Out-of-core SGDA (round 4): streamed train + resident validation
    must track the resident run — identical batch order, theta/lambda
    interleave, and grad caches."""
    from libfm_tpu.learners.sgda import SGDALearner

    train, test = movielens_like(
        num_users=60, num_items=50, num_ratings=4000, seed=3
    )
    val, _ = movielens_like(
        num_users=60, num_items=50, num_ratings=900, seed=9
    )
    xp, yp = _write_pair(train, tmp_path, "sa")
    cfg = FMConfig(num_features=train.num_features, num_factors=4)
    kwargs = dict(num_iter=3, learn_rate=0.01, batch_size=128, seed=1,
                  verbose=False)

    mem = SGDALearner(cfg, **kwargs)
    h_mem = mem.learn(train, test, val)

    stream = streaming.StreamingDataset(xp, yp, entry_budget=1000)
    st = SGDALearner(cfg, **kwargs)
    h_st = st.learn_stream(stream, test, val, max_nnz=8)

    assert abs(h_mem[-1][1] - h_st[-1][1]) < 1e-4, (h_mem[-1], h_st[-1])
    # the adapted regularizers must track too
    assert np.allclose(
        np.asarray(mem.reg_v), np.asarray(st.reg_v), atol=1e-4
    )


# ------------------------------------------- streaming MCMC/ALS layout


def test_infer_position_groups_matches_inmemory(tmp_path):
    train, _ = movielens_like(num_users=40, num_items=30, num_ratings=1500, seed=7)
    xp, yp = _write_pair(train, tmp_path, "pg")
    part = streaming.infer_position_groups(
        xp, train.num_features, entry_budget=300
    )
    # two-field one-hot data: users at position 0, items at position 1
    assert part is not None
    assert (part[:40] == 0).all() and (part[40:] == 1).all()


def test_infer_position_groups_rejects_unstructured(tmp_path):
    # a feature appearing at two within-row positions is not partitionable
    ds = Dataset(
        indptr=np.array([0, 2, 4], np.int64),
        cols=np.array([0, 1, 1, 2], np.int32),
        vals=np.ones(4, np.float32),
        target=np.zeros(2, np.float32),
        num_features=3,
    )
    ds.to_binary(str(tmp_path / "u"), with_transpose=False)
    assert (
        streaming.infer_position_groups(str(tmp_path / "u.x"), 3, 100) is None
    )


def test_stream_feature_blocks_match_inmemory(tmp_path):
    from libfm_tpu.data.batching import conflict_free_blocks

    train, _ = movielens_like(num_users=50, num_items=45, num_ratings=2500, seed=9)
    prefix = str(tmp_path / "fb")
    train.to_binary(prefix, with_transpose=True)
    part = streaming.infer_position_groups(
        prefix + ".x", train.num_features, entry_budget=400
    )
    streamed = list(
        streaming.stream_feature_blocks(
            prefix + ".xt", part, train.num_rows, entry_budget=400
        )
    )
    mem = conflict_free_blocks(train)
    assert len(streamed) == len(mem)
    for s, m in zip(streamed, mem):
        assert np.array_equal(s.features, m.features)
        assert np.array_equal(s.entry_rows, m.entry_rows)
        assert np.allclose(s.entry_vals, m.entry_vals)
        assert np.array_equal(s.entry_feat, m.entry_feat)


@pytest.mark.slow
def test_streaming_mcmc_matches_inmemory(tmp_path):
    from libfm_tpu.learners.mcmc_vector import MCMCVectorLearner

    train, test = movielens_like(num_users=60, num_items=50, num_ratings=4000, seed=11)
    prefix = str(tmp_path / "mc")
    train.to_binary(prefix, with_transpose=True)
    cfg = FMConfig(num_features=train.num_features, num_factors=4)
    kwargs = dict(num_iter=5, seed=2, verbose=False)

    mem = MCMCVectorLearner(cfg, **kwargs)
    mem.learn(train, test)

    stream = streaming.StreamingDataset(
        prefix + ".x", prefix + ".y", entry_budget=700
    )
    st = MCMCVectorLearner(cfg, **kwargs)
    st.learn(stream, test)

    # identical layouts + identical RNG stream -> identical trajectory
    a, b = mem.history[-1], st.history[-1]
    assert abs(a["test_all"] - b["test_all"]) < 1e-5, (a, b)
    assert abs(a["alpha"] - b["alpha"]) < 1e-5


def test_streaming_mcmc_needs_transpose(tmp_path):
    from libfm_tpu.learners.mcmc_vector import MCMCVectorLearner

    train, test = movielens_like(num_users=20, num_items=15, num_ratings=400, seed=13)
    xp, yp = _write_pair(train, tmp_path, "nt")  # no .xt written
    stream = streaming.StreamingDataset(xp, yp, entry_budget=200)
    l = MCMCVectorLearner(
        FMConfig(num_features=train.num_features, num_factors=2),
        num_iter=1, seed=1, verbose=False,
    )
    import pytest

    with pytest.raises(ValueError, match="transpose"):
        l.learn(stream, test)


def _unstructured(num_rows=300, num_features=60, seed=13):
    """Variable-length rows, random feature subsets — NOT
    position-structured and with no meta groups (the reference's general
    case: LargeSparseMatrixHD streams anything, fmatrix.h:165-281)."""
    rng = np.random.default_rng(seed)
    lens = rng.integers(1, 7, num_rows)
    cols = np.concatenate(
        [np.sort(rng.choice(num_features, l, replace=False)) for l in lens]
    ).astype(np.int32)
    indptr = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
    vals = rng.standard_normal(len(cols)).astype(np.float32)
    beta = rng.standard_normal(num_features).astype(np.float32)
    y = np.add.reduceat(vals * beta[cols], indptr[:-1]).astype(np.float32)
    return Dataset(indptr, cols, vals, y, num_features)


def test_streaming_greedy_partition_matches_inmemory(tmp_path):
    """stream_greedy_partition + stream_feature_blocks_any must produce
    the exact blocks of the in-memory greedy path (same Welsh-Powell
    order, same first-fit) on unstructured data with no meta groups."""
    from libfm_tpu.data.batching import conflict_free_blocks

    ds = _unstructured()
    prefix = str(tmp_path / "gp")
    ds.to_binary(prefix, with_transpose=True)
    assert (
        streaming.infer_position_groups(prefix + ".x", ds.num_features, 500)
        is None
    )
    part, counts = streaming.stream_greedy_partition(
        prefix + ".xt", ds.num_rows, entry_budget=300
    )
    streamed = list(
        streaming.stream_feature_blocks_any(
            prefix + ".xt", part, ds.num_rows, entry_budget=300,
            entries_per_feature=counts,
        )
    )
    mem = conflict_free_blocks(ds)
    assert len(streamed) == len(mem)
    for s, m in zip(streamed, mem):
        assert np.array_equal(s.features, m.features)
        assert np.array_equal(s.entry_rows, m.entry_rows)
        assert np.allclose(s.entry_vals, m.entry_vals)
        assert np.array_equal(s.entry_feat, m.entry_feat)


@pytest.mark.slow
def test_streaming_mcmc_unstructured_matches_inmemory(tmp_path):
    """Out-of-core MCMC on arbitrary (unstructured, meta-less) data:
    identical trajectory to the resident run (VERDICT round-2 item #4)."""
    from libfm_tpu.learners.mcmc_vector import MCMCVectorLearner

    train = _unstructured(num_rows=400, num_features=80, seed=21)
    test = _unstructured(num_rows=80, num_features=80, seed=22)
    prefix = str(tmp_path / "un")
    train.to_binary(prefix, with_transpose=True)
    cfg = FMConfig(num_features=80, num_factors=4)
    kwargs = dict(num_iter=5, seed=3, verbose=False)

    mem = MCMCVectorLearner(cfg, **kwargs)
    mem.learn(train, test)

    stream = streaming.StreamingDataset(
        prefix + ".x", prefix + ".y", entry_budget=400
    )
    st = MCMCVectorLearner(cfg, **kwargs)
    st.learn(stream, test)

    a, b = mem.history[-1], st.history[-1]
    assert abs(a["test_all"] - b["test_all"]) < 1e-5, (a, b)
    assert abs(a["alpha"] - b["alpha"]) < 1e-5


@pytest.mark.slow
def test_streaming_test_set_matches_resident(tmp_path):
    """A StreamingDataset TEST set must give the identical metrics as the
    resident test set (the reference streams test data through the same
    HD cache, libfm.cpp:141-174)."""
    from libfm_tpu.learners.mcmc_vector import MCMCVectorLearner

    train, test = movielens_like(num_users=40, num_items=30, num_ratings=1200, seed=5)
    tprefix = str(tmp_path / "te")
    test.to_binary(tprefix, with_transpose=False)
    cfg = FMConfig(num_features=train.num_features, num_factors=4)
    kwargs = dict(num_iter=4, seed=6, verbose=False)

    a = MCMCVectorLearner(cfg, **kwargs)
    a.learn(train, test)
    st_test = streaming.StreamingDataset(
        tprefix + ".x", tprefix + ".y", entry_budget=300
    )
    b = MCMCVectorLearner(cfg, **kwargs)
    b.learn(train, st_test)
    for ka, kb in zip(a.history, b.history):
        assert abs(ka["test_all"] - kb["test_all"]) < 1e-6
        assert abs(ka["test_this"] - kb["test_this"]) < 1e-6


@pytest.mark.slow
def test_streaming_exact_engine_matches_inmemory(tmp_path):
    """-engine exact under -cache_size (round 5, VERDICT r4 item 5):
    the exact scalar engine's streamed layout build + windowed COO
    upload must give the identical trajectory to the resident run
    (same blocks, same RNG stream)."""
    from libfm_tpu.learners.mcmc import MCMCLearner

    train, test = movielens_like(
        num_users=60, num_items=50, num_ratings=4000, seed=11
    )
    prefix = str(tmp_path / "ex")
    train.to_binary(prefix, with_transpose=True)
    cfg = FMConfig(num_features=train.num_features, num_factors=4)
    kwargs = dict(num_iter=5, seed=2, verbose=False)

    mem = MCMCLearner(cfg, **kwargs)
    mem.learn(train, test)

    stream = streaming.StreamingDataset(
        prefix + ".x", prefix + ".y", entry_budget=700
    )
    st = MCMCLearner(cfg, **kwargs)
    st.learn(stream, test)

    a, b = mem.history[-1], st.history[-1]
    assert abs(a["test_all"] - b["test_all"]) < 1e-5, (a, b)
    assert abs(a["alpha"] - b["alpha"]) < 1e-5


@pytest.mark.slow
def test_streaming_exact_engine_streamed_test(tmp_path):
    """Exact engine with BOTH train and test streamed: identical
    metrics to the fully resident run (the reference constructs every
    Data with the same bounded cache, libfm.cpp:141-174)."""
    from libfm_tpu.learners.mcmc import MCMCLearner

    train, test = movielens_like(
        num_users=40, num_items=30, num_ratings=1500, seed=15
    )
    tr_p, te_p = str(tmp_path / "bt"), str(tmp_path / "bte")
    train.to_binary(tr_p, with_transpose=True)
    test.to_binary(te_p, with_transpose=False)
    cfg = FMConfig(num_features=train.num_features, num_factors=4)
    kwargs = dict(num_iter=4, seed=7, verbose=False)

    a = MCMCLearner(cfg, **kwargs)
    a.learn(train, test)
    b = MCMCLearner(cfg, **kwargs)
    b.learn(
        streaming.StreamingDataset(tr_p + ".x", tr_p + ".y", entry_budget=500),
        streaming.StreamingDataset(te_p + ".x", te_p + ".y", entry_budget=300),
    )
    for ka, kb in zip(a.history, b.history):
        assert abs(ka["test_all"] - kb["test_all"]) < 1e-6
        assert abs(ka["test_this"] - kb["test_this"]) < 1e-6


def test_streaming_sgda_validation_stream_matches_resident(tmp_path):
    """SGDA with a STREAMED validation set (round 5): the lambda steps
    read validation batches round-robin, so the streamed-validation run
    must track the resident-validation run batch for batch."""
    from libfm_tpu.learners.sgda import SGDALearner

    train, test = movielens_like(
        num_users=60, num_items=50, num_ratings=4000, seed=3
    )
    val, _ = movielens_like(
        num_users=60, num_items=50, num_ratings=900, seed=9
    )
    xp, yp = _write_pair(train, tmp_path, "sv")
    vxp, vyp = _write_pair(val, tmp_path, "svv")
    cfg = FMConfig(num_features=train.num_features, num_factors=4)
    kwargs = dict(num_iter=3, learn_rate=0.01, batch_size=128, seed=1,
                  verbose=False)

    res = SGDALearner(cfg, **kwargs)
    stream_r = streaming.StreamingDataset(xp, yp, entry_budget=1000)
    h_res = res.learn_stream(stream_r, test, val, max_nnz=8)

    st = SGDALearner(cfg, **kwargs)
    stream_t = streaming.StreamingDataset(xp, yp, entry_budget=1000)
    stream_v = streaming.StreamingDataset(vxp, vyp, entry_budget=500)
    h_st = st.learn_stream(stream_t, test, stream_v, max_nnz=8)

    assert abs(h_res[-1][1] - h_st[-1][1]) < 1e-4, (h_res[-1], h_st[-1])
    assert np.allclose(
        np.asarray(res.reg_v), np.asarray(st.reg_v), atol=1e-4
    )
