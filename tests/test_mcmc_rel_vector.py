"""BS vector engine (learners/mcmc_rel_vector.py) tests.

The engine's defining identity: its per-block-row cache algebra must
produce EXACTLY the sweeps the flat vector engine runs on the
materialised join (the same identity the reference's relational caches
implement, /root/reference/src/libfm/src/fm_learn_mcmc.h:734-790,
849-909). With ALS (deterministic draws) and an identical conflict-free
partition, the two trajectories agree to float tolerance even though the
computational paths share nothing: one sweeps per-case slots over the
expansion, the other never materialises a single expanded row.
"""

import numpy as np
import pytest

from libfm_tpu.data.dataset import Dataset
from libfm_tpu.data.relation import RelationData, RelationJoin
from libfm_tpu.learners.mcmc_vector import MCMCVectorLearner
from libfm_tpu.models.fm import FMConfig
from libfm_tpu.tasks import TASK_CLASSIFICATION

from test_mcmc_relational import make_relational_problem


def _force_bs_vector(learner):
    learner.expand_max_ratio = 0.0  # every join counts as fat
    return learner


@pytest.mark.slow
def test_bs_vector_als_matches_flat_on_join():
    """ALS: BS-vector trajectory == flat vector engine on the
    materialised join (deterministic draws, identical conflict-free
    partition for one-hot blocks)."""
    train, test, jtrain, jtest, n_feat = make_relational_problem()
    cfg = FMConfig(num_features=n_feat, num_factors=4, regw=0.5, regv=0.5)

    a = _force_bs_vector(
        MCMCVectorLearner(cfg, num_iter=10, seed=7, verbose=False,
                          do_sample=False, do_multilevel=False)
    )
    ha = a.learn(train, test)
    assert a.relational_mode == "bs_vector"

    b = MCMCVectorLearner(cfg, num_iter=10, seed=7, verbose=False,
                          do_sample=False, do_multilevel=False)
    hb = b.learn(jtrain, jtest)

    for ra, rb in zip(ha, hb):
        assert abs(ra["test_this"] - rb["test_this"]) < 1e-5, (ra, rb)
        assert abs(ra["train"] - rb["train"]) < 1e-5, (ra, rb)


def _general_bs_problem(seed=3, nb1=12, w1=5, m1_card=6, nb2=7, w2=3,
                        m2_card=5, n_main=6, n_cases=300):
    """Two non-one-hot relations (real-valued blocks, multi-entry
    feature columns, MULTIPLE conflict-free blocks per relation — the
    within-sweep (s, dQB) corrections are load-bearing) plus a one-hot
    main-table field. Features are position-structured (feature i*m + c
    only ever at within-row position i) so the expanded engine derives
    the SAME conflict-free partition and trajectories align exactly."""
    rng = np.random.default_rng(seed)

    def block(nb, w, m):
        # row b entry i: feature i*m + c_bi, value ~ N(0,1)
        c = rng.integers(0, m, (nb, w))
        cols = (np.arange(w)[None, :] * m + c).astype(np.int32)
        vals = rng.standard_normal((nb, w)).astype(np.float32)
        indptr = np.arange(nb + 1, dtype=np.int64) * w
        return RelationData(indptr, cols.ravel(), vals.ravel(), w * m)

    nf1, nf2 = w1 * m1_card, w2 * m2_card

    rd1, rd2 = block(nb1, w1, m1_card), block(nb2, w2, m2_card)
    rd1.attr_offset = n_main
    rd2.attr_offset = n_main + nf1
    n_feat = n_main + nf1 + nf2

    m1 = rng.integers(0, nb1, n_cases).astype(np.int32)
    m2 = rng.integers(0, nb2, n_cases).astype(np.int32)
    main = rng.integers(0, n_main, n_cases).astype(np.int32)
    y = (
        0.3 * rng.standard_normal(nb1)[m1]
        + 0.3 * rng.standard_normal(nb2)[m2]
        + 0.5 * rng.standard_normal(n_main)[main]
        + 0.1 * rng.standard_normal(n_cases)
    ).astype(np.float32)

    split = n_cases // 4

    def build(sl):
        nc = len(y[sl])
        ds = Dataset(
            np.arange(nc + 1, dtype=np.int64),
            main[sl].astype(np.int32),
            np.ones(nc, np.float32),
            y[sl],
            n_main,
        )
        ds.relations = [
            RelationJoin(rd1, m1[sl]),
            RelationJoin(rd2, m2[sl]),
        ]
        return ds

    return build(slice(split, None)), build(slice(None, split)), n_feat


@pytest.mark.slow
def test_bs_vector_general_blocks_match_expansion():
    """Real-valued fat-ish blocks + main-table features + two relations:
    BS-vector ALS == flat ALS on the expansion (via the engine's own
    expand path), same seed."""
    from libfm_tpu.data.relation import expand_join

    train, test, n_feat = _general_bs_problem()
    cfg = FMConfig(num_features=n_feat, num_factors=3, regw=0.3, regv=0.3)

    a = _force_bs_vector(
        MCMCVectorLearner(cfg, num_iter=8, seed=11, verbose=False,
                          do_sample=False, do_multilevel=False)
    )
    ha = a.learn(train, test)
    assert a.relational_mode == "bs_vector"

    b = MCMCVectorLearner(cfg, num_iter=8, seed=11, verbose=False,
                          do_sample=False, do_multilevel=False)
    hb = b.learn(expand_join(train), expand_join(test))

    for ra, rb in zip(ha, hb):
        assert abs(ra["test_this"] - rb["test_this"]) < 2e-4, (ra, rb)

    preds = a.predict(test)
    assert preds.shape == (test.num_rows,)
    assert np.isfinite(preds).all()


@pytest.mark.slow
def test_bs_vector_mcmc_converges_like_exact():
    """Full MCMC (sampled draws, multilevel hyperpriors): the BS vector
    chain and the exact per-factor BS chain land in the same band."""
    from libfm_tpu.learners.mcmc import MCMCLearner

    train, test, _, _, n_feat = make_relational_problem(n_cases=600)
    cfg = FMConfig(num_features=n_feat, num_factors=4)

    a = _force_bs_vector(
        MCMCVectorLearner(cfg, num_iter=25, seed=5, verbose=False)
    )
    ha = a.learn(train, test)
    assert a.relational_mode == "bs_vector"
    assert ha[-1]["rejected"] == 0

    b = MCMCLearner(cfg, num_iter=25, seed=9, verbose=False)
    hb = b.learn(train, test)
    assert abs(ha[-1]["test_all"] - hb[-1]["test_all"]) < 0.12, (
        ha[-1]["test_all"], hb[-1]["test_all"],
    )


@pytest.mark.slow
def test_bs_vector_classification_matches_expansion_band():
    from libfm_tpu.data.relation import expand_join

    rng = np.random.default_rng(4)
    train, test, n_feat = _general_bs_problem(seed=8, n_cases=400)
    for ds in (train, test):
        ds.target = np.where(ds.target > 0, 1.0, -1.0).astype(np.float32)
        ds.min_target, ds.max_target = -1.0, 1.0

    cfg = FMConfig(num_features=n_feat, num_factors=3)
    a = _force_bs_vector(
        MCMCVectorLearner(cfg, task=TASK_CLASSIFICATION, num_iter=15,
                          seed=2, verbose=False)
    )
    ha = a.learn(train, test)
    assert a.relational_mode == "bs_vector"

    b = MCMCVectorLearner(cfg, task=TASK_CLASSIFICATION, num_iter=15,
                          seed=6, verbose=False)
    hb = b.learn(expand_join(train), expand_join(test))
    assert abs(ha[-1]["test_all"] - hb[-1]["test_all"]) < 0.1, (
        ha[-1]["test_all"], hb[-1]["test_all"],
    )
    assert np.isfinite(ha[-1]["auc_all"])


@pytest.mark.slow
@pytest.mark.parametrize("trial", [0, 3, 5, 13, 17])
def test_bs_vector_randomized_matches_expansion(trial):
    """Randomized differential check (5 of the 40-config fuzz sweep that
    validated the engine): random relation counts/widths/cardinalities,
    one-hot and gaussian values, with/without a main table, k in
    {1,2,4,8}, regression and classification, ALS — the BS vector
    trajectory must equal the flat engine on the materialised join.
    (Configs with attr groups are excluded: groups change the
    conflict-free partition, so the two engines sweep in different
    orders — verified to converge to the same fixed point, but not
    trajectory-comparable.)"""
    from libfm_tpu.data.relation import expand_join

    rng = np.random.default_rng(1000 + trial)
    n_rel = rng.integers(1, 3)
    n_main = int(rng.choice([0, 4, 7]))
    n_cases = int(rng.integers(80, 400))
    rels, offs = [], n_main
    for _ in range(n_rel):
        nb = int(rng.integers(3, 20))
        W = int(rng.integers(1, 6))
        m = int(rng.integers(2, 7))
        c = rng.integers(0, m, (nb, W))
        cols = (np.arange(W)[None, :] * m + c).astype(np.int32)
        vals = rng.standard_normal((nb, W)).astype(np.float32)
        if rng.random() < 0.3:
            vals = np.ones_like(vals)
        rd = RelationData(
            np.arange(nb + 1, dtype=np.int64) * W, cols.ravel(),
            vals.ravel(), W * m,
        )
        rd.attr_offset = offs
        offs += W * m
        rels.append(rd)
    n_feat = offs
    y = rng.standard_normal(n_cases).astype(np.float32)
    maps = [
        rng.integers(0, rd.num_cases, n_cases).astype(np.int32) for rd in rels
    ]
    split = max(10, n_cases // 4)

    def build(sl):
        nc = len(y[sl])
        if n_main:
            main = rng.integers(0, n_main, n_cases).astype(np.int32)[sl]
            ds = Dataset(
                np.arange(nc + 1, dtype=np.int64), main,
                np.ones(nc, np.float32), y[sl], n_main,
            )
        else:
            ds = Dataset(
                np.zeros(nc + 1, np.int64), np.empty(0, np.int32),
                np.empty(0, np.float32), y[sl], 0,
            )
        ds.relations = [
            RelationJoin(rd, mp[sl]) for rd, mp in zip(rels, maps)
        ]
        return ds

    train, test = build(slice(split, None)), build(slice(None, split))
    k = int(rng.choice([1, 2, 4, 8]))
    use_linear = bool(rng.random() < 0.8)
    from libfm_tpu.tasks import TASK_REGRESSION

    task = TASK_CLASSIFICATION if rng.random() < 0.3 else TASK_REGRESSION
    rng.random()  # keep the RNG stream aligned with the fuzz sweep
    if task == TASK_CLASSIFICATION:
        for ds in (train, test):
            ds.target = np.where(ds.target > 0, 1.0, -1.0).astype(np.float32)
            ds.min_target, ds.max_target = -1.0, 1.0
    cfg = FMConfig(
        num_features=n_feat, num_factors=k, regw=0.3, regv=0.3,
        use_linear=use_linear,
    )
    kw = dict(num_iter=6, seed=int(rng.integers(1, 99)), verbose=False,
              do_sample=False, do_multilevel=False, task=task)
    a = _force_bs_vector(MCMCVectorLearner(cfg, **kw))
    ha = a.learn(train, test)
    assert a.relational_mode == "bs_vector"
    b = MCMCVectorLearner(cfg, **kw)
    hb = b.learn(expand_join(train), expand_join(test))
    for ra, rb in zip(ha, hb):
        assert abs(ra["test_this"] - rb["test_this"]) < 5e-4, (ra, rb)


@pytest.mark.slow
def test_bs_vector_sharded_matches_single():
    """BS vector engine on a (data=2, model=4) mesh: A and the per-case
    chunks shard over `data`, w/V row-shard over `model`; the trajectory
    matches the single-device run (same math, different partitioning)."""
    from libfm_tpu.parallel.mesh import make_mesh

    train, test, n_feat = _general_bs_problem(seed=5, n_cases=400)
    cfg = FMConfig(num_features=n_feat, num_factors=4)

    a = _force_bs_vector(
        MCMCVectorLearner(cfg, num_iter=6, seed=3, verbose=False)
    )
    a.learn(train, test)
    assert a.relational_mode == "bs_vector"

    mesh = make_mesh(data=2, model=4)
    b = _force_bs_vector(
        MCMCVectorLearner(cfg, num_iter=6, seed=3, verbose=False, mesh=mesh)
    )
    b.learn(train, test)
    assert b.relational_mode == "bs_vector"

    got = [h["test_this"] for h in b.history]
    want = [h["test_this"] for h in a.history]
    assert np.allclose(got, want, atol=2e-3), (got, want)

    # V genuinely row-shards over the 4-way model axis, A over data
    V = b._vector_state["V"]
    R = V.shape[0]
    assert R % 4 == 0 and R >= n_feat + 1
    assert {s.data.shape[0] for s in V.addressable_shards} == {R // 4}
    assert b._vector_state["A_shard_shapes"] == {
        (b._vector_state["A_shape"][0] // 2, b._vector_state["A_shape"][1])
    }


@pytest.mark.slow
def test_bs_vector_tp_only_mesh_matches_single():
    """Pure-TP mesh (data=1, model=8) on the BS vector engine — the
    data-axis shardings collapse to replicated while w/V still
    row-shard; exercises the D=1 branch of the sharding plan."""
    from libfm_tpu.parallel.mesh import make_mesh

    train, test, n_feat = _general_bs_problem(seed=9, n_cases=200)
    cfg = FMConfig(num_features=n_feat, num_factors=3)
    a = _force_bs_vector(
        MCMCVectorLearner(cfg, num_iter=4, seed=2, verbose=False)
    )
    a.learn(train, test)
    b = _force_bs_vector(
        MCMCVectorLearner(cfg, num_iter=4, seed=2, verbose=False,
                          mesh=make_mesh(data=1, model=8))
    )
    b.learn(train, test)
    assert b.relational_mode == "bs_vector"
    got = [h["test_this"] for h in b.history]
    want = [h["test_this"] for h in a.history]
    assert np.allclose(got, want, atol=2e-3), (got, want)
    V = b._vector_state["V"]
    assert {s.data.shape[0] for s in V.addressable_shards} == {
        V.shape[0] // 8
    }


@pytest.mark.slow
def test_bs_vector_skew_fallback():
    """A join where one block row absorbs nearly all cases (and the
    relation has many rows) must fall back to the exact BS engine — the
    vector engine's cache build pads per-row case lists to the max."""
    rng = np.random.default_rng(1)
    nb, nc, w = 400, 500, 40
    cols = np.stack([
        np.sort(rng.choice(1000, w, replace=False)) for _ in range(nb)
    ]).astype(np.int32)
    rd = RelationData(
        np.arange(nb + 1, dtype=np.int64) * w, cols.ravel(),
        rng.standard_normal(nb * w).astype(np.float32), 1000,
    )
    rd.attr_offset = 0
    rmap = np.zeros(nc, np.int32)  # everything joins row 0
    rmap[:nb] = np.arange(nb)
    y = rng.standard_normal(nc).astype(np.float32)
    ds = Dataset(
        np.zeros(nc + 1, np.int64), np.empty(0, np.int32),
        np.empty(0, np.float32), y, 0,
    )
    ds.relations = [RelationJoin(rd, rmap)]

    from libfm_tpu.learners.mcmc_rel_vector import bs_vector_skew

    assert bs_vector_skew(ds) > 16.0
    cfg = FMConfig(num_features=1000, num_factors=2)
    m = _force_bs_vector(MCMCVectorLearner(cfg, num_iter=2, seed=1,
                                           verbose=False))
    m.learn(ds, ds)
    assert m.relational_mode == "bs"


def test_bs_vector_disable_flag_uses_exact_engine():
    train, test, _, _, n_feat = make_relational_problem(n_cases=200)
    cfg = FMConfig(num_features=n_feat, num_factors=2)
    m = _force_bs_vector(MCMCVectorLearner(cfg, num_iter=2, seed=1,
                                           verbose=False))
    m.bs_vector = False
    m.learn(train, test)
    assert m.relational_mode == "bs"


@pytest.mark.slow
def test_bs_vector_checkpoint_resume(tmp_path):
    """Exact resume on the BS vector path (parity with the flat vector
    engine's checkpoint story)."""
    train, test, _, _, n_feat = make_relational_problem(n_cases=300)
    cfg = FMConfig(num_features=n_feat, num_factors=3)
    p = str(tmp_path / "bsvec.npz")

    full = _force_bs_vector(
        MCMCVectorLearner(cfg, num_iter=8, seed=9, verbose=False)
    )
    full.learn(train, test)
    a = _force_bs_vector(MCMCVectorLearner(
        cfg, num_iter=4, seed=9, verbose=False,
        checkpoint_path=p, checkpoint_every=4,
    ))
    a.learn(train, test)
    b = _force_bs_vector(MCMCVectorLearner(
        cfg, num_iter=8, seed=9, verbose=False,
        checkpoint_path=p, checkpoint_every=4,
    ))
    b.learn(train, test)
    got = [h["test_this"] for h in b.history]
    want = [h["test_this"] for h in full.history[4:]]
    assert np.allclose(got, want, rtol=1e-4)


def test_bs_vector_rejects_out_of_range_join_map():
    train, test, _, _, n_feat = make_relational_problem(n_cases=100)
    train.relations[0].row_map[0] = 10_000  # beyond the block's rows
    cfg = FMConfig(num_features=n_feat, num_factors=2)
    m = _force_bs_vector(MCMCVectorLearner(cfg, num_iter=1, seed=1,
                                           verbose=False))
    with pytest.raises(ValueError, match="block row 10000 but"):
        m.learn(train, test)


@pytest.mark.slow
def test_bs_vector_slab_cache_build_matches_direct():
    """The slab-partitioned cache build (gathers grouped by on-chip
    slices of A — BENCHNOTES "Gather cost vs table size") is an exact
    restructure: forcing it on a small problem must reproduce the
    direct path's trajectory to f32 summation-order tolerance."""
    train, test, n_feat = _general_bs_problem(seed=11, n_cases=500)
    cfg = FMConfig(num_features=n_feat, num_factors=4)
    kw = dict(num_iter=8, seed=5, verbose=False)

    a = _force_bs_vector(MCMCVectorLearner(cfg, **kw))
    ha = a.learn(train, test)
    assert a.relational_mode == "bs_vector"

    b = _force_bs_vector(MCMCVectorLearner(cfg, **kw))
    b._slab_threshold_bytes = 0      # force slabs on a tiny A table
    b._slab_bytes = 2048             # several slabs even at 500 cases
    hb = b.learn(train, test)
    assert b.relational_mode == "bs_vector"

    got = [h["test_this"] for h in hb]
    want = [h["test_this"] for h in ha]
    assert np.allclose(got, want, atol=2e-3), (got, want)


@pytest.mark.slow
def test_bs_vector_refresh_cadence_matches_every_iteration():
    """The BS engine's resync pass maintains A = [e|Q] exactly, so the
    per-iteration refresh is float-drift control for regression (same
    argument as the flat engine); refresh_every>1 must reproduce the
    R=1 trajectory to drift tolerance."""
    train, test, n_feat = _general_bs_problem(seed=7, n_cases=500)
    cfg = FMConfig(num_features=n_feat, num_factors=4)

    a = _force_bs_vector(
        MCMCVectorLearner(cfg, num_iter=9, seed=2, verbose=False,
                          refresh_every=1)
    )
    a.learn(train, test)
    assert a.relational_mode == "bs_vector"
    b = _force_bs_vector(
        MCMCVectorLearner(cfg, num_iter=9, seed=2, verbose=False,
                          refresh_every=3)
    )
    b.learn(train, test)
    got = [h["test_all"] for h in b.history]
    want = [h["test_all"] for h in a.history]
    assert np.allclose(got, want, atol=2e-3), (got, want)
    got_tr = [h["train"] for h in b.history]
    want_tr = [h["train"] for h in a.history]
    assert np.allclose(got_tr, want_tr, atol=5e-3), (got_tr, want_tr)


def _single_rel_problem(seed=7, NB=60, W=5, NF=200, NTR=3000):
    """Pure-BS single-relation regression (the bench_bs shape, tiny):
    the deferred fast-iteration path's gated case."""
    rng = np.random.default_rng(seed)
    cols = np.stack(
        [np.sort(rng.choice(NF, W, replace=False)) for _ in range(NB)]
    ).astype(np.int32)
    vals = rng.standard_normal((NB, W)).astype(np.float32)
    rd = RelationData(
        np.arange(NB + 1, dtype=np.int64) * W, cols.ravel(), vals.ravel(),
        NF,
    )
    rd.attr_offset = 0
    beta = rng.standard_normal(NF).astype(np.float32) * 0.1
    score = (vals * beta[cols]).sum(axis=1)

    def build(m, y):
        nc = len(y)
        ds = Dataset(
            np.zeros(nc + 1, np.int64), np.empty(0, np.int32),
            np.empty(0, np.float32), y, 0,
        )
        ds.relations = [RelationJoin(rd, m)]
        return ds

    mtr = rng.integers(0, NB, NTR).astype(np.int32)
    mte = rng.integers(0, NB, NTR // 5).astype(np.int32)
    train = build(
        mtr, (score[mtr] + 0.2 * rng.standard_normal(NTR)).astype(np.float32)
    )
    test = build(
        mte,
        (score[mte] + 0.2 * rng.standard_normal(NTR // 5)).astype(np.float32),
    )
    return train, test, NF


@pytest.mark.slow
def test_bs_deferred_matches_per_iteration():
    """Round 5: the deferred fast-iteration path (frozen caches +
    cross-iteration SD, closed-form alpha/w0/metric sums, per-case work
    only at refresh) must track the per-iteration resync path — same
    chain up to f32 drift."""
    train, test, nf = _single_rel_problem()
    cfg = FMConfig(num_features=nf, num_factors=4)
    hist = {}
    for mode in (True, False):
        lr = _force_bs_vector(
            MCMCVectorLearner(cfg, num_iter=10, seed=3, verbose=False)
        )
        lr.bs_deferred = mode
        lr.learn(train, test)
        assert lr.relational_mode == "bs_vector"
        hist[mode] = lr.history
    for ra, rb in zip(hist[True], hist[False]):
        assert abs(ra["test_all"] - rb["test_all"]) < 5e-4, (ra, rb)
        assert abs(ra["alpha"] - rb["alpha"]) / max(rb["alpha"], 1e-6) < 0.05


def test_bs_deferred_als_exact_trajectory():
    """ALS (deterministic draws) under the deferred path: trajectory
    equality with the per-iteration path is a sharp algebra check (no
    sampling noise to hide behind)."""
    train, test, nf = _single_rel_problem(seed=9)
    cfg = FMConfig(num_features=nf, num_factors=3, regw=0.2, regv=0.2)
    hist = {}
    for mode in (True, False):
        lr = _force_bs_vector(
            MCMCVectorLearner(cfg, num_iter=8, seed=5, verbose=False,
                              do_sample=False, do_multilevel=False)
        )
        lr.bs_deferred = mode
        lr.learn(train, test)
        hist[mode] = lr.history
    for ra, rb in zip(hist[True], hist[False]):
        assert abs(ra["test_this"] - rb["test_this"]) < 2e-4, (ra, rb)
