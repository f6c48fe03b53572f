"""Vector-sweep engine tests: layout invariants + agreement with the
exact scalar engine (and through it, the reference binary)."""

import numpy as np
import pytest

from libfm_tpu.data.batching import conflict_free_blocks
from libfm_tpu.data.synth import ctr_like, movielens_like
from libfm_tpu.data.vector_layout import build_block_layout, padded_rows_layout
from libfm_tpu.learners.mcmc import ALSLearner, MCMCLearner
from libfm_tpu.learners.mcmc_vector import ALSVectorLearner, MCMCVectorLearner
from libfm_tpu.models.fm import FMConfig
from libfm_tpu.tasks import TASK_CLASSIFICATION


@pytest.fixture(scope="module")
def ml_small():
    return movielens_like(num_users=120, num_items=90, num_ratings=8000, seed=3)


def test_layout_covers_all_entries(ml_small):
    train, _ = ml_small
    blocks = conflict_free_blocks(train)
    total_slots = 0
    total_entries = 0
    for b in blocks:
        lay = build_block_layout(
            b.features, b.entry_rows, b.entry_vals, b.entry_feat,
            np.zeros(len(b.features), np.int32), train.num_rows,
            widths=(8, 64, 512),
        )
        for bk in lay.buckets:
            real = bk.slot_case != train.num_rows
            total_slots += int(real.sum())
            # padding slots must carry value 0
            assert (bk.slot_val[~real] == 0).all()
            # each segment belongs to exactly one feature
            assert bk.seg_feat.max() < lay.num_features
        total_entries += len(b.entry_rows)
    assert total_slots == total_entries == train.nnz


def test_layout_case_appears_once_per_block(ml_small):
    train, _ = ml_small
    blocks = conflict_free_blocks(train)
    for b in blocks:
        lay = build_block_layout(
            b.features, b.entry_rows, b.entry_vals, b.entry_feat,
            np.zeros(len(b.features), np.int32), train.num_rows,
        )
        cases = np.concatenate(
            [bk.slot_case[bk.slot_case != train.num_rows] for bk in lay.buckets]
        )
        assert len(cases) == len(np.unique(cases))


def test_padded_rows_layout(ml_small):
    train, _ = ml_small
    ids, vals = padded_rows_layout(train.indptr, train.cols, train.vals)
    assert ids.shape[0] == train.num_rows
    # per-row sums of values survive the padding
    lens = np.diff(train.indptr)
    for i in (0, 5, len(lens) - 1):
        s, e = train.indptr[i], train.indptr[i + 1]
        assert np.allclose(np.sort(vals[i][: lens[i]]), np.sort(train.vals[s:e]))
    assert (vals[ids == 0] >= 0).all()  # padding zeros contribute nothing


def test_als_vector_matches_exact(ml_small):
    train, test = ml_small
    cfg = FMConfig(num_features=train.num_features, num_factors=8, regw=5, regv=5)
    a = ALSLearner(cfg, num_iter=12, seed=1, verbose=False)
    a.learn(train, test)
    b = ALSVectorLearner(cfg, num_iter=12, seed=1, verbose=False)
    b.learn(train, test)
    # same fixed point: scalar and vector block coordinate descent agree
    assert abs(a.history[-1]["test_this"] - b.history[-1]["test_this"]) < 5e-3


@pytest.mark.slow
def test_mcmc_vector_converges_like_exact(ml_small):
    train, test = ml_small
    cfg = FMConfig(num_features=train.num_features, num_factors=8)
    a = MCMCLearner(cfg, num_iter=20, seed=1, verbose=False)
    a.learn(train, test)
    b = MCMCVectorLearner(cfg, num_iter=20, seed=1, verbose=False)
    b.learn(train, test)
    assert abs(a.history[-1]["test_all"] - b.history[-1]["test_all"]) < 0.03
    assert b.history[-1]["rejected"] == 0
    # posterior noise level agrees
    assert abs(a.history[-1]["alpha"] - b.history[-1]["alpha"]) < 2.0


@pytest.mark.slow
def test_mcmc_vector_classification():
    train, test, groups = ctr_like(
        num_fields=5, field_cardinality=50, num_examples=6000, seed=4
    )
    cfg = FMConfig(num_features=train.num_features, num_factors=4)
    l = MCMCVectorLearner(
        cfg, task=TASK_CLASSIFICATION, num_iter=15, seed=1, verbose=False,
        attr_group=groups,
    )
    l.learn(train, test)
    assert l.history[-1]["test_all"] > 0.62
    preds = l.predict(test)
    assert ((preds >= 0) & (preds <= 1)).all()


@pytest.mark.slow
def test_mcmc_vector_grouped_and_eval_prefix(ml_small):
    train, test = ml_small
    groups = np.zeros(train.num_features, dtype=np.int32)
    groups[120:] = 1
    cfg = FMConfig(num_features=train.num_features, num_factors=4)
    l = MCMCVectorLearner(
        cfg, num_iter=8, seed=1, verbose=False, attr_group=groups,
        num_eval_cases=100,
    )
    l.learn(train, test)
    assert np.isfinite(l.history[-1]["test_all"])


@pytest.mark.slow
def test_vector_checkpoint_resume(tmp_path, ml_small):
    train, test = ml_small
    cfg = FMConfig(num_features=train.num_features, num_factors=4)
    p = str(tmp_path / "vec.npz")
    full = MCMCVectorLearner(cfg, num_iter=8, seed=9, verbose=False)
    full.learn(train, test)
    a = MCMCVectorLearner(
        cfg, num_iter=4, seed=9, verbose=False,
        checkpoint_path=p, checkpoint_every=4,
    )
    a.learn(train, test)
    b = MCMCVectorLearner(
        cfg, num_iter=8, seed=9, verbose=False,
        checkpoint_path=p, checkpoint_every=4,
    )
    b.learn(train, test)
    got = [h["test_this"] for h in b.history]
    want = [h["test_this"] for h in full.history[4:]]
    assert np.allclose(got, want, rtol=1e-4)


@pytest.mark.slow
def test_dual_draw_matches_dense_als(ml_small):
    """ALS means from the dual (Woodbury) path must equal the dense
    d x d solve exactly (same linear system, different factorisation)."""
    train, test = ml_small
    cfg = FMConfig(num_features=train.num_features, num_factors=8, regw=5, regv=5)
    a = ALSVectorLearner(cfg, num_iter=8, seed=1, verbose=False, dual_draws=False)
    a.learn(train, test)
    b = ALSVectorLearner(cfg, num_iter=8, seed=1, verbose=False, dual_draws=True)
    b.learn(train, test)
    got = [h["test_this"] for h in b.history]
    want = [h["test_this"] for h in a.history]
    assert np.allclose(got, want, atol=2e-3), (got, want)


@pytest.mark.slow
def test_dual_draw_mcmc_converges(ml_small):
    train, test = ml_small
    cfg = FMConfig(num_features=train.num_features, num_factors=8)
    m = MCMCVectorLearner(cfg, num_iter=20, seed=1, verbose=False, dual_draws=True)
    m.learn(train, test)
    assert m.history[-1]["test_all"] < 0.42
    assert m.history[-1]["rejected"] == 0


def test_dual_sampler_distribution():
    """The Woodbury sampler must produce N(mu, Lam^-1) exactly: check
    mean and covariance against the closed form on one tiny system."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    c, d = 3, 5
    H = rng.standard_normal((c, d)).astype(np.float32)
    lam = (0.5 + rng.random(d)).astype(np.float32)
    alpha = 1.7
    e = rng.standard_normal(c).astype(np.float32)
    th_old = rng.standard_normal(d).astype(np.float32)
    m = rng.standard_normal(d).astype(np.float32) * 0.1

    Lam = np.diag(lam) + alpha * H.T @ H
    b = alpha * H.T @ H @ th_old - alpha * H.T @ e + lam * m
    mu_dense = np.linalg.solve(Lam, b)
    cov_dense = np.linalg.inv(Lam)

    Dinv = 1.0 / lam
    Phi = np.sqrt(alpha) * H
    ytil = np.sqrt(alpha) * (H @ (th_old - m) - e)
    K = Phi @ np.diag(Dinv) @ Phi.T

    def draw(key):
        ku, kd = jax.random.split(key)
        u = jnp.sqrt(Dinv) * jax.random.normal(ku, (d,))
        dl = jax.random.normal(kd, (c,))
        v = Phi @ u + dl
        w = np.linalg.solve(K + np.eye(c), np.asarray(ytil - v))
        return m + np.asarray(u) + Dinv * (Phi.T @ w)

    keys = jax.random.split(jax.random.PRNGKey(3), 4000)
    samples = np.stack([draw(k) for k in keys])
    assert np.allclose(samples.mean(0), mu_dense, atol=0.1), (
        samples.mean(0), mu_dense
    )
    assert np.allclose(np.cov(samples.T), cov_dense, atol=0.12)


@pytest.mark.slow
def test_dense_update_matches_slot_update(ml_small):
    """The case-major dense update pass is the same math as the slot
    scatter path (different summation order only): identical ALS fixed
    points and near-identical MCMC trajectories at same seed."""
    train, test = ml_small
    cfg = FMConfig(num_features=train.num_features, num_factors=4, regw=2, regv=2)
    a = ALSVectorLearner(cfg, num_iter=8, seed=1, verbose=False, dense_update=True)
    a.learn(train, test)
    b = ALSVectorLearner(cfg, num_iter=8, seed=1, verbose=False, dense_update=False)
    b.learn(train, test)
    got = [h["test_this"] for h in a.history]
    want = [h["test_this"] for h in b.history]
    assert np.allclose(got, want, atol=1e-3), (got, want)

    c = MCMCVectorLearner(cfg, num_iter=8, seed=1, verbose=False, dense_update=True)
    c.learn(train, test)
    d = MCMCVectorLearner(cfg, num_iter=8, seed=1, verbose=False, dense_update=False)
    d.learn(train, test)
    got = [h["test_all"] for h in c.history]
    want = [h["test_all"] for h in d.history]
    assert np.allclose(got, want, atol=2e-3), (got, want)


@pytest.mark.slow
def test_refresh_cadence_matches_every_iteration(ml_small):
    """refresh_every>1 skips the numerical re-predict (the caches are
    maintained exactly by the sweeps); trajectories must match the
    every-iteration refresh to float-drift tolerance."""
    train, test = ml_small
    cfg = FMConfig(num_features=train.num_features, num_factors=4)
    a = MCMCVectorLearner(cfg, num_iter=9, seed=2, verbose=False)
    a.learn(train, test)
    b = MCMCVectorLearner(cfg, num_iter=9, seed=2, verbose=False,
                          refresh_every=3)
    b.learn(train, test)
    got = [h["test_all"] for h in b.history]
    want = [h["test_all"] for h in a.history]
    assert np.allclose(got, want, atol=2e-3), (got, want)
    got_tr = [h["train"] for h in b.history]
    want_tr = [h["train"] for h in a.history]
    assert np.allclose(got_tr, want_tr, atol=5e-3), (got_tr, want_tr)


@pytest.mark.slow
def test_case_major_stats_matches_slot_path():
    """The case-major moment-matmul stats and the slot-gather stats
    compute the same statistic (different summation order) — same RNG
    stream, near-identical trajectories."""
    from libfm_tpu.data.synth import ctr_like

    train, test, groups = ctr_like(
        num_fields=5, field_cardinality=200, num_examples=15000, seed=4
    )
    cfg = FMConfig(num_features=train.num_features, num_factors=8)
    res = {}
    for flag in (True, False):
        l = MCMCVectorLearner(
            cfg, task=TASK_CLASSIFICATION, num_iter=6, seed=3,
            verbose=False, attr_group=groups,
        )
        l.case_major_stats = flag
        l.learn(train, test)
        res[flag] = l.history[-1]
    assert abs(res[True]["test_all"] - res[False]["test_all"]) < 5e-3
    assert abs(res[True]["train"] - res[False]["train"]) < 5e-3
    assert res[True]["rejected"] == res[False]["rejected"] == 0


@pytest.mark.slow
def test_als_default_refresh_drift_bound(ml_small):
    """ALS defaults to refresh_every=ALS_DEFAULT_REFRESH (the sweep is
    deterministic; the per-iteration re-predict is pure float-drift
    control, fm_learn_mcmc_simultaneous.h:123-124). The default cadence
    must match the reference-exact refresh_every=1 trajectory to drift
    tolerance (VERDICT round-2 item #2 drift-bound test)."""
    train, test = ml_small
    cfg = FMConfig(num_features=train.num_features, num_factors=4)
    a = ALSVectorLearner(cfg, num_iter=12, seed=1, verbose=False,
                         refresh_every=1)
    a.set_regularization([0.0, 0.0, 10.0], 1)
    a.learn(train, test)
    b = ALSVectorLearner(cfg, num_iter=12, seed=1, verbose=False)
    assert b.refresh_every == MCMCVectorLearner.ALS_DEFAULT_REFRESH
    b.set_regularization([0.0, 0.0, 10.0], 1)
    b.learn(train, test)
    got = [h["test_this"] for h in b.history]
    want = [h["test_this"] for h in a.history]
    assert np.allclose(got, want, atol=1e-3), (got, want)
    # every task defaults to the fast cadence (round 4): the sampled
    # draws are inside the exact incremental updates, and classification
    # resamples its probit latents from pred = e + latent without the
    # full re-predict; refresh is drift control either way
    assert (
        MCMCVectorLearner(cfg, num_iter=1, verbose=False).refresh_every
        == MCMCVectorLearner.ALS_DEFAULT_REFRESH
    )
    assert (
        MCMCVectorLearner(
            cfg, num_iter=1, verbose=False, task=TASK_CLASSIFICATION
        ).refresh_every == MCMCVectorLearner.ALS_DEFAULT_REFRESH
    )


@pytest.mark.slow
def test_classification_refresh_cadence_quality():
    """The classification fast path (persistent probit latents, round 4)
    must converge to the same quality as the every-iteration refresh.
    Trajectories are NOT bit-equal (the every-iteration refresh
    resamples from freshly recomputed predictions; the fast path from
    the incrementally maintained e + latent — identical values up to
    f32 drift, but the truncated-normal draw then amplifies ulp-level
    differences into a different-but-equally-distributed chain), so
    compare converged metrics, not steps."""
    from libfm_tpu.data.synth import ctr_like

    train, test, groups = ctr_like(
        num_fields=5, field_cardinality=200, num_examples=15000, seed=4
    )
    cfg = FMConfig(num_features=train.num_features, num_factors=8)
    res = {}
    for r in (1, 4):
        l = MCMCVectorLearner(
            cfg, task=TASK_CLASSIFICATION, num_iter=15, seed=3,
            verbose=False, attr_group=groups, refresh_every=r,
        )
        l.learn(train, test)
        res[r] = l.history[-1]
    assert abs(res[1]["test_all"] - res[4]["test_all"]) < 1e-2, res
    assert abs(res[1]["train"] - res[4]["train"]) < 1e-2, res
    assert res[4]["rejected"] == 0


def test_case_reorder_slab_stats_matches_unordered(ml_small):
    """Case reordering + slab-partitioned gathers (VERDICT r4 item 4)
    must not change the chain: the permutation only reindexes cases and
    the slab gathers read the same A rows through a resident slice. Run
    in f64 so any real difference stands out above summation-order
    noise (the slab chunking does reorder a few f32 adds)."""
    train, test = ml_small
    cfg = FMConfig(num_features=train.num_features, num_factors=4)

    def run(reorder):
        l = MCMCVectorLearner(cfg, num_iter=6, seed=9, verbose=False)
        l.case_reorder = reorder
        l.case_reorder_min_bytes = 0  # force at tiny scale
        l.case_major_stats = False  # force the slot path (slabs' target)
        l.slab_cases = 1024
        l.learn(train, test)
        return l

    a = run(False)
    b = run(True)
    assert getattr(b, "_case_reordered", False), "reorder did not engage"
    assert not getattr(a, "_case_reordered", False)
    for ha, hb in zip(a.history, b.history):
        # identical chain up to f32 summation-order noise (the slab
        # chunk boundaries regroup a few GG adds)
        assert abs(ha["test_all"] - hb["test_all"]) < 2e-4, (ha, hb)
        assert abs(ha["train"] - hb["train"]) < 2e-4


def test_slab_partition_roundtrip():
    """slab_partition must preserve every (case, val, feature) slot and
    produce in-window relative ids."""
    from libfm_tpu.data.vector_layout import slab_partition

    rng = np.random.default_rng(0)
    num_rows, W, SLAB = 5000, 8, 1024
    # contiguous feature ranges (the case-sorted precondition)
    nseg = 40
    segs, feat, start = [], [], 0
    for s in range(nseg):
        ln = int(rng.integers(1, W + 1))
        ids = np.arange(start, min(start + ln, num_rows))
        row = np.full(W, num_rows, np.int32)
        row[: len(ids)] = ids
        segs.append(row)
        feat.append(s // 3)
        start += ln
    slot_case = np.stack(segs)
    slot_val = np.where(
        slot_case < num_rows, rng.standard_normal(slot_case.shape), 0.0
    ).astype(np.float32)
    seg_feat = np.asarray(feat, np.int32)
    out = slab_partition(slot_case, slot_val, seg_feat, SLAB, num_rows)
    assert out is not None
    sc_rel, sv, sf, starts = out
    ns, ms, _ = sc_rel.shape
    assert (sc_rel >= 0).all() and (sc_rel < SLAB).all()
    got = set()
    want = {
        (int(c), float(v), int(f_))
        for c, v, f_ in zip(
            slot_case[slot_case < num_rows],
            slot_val[slot_case < num_rows],
            np.repeat(seg_feat, W)[slot_case.reshape(-1) < num_rows],
        )
    }
    for i in range(ns):
        for j in range(ms):
            for w in range(W):
                if sv[i, j, w] != 0.0:
                    got.add(
                        (int(sc_rel[i, j, w] + starts[i]),
                         float(sv[i, j, w]), int(sf[i, j]))
                    )
    assert got == want


# (round 5) test_segment_combine_matches_scatter was removed together
# with the segment-combine stats store it covered: the path measured
# NEUTRAL on its designed config (#5 zipf heads, 5.7023 vs 5.7033
# s/iter — studies/results/segcomb.json), so the gated lever and its
# DevBucket fields were deleted (VERDICT r4 item 7).


def test_dual_c2_split_exact_als():
    """Round 5: the count<=2 dual bucket runs the Woodbury gram on a
    2-slot window. Under ALS (deterministic draws) the split must give
    the BITWISE-identical trajectory to the unsplit dual path — the
    dropped slots are zero-payload padding."""
    import numpy as np

    from libfm_tpu.data.synth import ctr_like
    from libfm_tpu.tasks import TASK_CLASSIFICATION

    tr, te, g = ctr_like(
        num_fields=4, field_cardinality=100, num_examples=2000, seed=1
    )
    res = {}
    for split in (True, False):
        l = MCMCVectorLearner(
            FMConfig(num_features=tr.num_features, num_factors=40),
            task=TASK_CLASSIFICATION, num_iter=5, seed=1, verbose=False,
            attr_group=g, do_sample=False, do_multilevel=False,
        )
        l._dual_c2_split = split
        l.learn(tr, te)
        res[split] = [h["test_this"] for h in l.history]
    assert np.allclose(res[True], res[False], atol=1e-7), res
