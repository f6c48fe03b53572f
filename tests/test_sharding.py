"""Sharded == single-device tests on the simulated 8-device CPU mesh
(SURVEY.md §4 item 4: assert parity before any TPU run)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from libfm_tpu.data.synth import movielens_like
from libfm_tpu.learners.sgd import SGDLearner
from libfm_tpu.models.fm import FMConfig
from libfm_tpu.parallel.mesh import make_mesh, fm_shardings
from libfm_tpu.parallel.sharded_sgd import ShardedSGDLearner


@pytest.fixture(scope="module")
def data():
    return movielens_like(num_users=100, num_items=80, num_ratings=6000, seed=7)


def test_mesh_shapes():
    mesh = make_mesh(data=4, model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh = make_mesh()  # all devices on data
    assert mesh.shape["data"] == len(jax.devices())


def test_sharded_sgd_matches_single_device(data):
    train, test = data
    cfg = FMConfig(num_features=train.num_features, num_factors=4, regv=0.01)
    kwargs = dict(
        num_iter=3, learn_rate=0.01, batch_size=512, seed=1, verbose=False
    )

    single = SGDLearner(cfg, **kwargs)
    h1 = single.learn(train, test)

    mesh = make_mesh(data=4, model=2)
    sharded = ShardedSGDLearner(cfg, mesh=mesh, **kwargs)
    h2 = sharded.learn(train, test)

    # identical math, different partitioning: trajectories must agree to
    # float tolerance
    for (tr1, te1, _), (tr2, te2, _) in zip(h1, h2):
        assert abs(tr1 - tr2) < 1e-3, (tr1, tr2)
        assert abs(te1 - te2) < 1e-3, (te1, te2)

    # parameters agree too (up to feature padding added for the mesh)
    n = cfg.num_features
    v1 = np.asarray(single.params.v)
    v2 = np.asarray(sharded.params.v)[:n]
    assert np.allclose(v1, v2, atol=1e-4)


def test_sharded_params_actually_sharded(data):
    train, test = data
    cfg = FMConfig(num_features=train.num_features, num_factors=4)
    mesh = make_mesh(data=2, model=4)
    l = ShardedSGDLearner(
        cfg, mesh=mesh, num_iter=1, learn_rate=0.01, batch_size=256,
        seed=1, verbose=False,
    )
    l.learn(train, test)
    shard_shapes = {s.data.shape for s in l.params.v.addressable_shards}
    n_pad = l.cfg.num_features
    assert shard_shapes == {(n_pad // 4, 4)}  # row-sharded over model axis


@pytest.mark.slow
def test_vector_mcmc_sharded_matches_single(data):
    from libfm_tpu.learners.mcmc_vector import MCMCVectorLearner

    train, test = data
    cfg = FMConfig(num_features=train.num_features, num_factors=4)
    a = MCMCVectorLearner(cfg, num_iter=5, seed=3, verbose=False)
    a.learn(train, test)
    mesh = make_mesh(data=len(jax.devices()), model=1)
    b = MCMCVectorLearner(cfg, num_iter=5, seed=3, verbose=False, mesh=mesh)
    b.learn(train, test)
    got = [h["test_this"] for h in b.history]
    want = [h["test_this"] for h in a.history]
    assert np.allclose(got, want, atol=2e-3), (got, want)


@pytest.mark.slow
def test_vector_mcmc_tp_matches_single(data):
    """Model-parallel (TP) vector MCMC on a (data=2, model=4) mesh: w/V
    row-sharded over `model`, A over `data` — results must match the
    single-device engine (same math, different partitioning)."""
    from libfm_tpu.learners.mcmc_vector import MCMCVectorLearner

    train, test = data
    cfg = FMConfig(num_features=train.num_features, num_factors=4)
    a = MCMCVectorLearner(cfg, num_iter=5, seed=3, verbose=False)
    a.learn(train, test)
    mesh = make_mesh(data=2, model=4)
    b = MCMCVectorLearner(cfg, num_iter=5, seed=3, verbose=False, mesh=mesh)
    b.learn(train, test)
    got = [h["test_this"] for h in b.history]
    want = [h["test_this"] for h in a.history]
    assert np.allclose(got, want, atol=2e-3), (got, want)

    # V is genuinely row-sharded over the 4-way model axis
    V = b._vector_state["V"]
    n = cfg.num_features
    shard_rows = sorted(s.data.shape[0] for s in V.addressable_shards)
    per = -(-n // 4)  # ceil for uneven n
    assert all(r in (per, n - 3 * per) for r in shard_rows), shard_rows
    assert sum(shard_rows) // 2 == n  # each row appears once per data replica

    # ALS variant (deterministic) under TP matches too
    from libfm_tpu.learners.mcmc_vector import ALSVectorLearner

    c = ALSVectorLearner(cfg, num_iter=3, seed=3, verbose=False)
    c.set_regularization([0.0, 1.0, 2.0], 1)
    c.learn(train, test)
    d = ALSVectorLearner(cfg, num_iter=3, seed=3, verbose=False, mesh=mesh)
    d.set_regularization([0.0, 1.0, 2.0], 1)
    d.learn(train, test)
    got = [h["test_this"] for h in d.history]
    want = [h["test_this"] for h in c.history]
    assert np.allclose(got, want, atol=2e-3), (got, want)


def test_sharded_sgd_predict_and_evaluate(data):
    train, test = data
    cfg = FMConfig(num_features=train.num_features, num_factors=4, regv=0.01)
    mesh = make_mesh(data=4, model=2)
    l = ShardedSGDLearner(
        cfg, mesh=mesh, num_iter=2, learn_rate=0.01, batch_size=512,
        seed=1, verbose=False,
    )
    l.learn(train, test)
    preds = l.predict(test)
    assert preds.shape == (test.num_rows,)
    assert (preds >= train.min_target - 1e-5).all()
    assert (preds <= train.max_target + 1e-5).all()
    rmse = float(np.sqrt(np.mean((preds - test.target) ** 2)))
    assert abs(rmse - l.evaluate(test)) < 0.05


@pytest.mark.slow
def test_vector_mcmc_tp_classification(data):
    """TP mesh + probit classification: finite metrics and parity with
    the single-device engine."""
    from libfm_tpu.data.synth import ctr_like
    from libfm_tpu.learners.mcmc_vector import MCMCVectorLearner
    from libfm_tpu.tasks import TASK_CLASSIFICATION

    train, test, groups = ctr_like(
        num_fields=4, field_cardinality=40, num_examples=4000, seed=6
    )
    cfg = FMConfig(num_features=train.num_features, num_factors=4)
    a = MCMCVectorLearner(
        cfg, task=TASK_CLASSIFICATION, num_iter=6, seed=2, verbose=False,
        attr_group=groups,
    )
    a.learn(train, test)
    mesh = make_mesh(data=2, model=4)
    b = MCMCVectorLearner(
        cfg, task=TASK_CLASSIFICATION, num_iter=6, seed=2, verbose=False,
        attr_group=groups, mesh=mesh,
    )
    b.learn(train, test)
    got = [h["test_all"] for h in b.history]
    want = [h["test_all"] for h in a.history]
    assert np.allclose(got, want, atol=5e-3), (got, want)
