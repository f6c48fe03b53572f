"""Checkpoint/resume tests — incl. exact-resume of an MCMC chain (the
capability the reference explicitly lacks, libfm.cpp:123-133)."""

import numpy as np

import jax.numpy as jnp

from libfm_tpu.data.synth import movielens_like
from libfm_tpu.learners.mcmc import ALSLearner, MCMCLearner
from libfm_tpu.models.fm import FMConfig, FMParams
from libfm_tpu.utils import checkpoint as ckpt
import pytest


def test_save_restore_pytree(tmp_path):
    p = str(tmp_path / "st.npz")
    state = FMParams(
        w0=jnp.asarray(1.5),
        w=jnp.arange(4, dtype=jnp.float32),
        v=jnp.ones((4, 2), jnp.float32),
    )
    ckpt.save_state(p, state, {"iter": 7})
    restored, meta = ckpt.restore_state(p, like=state)
    assert meta["iter"] == 7
    assert float(restored.w0) == 1.5
    assert np.array_equal(np.asarray(restored.w), [0, 1, 2, 3])


@pytest.mark.slow
def test_mcmc_resume_exact(tmp_path):
    """Run 10 iters straight vs 5 + resume 5: identical trajectories
    (the checkpoint carries the rng key and all caches)."""
    train, test = movielens_like(num_users=60, num_items=40, num_ratings=2000, seed=2)
    cfg = FMConfig(num_features=train.num_features, num_factors=3)
    p = str(tmp_path / "chain.npz")

    full = MCMCLearner(cfg, num_iter=10, seed=5, verbose=False)
    full.learn(train, test)

    a = MCMCLearner(
        cfg, num_iter=5, seed=5, verbose=False,
        checkpoint_path=p, checkpoint_every=5,
    )
    a.learn(train, test)
    b = MCMCLearner(
        cfg, num_iter=10, seed=5, verbose=False,
        checkpoint_path=p, checkpoint_every=5,
    )
    b.learn(train, test)
    # resumed learner only logs iters 5..9
    assert [h["iter"] for h in b.history] == list(range(5, 10))
    got = [h["test_this"] for h in b.history]
    want = [h["test_this"] for h in full.history[5:]]
    assert np.allclose(got, want, rtol=1e-5), (got, want)


def test_mismatched_checkpoint_ignored(tmp_path):
    train, test = movielens_like(num_users=60, num_items=40, num_ratings=2000, seed=2)
    cfg = FMConfig(num_features=train.num_features, num_factors=3)
    p = str(tmp_path / "chain.npz")
    a = ALSLearner(
        cfg, num_iter=3, seed=5, verbose=False,
        checkpoint_path=p, checkpoint_every=1,
    )
    a.learn(train, test)
    # different k -> config mismatch -> fresh start, no crash
    cfg2 = FMConfig(num_features=train.num_features, num_factors=4)
    b = ALSLearner(
        cfg2, num_iter=2, seed=5, verbose=False,
        checkpoint_path=p, checkpoint_every=0,
    )
    b.learn(train, test)
    assert [h["iter"] for h in b.history] == [0, 1]


def test_cross_engine_checkpoint_starts_fresh(tmp_path, capsys):
    """A checkpoint written by the scalar engine must not crash the
    vector engine's restore — it warns and starts fresh (different state
    trees; the meta echo can't distinguish them)."""
    from libfm_tpu.data.synth import movielens_like
    from libfm_tpu.learners.mcmc import MCMCLearner
    from libfm_tpu.learners.mcmc_vector import MCMCVectorLearner
    from libfm_tpu.models.fm import FMConfig

    train, test = movielens_like(num_users=20, num_items=15,
                                 num_ratings=300, seed=0)
    cfg = FMConfig(num_features=train.num_features, num_factors=2)
    p = str(tmp_path / "cross.npz")
    a = MCMCLearner(cfg, num_iter=2, seed=1, verbose=False,
                    checkpoint_path=p, checkpoint_every=2)
    a.learn(train, test)

    b = MCMCVectorLearner(cfg, num_iter=2, seed=1, verbose=False,
                          checkpoint_path=p, checkpoint_every=2)
    b.learn(train, test)  # must not raise
    assert len(b.history) == 2
    assert "starting fresh" in capsys.readouterr().out


def test_classification_vector_resume_with_latent(tmp_path):
    """Classification checkpoints carry the probit latent vector (round-4
    fast path state); 4 + resume 4 must track the straight 8-iteration
    chain. Not bit-exact: the resumed run's first iteration re-grounds
    via a full refresh (start_iter gate) while the straight run may take
    the fast path there — identical values up to f32 drift, so compare
    with drift tolerance."""
    from libfm_tpu.data.synth import ctr_like
    from libfm_tpu.learners.mcmc_vector import MCMCVectorLearner
    from libfm_tpu.tasks import TASK_CLASSIFICATION

    train, test, groups = ctr_like(
        num_fields=3, field_cardinality=40, num_examples=2500, seed=7
    )
    cfg = FMConfig(num_features=train.num_features, num_factors=3)
    p = str(tmp_path / "cls.npz")

    full = MCMCVectorLearner(
        cfg, task=TASK_CLASSIFICATION, num_iter=8, seed=5, verbose=False,
        attr_group=groups, refresh_every=4,
    )
    full.learn(train, test)

    a = MCMCVectorLearner(
        cfg, task=TASK_CLASSIFICATION, num_iter=4, seed=5, verbose=False,
        attr_group=groups, refresh_every=4,
        checkpoint_path=p, checkpoint_every=4,
    )
    a.learn(train, test)
    b = MCMCVectorLearner(
        cfg, task=TASK_CLASSIFICATION, num_iter=8, seed=5, verbose=False,
        attr_group=groups, refresh_every=4,
        checkpoint_path=p, checkpoint_every=4,
    )
    b.learn(train, test)
    assert [h["iter"] for h in b.history] == list(range(4, 8))
    got = [h["test_this"] for h in b.history]
    want = [h["test_this"] for h in full.history[4:]]
    assert np.allclose(got, want, atol=5e-3), (got, want)
