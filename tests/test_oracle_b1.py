"""B=1 trajectory oracles (VERDICT round-2 item #7).

Step-for-step numpy (float64) restatements of the reference's SGD kernel
(/root/reference/src/fm_core/fm_sgd.h:33-51 with fm_model::predict,
fm_model.h:105-127) and SGDA steps
(/root/reference/src/libfm/src/fm_learn_sgd_element_adapt_reg.h:136-248),
asserted equal to our batched engines at batch_size=1 over ~100 rows —
proving the mini-batch machinery reduces to the reference's sequential
per-row algorithm exactly (not just statistically)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from libfm_tpu.data.dataset import Dataset
from libfm_tpu.models.fm import FMConfig
from libfm_tpu.tasks import TASK_REGRESSION


@pytest.fixture
def x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def _rows(num_rows, num_features, seed, max_len=4):
    rng = np.random.default_rng(seed)
    lens = rng.integers(1, max_len + 1, num_rows)
    cols = [
        np.sort(rng.choice(num_features, l, replace=False)) for l in lens
    ]
    vals = [rng.standard_normal(l) for l in lens]
    beta = rng.standard_normal(num_features) * 0.5
    y = np.array(
        [float((v * beta[c]).sum()) + 2.0 for c, v in zip(cols, vals)]
    )
    return cols, vals, y


def _dataset(cols, vals, y, num_features):
    indptr = np.concatenate(
        [[0], np.cumsum([len(c) for c in cols])]
    ).astype(np.int64)
    return Dataset(
        indptr,
        np.concatenate(cols).astype(np.int32),
        np.concatenate(vals).astype(np.float32),
        np.asarray(y, np.float32),
        num_features,
    )


def np_predict(w0, w, V, ids, xv):
    """fm_model::predict (fm_model.h:105-127): returns (p, sum[k])."""
    d = V[ids] * xv[:, None]  # [L, k]
    s = d.sum(axis=0)
    return w0 + (w[ids] * xv).sum() + 0.5 * ((s * s).sum() - (d * d).sum()), s


def test_sgd_b1_matches_numpy_oracle(x64):
    """SGDLearner at batch_size=1 == the reference's sequential per-row
    fm_SGD trajectory, parameter-for-parameter in f64."""
    from libfm_tpu.learners.sgd import SGDLearner

    n, k, rows = 30, 4, 100
    cols, vals, y = _rows(rows, n, seed=3)
    train = _dataset(cols, vals, y, n)
    # f32 targets round; use what the engine will see
    y = np.asarray(train.target, np.float64)
    cfg = FMConfig(
        num_features=n, num_factors=k, reg0=0.1, regw=0.05, regv=0.01,
        dtype=jnp.float64,
    )
    lr = 0.01
    learner = SGDLearner(
        cfg, num_iter=2, learn_rate=lr, batch_size=1, seed=1, verbose=False
    )
    learner.init_params()
    w0 = float(learner.params.w0)
    w = np.asarray(learner.params.w, np.float64).copy()
    V = np.asarray(learner.params.v, np.float64).copy()
    min_t, max_t = float(train.min_target), float(train.max_target)

    # oracle: 2 epochs of sequential rows (the reference does not
    # shuffle, fm_learn_sgd_element.h:51)
    for _ in range(2):
        for ci, vi, yi in zip(cols, vals, y):
            ci = np.asarray(ci)
            vi = np.asarray(np.asarray(vi, np.float32), np.float64)
            p, s = np_predict(w0, w, V, ci, vi)
            mult = min(max(p, min_t), max_t) - yi
            # fm_SGD (fm_sgd.h:36-50)
            w0 -= lr * (mult + cfg.reg0 * w0)
            w[ci] -= lr * (mult * vi + cfg.regw * w[ci])
            grad = s[None, :] * vi[:, None] - V[ci] * (vi * vi)[:, None]
            V[ci] -= lr * (mult * grad + cfg.regv * V[ci])

    learner.learn(train, train)
    # tolerance: the engine's vectorised f64 sums round differently from
    # the oracle's loop order (~1e-16/op, amplified to ~1e-8 over 200
    # sequential updates); a formula mismatch diverges at the 1e-2 level
    np.testing.assert_allclose(float(learner.params.w0), w0, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(learner.params.w), w, rtol=1e-6, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(learner.params.v), V, rtol=1e-6, atol=1e-9
    )


def test_sgda_b1_matches_numpy_oracle(x64):
    """SGDALearner at batch_size=1 == the reference's interleaved
    theta/lambda steps (adapt_reg.h:136-248, round-robin validation,
    lambda skipped in iteration 0, :294-311) in f64."""
    from libfm_tpu.learners.sgda import SGDALearner

    n, k, rows, vrows = 24, 3, 60, 20
    cols, vals, y = _rows(rows, n, seed=5)
    vc, vv, vy = _rows(vrows, n, seed=6)
    train = _dataset(cols, vals, y, n)
    val = _dataset(vc, vv, vy, n)
    y = np.asarray(train.target, np.float64)
    vy = np.asarray(val.target, np.float64)
    attr_group = (np.arange(n) % 2).astype(np.int32)  # 2 groups
    G = 2
    cfg = FMConfig(num_features=n, num_factors=k, dtype=jnp.float64)
    lr = 0.01
    learner = SGDALearner(
        cfg, attr_group=attr_group, num_iter=3, learn_rate=lr,
        batch_size=1, seed=2, verbose=False,
    )
    learner.init_params()
    w0 = float(learner.params.w0)
    V = np.asarray(learner.params.v, np.float64).copy()
    w = np.zeros(n)  # reference resets w at learn() start (:282-289)
    reg_w = np.zeros(G)
    reg_v = np.zeros((G, k))
    grad_w = np.zeros(n)
    grad_v = np.zeros((n, k))
    min_t, max_t = float(train.min_target), float(train.max_target)

    def theta_step(ci, vi, yi):
        nonlocal w0
        ci = np.asarray(ci)
        vi = np.asarray(np.asarray(vi, np.float32), np.float64)
        p, s = np_predict(w0, w, V, ci, vi)
        mult = 2.0 * (min(max(p, min_t), max_t) - yi)
        g = attr_group[ci]
        w0 -= lr * mult  # reg_0 = 0
        grad_w[ci] = mult * vi
        w[ci] -= lr * (grad_w[ci] + 2.0 * reg_w[g] * w[ci])
        grad_v[ci] = mult * (
            vi[:, None] * (s[None, :] - V[ci] * vi[:, None])
        )
        V[ci] -= lr * (grad_v[ci] + 2.0 * reg_v[g] * V[ci])

    def lambda_step(ci, vi, yi):
        ci = np.asarray(ci)
        vi = np.asarray(np.asarray(vi, np.float32), np.float64)
        g = attr_group[ci]
        w_dash = w[ci] - lr * (grad_w[ci] + 2.0 * reg_w[g] * w[ci])
        v_dash = V[ci] - lr * (grad_v[ci] + 2.0 * reg_v[g] * V[ci])
        d = v_dash * vi[:, None]
        p = (
            w0 + (w_dash * vi).sum()
            + 0.5 * ((d.sum(0) ** 2).sum() - (d * d).sum())
        )
        grad_loss = 2.0 * (min(max(p, min_t), max_t) - yi)
        # w lambdas (:212-223)
        lam_w = np.zeros(G)
        np.add.at(lam_w, g, vi * w[ci])
        reg_w[:] = np.maximum(reg_w - lr * grad_loss * (-2.0 * lr * lam_w), 0.0)
        # v lambdas (:224-247)
        sum_f_dash = d.sum(axis=0)  # [k]
        sum_f = np.zeros((G, k))
        sum_fdf = np.zeros((G, k))
        xv = V[ci] * vi[:, None]
        np.add.at(sum_f, g, xv)
        np.add.at(sum_fdf, g, d * xv)
        lam_v = -2.0 * lr * (sum_f_dash[None, :] * sum_f - sum_fdf)
        reg_v[:] = np.maximum(reg_v - lr * grad_loss * lam_v, 0.0)

    for it in range(3):
        for i in range(rows):
            theta_step(cols[i], vals[i], y[i])
            if it > 0:
                j = i % vrows
                lambda_step(vc[j], vv[j], vy[j])

    learner.learn(train, train, validation=val)
    # same order-of-summation tolerance rationale as the SGD oracle
    np.testing.assert_allclose(float(learner.params.w0), w0, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(learner.params.w), w, rtol=1e-6, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(learner.params.v), V, rtol=1e-6, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(learner.reg_w), reg_w, rtol=1e-6, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(learner.reg_v), reg_v, rtol=1e-6, atol=1e-9
    )
