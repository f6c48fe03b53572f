"""Shared learner machinery: metrics and target handling.

Metric formulas reproduce the reference exactly:
- regression RMSE/MAE with the prediction clamped to the observed target
  range (/root/reference/src/libfm/src/fm_learn.h:132-153);
- classification accuracy by sign agreement of the raw score
  (/root/reference/src/libfm/src/fm_learn.h:113-130);
- MCMC probability metrics: accuracy at p>=0.5 and negative mean
  log10-likelihood with p clipped to [0.01, 0.99]
  (/root/reference/src/libfm/src/fm_learn_mcmc_simultaneous.h:291-309).
"""

from __future__ import annotations

import jax.numpy as jnp

from libfm_tpu.tasks import TASK_CLASSIFICATION, TASK_REGRESSION


def clamp(pred, min_target, max_target):
    return jnp.clip(pred, min_target, max_target)


def rmse_mae(pred, target, min_target, max_target, mask=None):
    """Clamped RMSE and MAE. pred is the raw model score."""
    p = clamp(pred, min_target, max_target)
    err = p - target
    if mask is None:
        n = pred.shape[0] if pred.ndim else 1
        return jnp.sqrt(jnp.mean(err * err)), jnp.mean(jnp.abs(err))
    m = mask.astype(pred.dtype)
    n = jnp.maximum(m.sum(), 1.0)
    return (
        jnp.sqrt((err * err * m).sum() / n),
        (jnp.abs(err) * m).sum() / n,
    )


def sign_accuracy(score, target, mask=None):
    """Fraction of cases where sign(score) matches sign(target); score>=0
    counts as positive (/root/reference/src/libfm/src/fm_learn.h:117)."""
    correct = ((score >= 0) & (target >= 0)) | ((score < 0) & (target < 0))
    if mask is None:
        return correct.mean()
    m = mask.astype(score.dtype)
    return (correct.astype(score.dtype) * m).sum() / jnp.maximum(m.sum(), 1.0)


def prob_accuracy(p, target, mask=None):
    """MCMC-style accuracy: p>=0.5 counts as a positive prediction
    (/root/reference/src/libfm/src/fm_learn_mcmc_simultaneous.h:297)."""
    correct = ((p >= 0.5) & (target > 0.0)) | ((p < 0.5) & (target < 0.0))
    if mask is None:
        return correct.mean()
    m = mask.astype(p.dtype)
    return (correct.astype(p.dtype) * m).sum() / jnp.maximum(m.sum(), 1.0)


def neg_log10_likelihood(p, target, mask=None):
    """-mean[ m*log10(p) + (1-m)*log10(1-p) ], m = (target+1)/2, with p
    clipped to [0.01, 0.99]
    (/root/reference/src/libfm/src/fm_learn_mcmc_simultaneous.h:300-304)."""
    m01 = (target + 1.0) * 0.5
    pc = jnp.clip(p, 0.01, 0.99)
    ll = m01 * jnp.log10(pc) + (1.0 - m01) * jnp.log10(1.0 - pc)
    if mask is None:
        return -ll.mean()
    mm = mask.astype(p.dtype)
    return -(ll * mm).sum() / jnp.maximum(mm.sum(), 1.0)


def required_features(ds) -> int:
    """Highest feature count `ds` addresses, including relational blocks
    in the joined attribute space (attr_offset + block features,
    /root/reference/src/libfm/libfm.cpp:199-243)."""
    n = int(ds.num_features)
    for join in getattr(ds, "relations", None) or ():
        rd = join.data
        n = max(n, int(rd.attr_offset) + int(rd.num_features))
    return n


def check_num_features(cfg, *datasets) -> None:
    """Fail fast with a clear message when the model's parameter table is
    smaller than the data's feature space (otherwise the layout build
    dies with a bare IndexError, or device gathers would clamp ids)."""
    need = max(required_features(d) for d in datasets if d is not None)
    if cfg.num_features < need:
        raise ValueError(
            f"FMConfig.num_features={cfg.num_features} but the data "
            f"addresses {need} features (joined attribute space); size "
            "the model to the max feature count over train/test/validation "
            "(the CLI does this automatically, libfm.cpp:199-243)"
        )


def link_prediction(score, task: int, min_target, max_target):
    """Final-prediction link: clamp for regression, sigmoid for
    classification (/root/reference/src/libfm/src/fm_learn_sgd.h:76-90)."""
    if task == TASK_REGRESSION:
        return jnp.clip(score, min_target, max_target)
    if task == TASK_CLASSIFICATION:
        return 1.0 / (1.0 + jnp.exp(-score))
    raise ValueError(f"unknown task {task}")
