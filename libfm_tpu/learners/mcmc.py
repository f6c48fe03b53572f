"""ALS / MCMC (Gibbs) learner — the centerpiece engine.

TPU-native restatement of the reference MCMC/ALS engine
(/root/reference/src/libfm/src/fm_learn_mcmc.h:61-1210 and
fm_learn_mcmc_simultaneous.h:46-317).

Reference algorithm: per-coordinate conjugate Gaussian draws for w0, every
w_j, and every v_jf, with per-case error/linear caches (e, q) updated
incrementally after *each* coordinate — a serial chain over features
(fm_learn_mcmc.h:726-731, 839-846). That chain is the antithesis of a TPU
program, so this engine restructures the sweep:

  * Features are partitioned into **conflict-free blocks** (no training row
    contains two features of a block — data/batching.py). Coordinates
    inside a block are conditionally independent given the caches, so
    drawing them in parallel from a cache snapshot and applying the e/q
    deltas with one scatter is *exactly* a sequential Gibbs scan in block
    order. For field-structured data (one-hot recommender / CTR data) the
    blocks are the fields and the scan is exact Gibbs with a handful of
    block steps per factor.
  * Each block step is a gather + two segment-sums + a scatter over that
    block's nnz — all static shapes, fully vectorised.
  * Hyperprior draws (alpha, per-group mu/lambda) are segment-sums over the
    attribute->group map (fm_learn_mcmc.h:911-1097).
  * The per-iteration batch re-prediction that refreshes the caches
    (predict_data_and_write_to_eterms, fm_learn_mcmc.h:148-378) is a flat
    CSR segment-sum over train+test.
  * Sampling uses counter-based threefry keys; gamma and truncated-normal
    draws come from jax.random (ops/samplers.py).

The whole Gibbs iteration (draw_all + re-prediction + accumulator update)
is one jitted function: factors are a lax.scan, blocks are unrolled
(their shapes differ), and no host round-trip happens inside an iteration.

ALS is MCMC with do_sample=False, do_multilevel=False — posterior means
instead of draws (/root/reference/src/libfm/libfm.cpp:135-139); the
classification task uses probit data augmentation with truncated-normal
latent targets (fm_learn_mcmc_simultaneous.h:151-196).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from libfm_tpu.data.batching import conflict_free_blocks
from libfm_tpu.data.dataset import Dataset
from libfm_tpu.models.fm import FMConfig, FMParams
from libfm_tpu.ops import samplers
from libfm_tpu.ops.segment import seg_sum
from libfm_tpu.tasks import TASK_REGRESSION
from libfm_tpu.utils.timers import iter_clocks


# --------------------------------------------------------------------------
# Device-side containers
# --------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
@dataclass
class BlockArrays:
    """One conflict-free feature block, device-resident."""

    features: jax.Array  # int32 [F]
    groups: jax.Array  # int32 [F] group of each feature
    entry_rows: jax.Array  # int32 [E]
    entry_vals: jax.Array  # f [E]
    entry_feat: jax.Array  # int32 [E] in 0..F-1
    exact: bool = True  # True iff entry_rows has no duplicates

    def tree_flatten(self):
        return (
            self.features,
            self.groups,
            self.entry_rows,
            self.entry_vals,
            self.entry_feat,
        ), self.exact

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, exact=aux)

    @property
    def num_features(self):
        return self.features.shape[0]


@jax.tree_util.register_pytree_node_class
@dataclass
class StackedBlocks:
    """Many conflict-free blocks padded to common shapes and stacked on a
    leading axis, drawn sequentially under one lax.scan — EXACT Gibbs
    order at O(1) compiled-program size (replaces the round-1 merge
    fallback, whose conflicted parallel updates could diverge).

    Padding uses unique OUT-OF-BOUNDS ids: gathers clamp (and contribute
    zero through zero entry values) while scatters drop them (JAX's
    default out-of-bounds semantics), so padded slots change nothing and
    the unique-indices scatter promise still holds."""

    features: jax.Array  # int32 [B, Fp]
    groups: jax.Array  # int32 [B, Fp]
    entry_rows: jax.Array  # int32 [B, Ep]
    entry_vals: jax.Array  # f [B, Ep]
    entry_feat: jax.Array  # int32 [B, Ep]

    def tree_flatten(self):
        return (
            self.features, self.groups, self.entry_rows, self.entry_vals,
            self.entry_feat,
        ), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def num_blocks(self):
        return self.features.shape[0]


def _stack_blocks(blocks, attr_group, n_features: int, n_rows: int, dtype):
    """Host-side builder for StackedBlocks (see its docstring)."""
    B = len(blocks)
    Fp = max(len(b.features) for b in blocks)
    Ep = max(len(b.entry_rows) for b in blocks)
    feats = np.tile(
        n_features + np.arange(Fp, dtype=np.int64), (B, 1)
    ).astype(np.int32)
    groups = np.zeros((B, Fp), np.int32)
    erows = np.tile(
        n_rows + np.arange(Ep, dtype=np.int64), (B, 1)
    ).astype(np.int32)
    evals = np.zeros((B, Ep), np.float32)
    efeat = np.zeros((B, Ep), np.int32)
    for i, b in enumerate(blocks):
        nf, ne = len(b.features), len(b.entry_rows)
        feats[i, :nf] = b.features
        groups[i, :nf] = attr_group[b.features]
        erows[i, :ne] = b.entry_rows
        evals[i, :ne] = b.entry_vals
        efeat[i, :ne] = b.entry_feat
        # pad entry_feat with the MAX real id, not 0: the block draws'
        # seg_sums pass indices_are_sorted, so the padded tail must stay
        # monotone (padded entries contribute zeros either way)
        efeat[i, ne:] = max(nf - 1, 0)
    return StackedBlocks(
        features=jnp.asarray(feats),
        groups=jnp.asarray(groups),
        entry_rows=jnp.asarray(erows),
        entry_vals=jnp.asarray(evals, dtype=dtype),
        entry_feat=jnp.asarray(efeat),
    )


@jax.tree_util.register_pytree_node_class
@dataclass
class MCMCState:
    """All mutable sampler state (a pytree threaded through jit)."""

    w0: jax.Array
    w: jax.Array  # [n]
    vt: jax.Array  # [k, n] — factor-major for contiguous per-factor slices
    alpha: jax.Array
    w_mu: jax.Array  # [G]
    w_lambda: jax.Array  # [G]
    v_mu: jax.Array  # [G, k]
    v_lambda: jax.Array  # [G, k]
    e: jax.Array  # [nc_train] residual cache: prediction - (latent) target
    pred_this: jax.Array  # [nc_test]
    pred_sum_all: jax.Array  # [nc_test]
    pred_sum_all_but5: jax.Array  # [nc_test]
    key: jax.Array
    rejected: jax.Array  # scalar int: NaN/Inf draws rejected this iter

    def tree_flatten(self):
        return (
            self.w0,
            self.w,
            self.vt,
            self.alpha,
            self.w_mu,
            self.w_lambda,
            self.v_mu,
            self.v_lambda,
            self.e,
            self.pred_this,
            self.pred_sum_all,
            self.pred_sum_all_but5,
            self.key,
            self.rejected,
        ), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


# --------------------------------------------------------------------------
# Batch prediction over flat CSR (predict_data_and_write_to_eterms analog)
# --------------------------------------------------------------------------


def csr_predict(w0, w, vt, rows, cols, vals, num_rows: int, use_bias, use_linear):
    """Raw FM scores for all cases of one dataset via segment-sums.

    Equivalent to the transpose sweeps of fm_learn_mcmc.h:148-378 but
    expressed case-major: s_f = seg_sum(v_f[col]*x), then the pairwise
    trick per case.
    """
    vx = vt.T[cols] * vals[:, None]  # [nnz, k]
    s = seg_sum(vx, rows, num_rows)  # [nc, k]
    s2 = seg_sum(vx * vx, rows, num_rows)
    pred = 0.5 * ((s * s) - s2).sum(axis=1)
    if use_linear:
        pred = pred + seg_sum(w[cols] * vals, rows, num_rows)
    if use_bias:
        pred = pred + w0
    return pred


# --------------------------------------------------------------------------
# Conjugate block draws
# --------------------------------------------------------------------------


def _posterior_gaussian(num_acc, den_acc, theta, lam, mu, alpha, do_sample, key,
                        bound=None):
    """Shared conjugate-posterior formula for w and v coordinates.

    Reference draw_w / draw_v (/root/reference/src/libfm/src/
    fm_learn_mcmc.h:685-732, 792-847):
        sigma^2 = 1 / (lambda + alpha * den_acc)
        mean    = -sigma^2 * (alpha * (num_acc - theta*den_acc) - mu*lambda)
    with the NaN/Inf guards: non-finite sigma^2 -> theta := 0; non-finite
    draw -> keep old. Returns (new_theta, num_rejected).
    """
    sigma_sqr = 1.0 / (lam + alpha * den_acc)
    mean = -sigma_sqr * (alpha * (num_acc - theta * den_acc) - mu * lam)
    if do_sample:
        proposal = samplers.gaussian(key, mean, jnp.sqrt(sigma_sqr))
    else:
        proposal = mean
    proposal = jnp.where(jnp.isfinite(sigma_sqr), proposal, 0.0)
    new, n_rej = samplers.finite_or(proposal, theta, bound=bound)
    return new, n_rej


def draw_w_block(w, e, blk: BlockArrays, w_mu, w_lambda, alpha, do_sample, key,
                 bound=None):
    """Draw all w coordinates of one conflict-free block in parallel.

    Per coordinate j: num_acc = sum_i x_ij * e_i, den_acc = sum_i x_ij^2
    (fm_learn_mcmc.h:685-695), then e_i -= x_ij*(w_old - w_new) — rows are
    touched by at most one feature of the block, so the scatter is exact.
    """
    F = blk.num_features
    x = blk.entry_vals
    e_g = e[blk.entry_rows]
    num_acc = seg_sum(x * e_g, blk.entry_feat, F)
    den_acc = seg_sum(x * x, blk.entry_feat, F)
    w_old = w[blk.features]
    lam = w_lambda[blk.groups]
    mu = w_mu[blk.groups]
    w_new, n_rej = _posterior_gaussian(
        num_acc, den_acc, w_old, lam, mu, alpha, do_sample, key, bound=bound
    )
    delta = w_new - w_old  # [F]
    e = e.at[blk.entry_rows].add(
        x * delta[blk.entry_feat], unique_indices=blk.exact
    )
    w = w.at[blk.features].set(w_new, unique_indices=True)
    return w, e, n_rej


def draw_v_block(v_f, e, q, blk: BlockArrays, v_mu_f, v_lambda_f, alpha, do_sample, key,
                 bound=None):
    """Draw all v_{.,f} coordinates of one block in parallel.

    Per coordinate: h_i = x_ij*(q_i - x_ij*v), num_acc = sum h_i e_i,
    den_acc = sum h_i^2 (fm_learn_mcmc.h:792-807); cache updates
    q_i += x_ij*delta, e_i += h_i*delta (lines 839-846).
    """
    F = blk.num_features
    x = blk.entry_vals
    rows = blk.entry_rows
    v_old = v_f[blk.features]
    h = x * (q[rows] - x * v_old[blk.entry_feat])
    num_acc = seg_sum(h * e[rows], blk.entry_feat, F)
    den_acc = seg_sum(h * h, blk.entry_feat, F)
    lam = v_lambda_f[blk.groups]
    mu = v_mu_f[blk.groups]
    v_new, n_rej = _posterior_gaussian(
        num_acc, den_acc, v_old, lam, mu, alpha, do_sample, key, bound=bound
    )
    delta = v_new - v_old
    d_entry = delta[blk.entry_feat]
    q = q.at[rows].add(x * d_entry, unique_indices=blk.exact)
    e = e.at[rows].add(h * d_entry, unique_indices=blk.exact)
    v_f = v_f.at[blk.features].set(v_new, unique_indices=True)
    return v_f, e, q, n_rej


def draw_unobserved(theta, idx, lam, mu, do_sample, key, bound=None):
    """Features absent from training data: posterior == prior
    (empty feature_data in fm_learn_mcmc.h:467-476 -> sigma^2 = 1/lambda,
    mean = mu). Returns (theta, num_rejected)."""
    sigma_sqr = 1.0 / lam
    if do_sample:
        proposal = samplers.gaussian(key, mu, jnp.sqrt(sigma_sqr))
    else:
        proposal = mu + jnp.zeros_like(lam)
    proposal = jnp.where(jnp.isfinite(sigma_sqr), proposal, 0.0)
    new, n_rej = samplers.finite_or(proposal, theta[idx], bound=bound)
    return theta.at[idx].set(new, unique_indices=True), n_rej


# --------------------------------------------------------------------------
# Hyperprior draws
# --------------------------------------------------------------------------


def draw_alpha(key, e, num_cases, alpha, alpha_0, gamma_0, do_multilevel, do_sample):
    """fm_learn_mcmc.h:911-939. (ALS keeps alpha = alpha_0.)

    Beyond the reference's NaN/Inf rejection, the proposal must be
    strictly positive: in f32 a diverging chain can overflow
    sum(e^2) to +inf, making the gamma draw exactly 0.0 — a *finite*
    but invalid precision that silently kills every later data term
    (the reference never hits this: its e and the sum are f64,
    fm_learn_mcmc.h:916-918). Rejecting alpha<=0 (keep the old value,
    count it) preserves the reference's keep-old recovery semantics
    under the f32 failure mode."""
    if not do_multilevel:
        return jnp.asarray(alpha_0, dtype=e.dtype), jnp.zeros((), jnp.int32)
    alpha_n = alpha_0 + num_cases
    # clamp each e^2 (and the total) so a runaway residual yields a TINY
    # positive alpha instead of an infinite gamma_n: with alpha ~ n/sum,
    # the next sweep's posteriors collapse to the priors and the chain
    # reverts to prior scale — self-healing, where inf would be terminal
    e2 = e * e
    e2 = jnp.where(jnp.isfinite(e2), jnp.minimum(e2, 1e30), 1e30)
    gamma_n = jnp.minimum(gamma_0 + jnp.sum(e2), 1e37)
    proposal = samplers.gamma(key, alpha_n / 2.0, gamma_n / 2.0)
    ok = jnp.isfinite(proposal) & (proposal > 0.0)
    return jnp.where(ok, proposal, alpha), jnp.sum(~ok).astype(jnp.int32)


def draw_alpha_from_sum(key, sum_e2, num_cases, alpha, alpha_0, gamma_0,
                        do_multilevel, do_sample):
    """draw_alpha when only sum(e^2) is available as a scalar (the BS
    deferred path computes it in closed form from block-level caches —
    mcmc_rel_vector.py). Identical formula; the f32 runaway clamp
    applies at the sum level instead of per element (only reachable
    mid-divergence, same keep-old recovery either way)."""
    if not do_multilevel:
        return (
            jnp.asarray(alpha_0, dtype=sum_e2.dtype),
            jnp.zeros((), jnp.int32),
        )
    alpha_n = alpha_0 + num_cases
    s = jnp.where(jnp.isfinite(sum_e2), jnp.minimum(sum_e2, 1e37), 1e37)
    gamma_n = jnp.minimum(gamma_0 + s, 1e37)
    proposal = samplers.gamma(key, alpha_n / 2.0, gamma_n / 2.0)
    ok = jnp.isfinite(proposal) & (proposal > 0.0)
    return jnp.where(ok, proposal, alpha), jnp.sum(~ok).astype(jnp.int32)


def draw_theta_hyperpriors(
    key,
    theta,  # [n] (w) or [n] per-factor column handled by caller as [G]-sums
    attr_group,
    num_attr_per_group,
    mu_cur,
    lambda_cur,
    alpha_0,
    gamma_0,
    beta_0,
    mu_0,
    do_sample,
    valid=None,  # optional [n] 0/1 mask: rows excluded from the stats
):
    """Draw (lambda, mu) for one parameter vector, per group.

    Order matters and matches draw_all (fm_learn_mcmc.h:444-445): lambda
    is drawn first using the *current* mu, then mu using the new lambda.
    Formulas: draw_w_lambda (:980-1017) and draw_w_mu (:941-978).
    `valid` masks out mesh-padding parameter rows (TP feature padding)
    so the group statistics equal the unpadded ones exactly.
    """
    G = num_attr_per_group.shape[0]
    k_lam, k_mu = jax.random.split(key)
    theta_s = theta if valid is None else theta * valid
    sum_theta = seg_sum(theta_s, attr_group, G, sorted_ids=False)
    # lambda
    dev = theta - mu_cur[attr_group]
    if valid is not None:
        dev = dev * valid
    lambda_gamma = (
        beta_0 * (mu_cur - mu_0) ** 2 + gamma_0
        + seg_sum(dev * dev, attr_group, G, sorted_ids=False)
    )
    lambda_alpha = alpha_0 + num_attr_per_group + 1.0
    if do_sample:
        lam_prop = samplers.gamma(k_lam, lambda_alpha / 2.0, lambda_gamma / 2.0)
    else:
        lam_prop = lambda_alpha / lambda_gamma
    lam_new, rej1 = samplers.finite_or(lam_prop, lambda_cur)
    # mu (uses the new lambda)
    mu_mean = (sum_theta + beta_0 * mu_0) / (num_attr_per_group + beta_0)
    mu_sigma_sqr = 1.0 / ((num_attr_per_group + beta_0) * lam_new)
    if do_sample:
        mu_prop = samplers.gaussian(k_mu, mu_mean, jnp.sqrt(mu_sigma_sqr))
    else:
        mu_prop = mu_mean
    mu_new, rej2 = samplers.finite_or(mu_prop, mu_cur)
    return lam_new, mu_new, rej1 + rej2


def _coo_device_from_stream(stream, dtype):
    """Device COO (rows, cols, vals) uploaded window-by-window from a
    StreamingDataset's binary .x — host memory holds ONE entry-budgeted
    window at a time; the concatenation happens device-side. The
    reference's analog reads the same rows through the bounded HD cache
    (/root/reference/src/util/fmatrix.h:244-269)."""
    from libfm_tpu.data.streaming import stream_sparse_binary

    pr, pc, pv = [], [], []
    for row_start, indptr, cols, vals, _, _ in stream_sparse_binary(
        stream.x_path, stream.entry_budget
    ):
        lens = np.diff(indptr).astype(np.int64)
        rows = np.repeat(
            np.arange(row_start, row_start + len(lens), dtype=np.int64),
            lens,
        )
        pr.append(jnp.asarray(rows.astype(np.int32)))
        pc.append(jnp.asarray(cols.astype(np.int32)))
        pv.append(jnp.asarray(vals, dtype=dtype))
    if not pr:
        return (
            jnp.zeros((0,), jnp.int32),
            jnp.zeros((0,), jnp.int32),
            jnp.zeros((0,), dtype),
        )
    return jnp.concatenate(pr), jnp.concatenate(pc), jnp.concatenate(pv)


def dispatch_chunks(start, num_iter, refresh_every, ckpt_every=0):
    """Split iterations [start, num_iter) into dispatch chunks whose
    LAST iteration is a refresh point under the engine cadence
    (refresh iff R==1, it==start, it % R == R-1, or it==num_iter-1 —
    the same rule the per-iteration loops used, so trajectories are
    unchanged). One chunk = ONE jit dispatch: a lax.scan over the fast
    steps followed by the refresh step. Rationale: on this
    environment's tunneled TPU a single jit dispatch costs ~28 ms of
    host round-trip REGARDLESS of async dispatch (measured:
    studies/results/asyncdisp_r5.json — fire-and-forget and lag-2
    pipelining both stay at ~28 ms/call; only batching steps into one
    dispatch amortizes it). Checkpoint boundaries also close chunks so
    saves always see host-materialisable state at the cadence the
    per-iteration loop honoured ((it+1) % ckpt_every == 0)."""
    R = max(1, int(refresh_every))
    chunks = []
    i0 = start
    for it in range(start, num_iter):
        if (
            R == 1
            or it == start
            or it % R == R - 1
            or it == num_iter - 1
            or (ckpt_every and (it + 1) % ckpt_every == 0)
        ):
            chunks.append((i0, it - i0 + 1))
            i0 = it + 1
    return chunks


# --------------------------------------------------------------------------
# The learner
# --------------------------------------------------------------------------


class MCMCLearner:
    """MCMC Gibbs / ALS learner.

    do_sample=True, do_multilevel=True  -> MCMC (reference default)
    do_sample=False, do_multilevel=False -> ALS
    (/root/reference/src/libfm/libfm.cpp:135-139, 289-290)
    """

    def __init__(
        self,
        cfg: FMConfig,
        task: int = TASK_REGRESSION,
        num_iter: int = 100,
        do_sample: bool = True,
        do_multilevel: bool = True,
        num_eval_cases: int | None = None,
        seed: int = 1,
        rlog=None,
        verbose: bool = True,
        attr_group: np.ndarray | None = None,
        max_blocks: int = 128,
        dtype=None,
        checkpoint_path: str | None = None,
        checkpoint_every: int = 0,
    ):
        self.cfg = cfg
        self.task = task
        self.num_iter = num_iter
        self.do_sample = do_sample
        self.do_multilevel = do_multilevel
        self.num_eval_cases = num_eval_cases
        self.seed = seed
        self.rlog = rlog
        self.verbose = verbose
        self.max_blocks = max_blocks
        self.dtype = dtype or cfg.dtype
        # hyperprior constants (fm_learn_mcmc.h:1107-1114)
        self.alpha_0 = 1.0
        self.gamma_0 = 1.0
        self.beta_0 = 1.0
        self.mu_0 = 0.0
        self.w0_mean_0 = 0.0
        self.min_target = 0.0
        self.max_target = 0.0
        if attr_group is not None:
            attr_group = np.asarray(attr_group, dtype=np.int32)
        self.attr_group_np = attr_group
        # per-group regularization seeds (w_lambda/v_lambda init):
        # libfm.cpp:326-365 — set via set_regularization().
        self._init_w_lambda = cfg.regw
        self._init_v_lambda = cfg.regv
        # w0 prior precision; set_regularization overrides it (the
        # reference sets fm.reg0 = reg[0] in EVERY arity case,
        # libfm.cpp:332-357, including the per-group one the CLI cannot
        # express through FMConfig)
        self.reg0 = cfg.reg0
        self._w_lambda_vec = None
        self._v_lambda_vec = None
        self.history: list = []
        self.checkpoint_path = checkpoint_path
        self.checkpoint_every = checkpoint_every
        # -load_model warm start (ALS only in the CLI): the reference
        # loads w0/w/V and then re-randomises w for the mcmc family
        # (libfm.cpp:262-268 then :283 fm.w.init_normal), so only the
        # loaded w0 and V take effect
        self.warm_start = None  # FMParams | None

    # -------------------------------------------------------------- setup
    def set_regularization(self, reg: list[float], num_groups: int):
        """Apply the reference's reg-arity rules: 0 / 1 / 3 /
        (1 + 2*num_groups) values (/root/reference/src/libfm/libfm.cpp:
        326-365)."""
        k = self.cfg.num_factors
        # every arity resets the per-group vectors (engines consult them
        # first when not None); the per-group branch re-assigns them
        self._w_lambda_vec = None
        self._v_lambda_vec = None
        if len(reg) == 0:
            self._init_w_lambda, self._init_v_lambda = 0.0, 0.0
            self.reg0 = 0.0
        elif len(reg) == 1:
            self._init_w_lambda, self._init_v_lambda = reg[0], reg[0]
            self.reg0 = reg[0]
        elif len(reg) == 3:
            self._init_w_lambda, self._init_v_lambda = reg[1], reg[2]
            self.reg0 = reg[0]
        elif len(reg) == 1 + 2 * num_groups:
            self.reg0 = reg[0]
            self._w_lambda_vec = np.asarray(reg[1 : 1 + num_groups])
            self._v_lambda_vec = np.repeat(
                np.asarray(reg[1 + num_groups :])[:, None], k, axis=1
            )
        else:
            raise ValueError(
                f"-regular expects 0, 1, 3 or {1 + 2 * num_groups} values"
            )

    def _build_layout(self, train: Dataset):
        attr_group = self.attr_group_np
        if attr_group is None:
            attr_group = np.zeros(self.cfg.num_features, dtype=np.int32)
        blocks = conflict_free_blocks(train, attr_group=attr_group)
        observed = (
            np.concatenate([b.features for b in blocks])
            if blocks
            else np.empty(0, np.int32)
        )
        mask = np.ones(self.cfg.num_features, dtype=bool)
        if len(observed):
            mask[observed] = False
        unobserved = np.nonzero(mask)[0].astype(np.int32)

        f = self.dtype
        stacked = None
        if len(blocks) > self.max_blocks:
            # Beyond max_blocks the per-block program would dominate
            # compile time; the largest blocks stay unrolled (they
            # dominate the data volume, so padding them would waste HBM)
            # and the long tail of small blocks runs as an exact
            # sequential lax.scan over a padded stack.
            order = np.argsort(
                [-len(b.entry_rows) for b in blocks], kind="stable"
            )
            blocks = [blocks[i] for i in order]
            head, tail = blocks[: self.max_blocks], blocks[self.max_blocks :]
            stacked = _stack_blocks(
                tail, attr_group, self.cfg.num_features, train.num_rows, f
            )
            blocks = head
        dev_blocks = [
            BlockArrays(
                jnp.asarray(b.features),
                jnp.asarray(attr_group[b.features]),
                jnp.asarray(b.entry_rows),
                jnp.asarray(b.entry_vals, dtype=f),
                jnp.asarray(b.entry_feat),
                exact=b.exact,
            )
            for b in blocks
        ]
        self._exact_blocks = all(b.exact for b in blocks)
        return dev_blocks, stacked, jnp.asarray(unobserved), jnp.asarray(attr_group)

    def _build_layout_stream(self, train):
        """Streamed layout build (StreamingDataset train): conflict-free
        blocks come from the transposed .xt in bounded windows — the
        reference's out-of-core data_t path
        (/root/reference/src/libfm/libfm.cpp:141-174,
        src/util/fmatrix.h:165-281) — and each block uploads to the
        device as soon as it materialises, so peak host RSS is one
        block plus one stream window. Mirrors
        mcmc_vector._build_vector_layouts' streaming branch."""
        import os

        from libfm_tpu.data.batching import FeatureBlock
        from libfm_tpu.data.streaming import (
            infer_position_groups,
            stream_feature_blocks,
            stream_feature_blocks_any,
            stream_greedy_partition,
        )

        attr_group = self.attr_group_np
        if attr_group is None:
            attr_group = np.zeros(self.cfg.num_features, dtype=np.int32)
        xt = train.x_path + "t"
        if not os.path.exists(xt):
            raise ValueError(
                f"streaming MCMC/ALS needs the transposed design matrix "
                f"at {xt} (build it with tools/transpose.py)"
            )
        if int(attr_group.max()) > 0:
            part = attr_group
        else:
            part = infer_position_groups(
                train.x_path, self.cfg.num_features, train.entry_budget
            )
        if part is not None:
            block_iter = stream_feature_blocks(
                xt, part, train.num_rows, train.entry_budget
            )
        else:
            gpart, gcounts = stream_greedy_partition(
                xt, train.num_rows, train.entry_budget
            )
            block_iter = stream_feature_blocks_any(
                xt, gpart, train.num_rows, train.entry_budget,
                entries_per_feature=gcounts,
            )
        f = self.dtype
        dev_blocks, sizes, observed_parts = [], [], []
        for b in block_iter:
            observed_parts.append(b.features.astype(np.int64))
            sizes.append(len(b.entry_rows))
            dev_blocks.append(
                BlockArrays(
                    jnp.asarray(b.features),
                    jnp.asarray(attr_group[b.features]),
                    jnp.asarray(b.entry_rows),
                    jnp.asarray(b.entry_vals, dtype=f),
                    jnp.asarray(b.entry_feat),
                    exact=b.exact,
                )
            )
        stacked = None
        if len(dev_blocks) > self.max_blocks:
            # same size-ordered head/tail split as the resident build:
            # big blocks stay unrolled, the small tail stacks under one
            # scan. Tail blocks round-trip device->host here; they are
            # the SMALL ones, so the host spike stays bounded by the
            # stack itself.
            order = np.argsort(-np.asarray(sizes), kind="stable")
            dev_blocks = [dev_blocks[i] for i in order]
            head = dev_blocks[: self.max_blocks]
            tail_host = [
                FeatureBlock(
                    features=np.asarray(tb.features),
                    entry_rows=np.asarray(tb.entry_rows),
                    entry_vals=np.asarray(tb.entry_vals, dtype=np.float32),
                    entry_feat=np.asarray(tb.entry_feat),
                    exact=tb.exact,
                )
                for tb in dev_blocks[self.max_blocks :]
            ]
            stacked = _stack_blocks(
                tail_host, attr_group, self.cfg.num_features,
                train.num_rows, f,
            )
            dev_blocks = head
        observed = (
            np.concatenate(observed_parts)
            if observed_parts
            else np.empty(0, np.int64)
        )
        mask = np.ones(self.cfg.num_features, dtype=bool)
        if len(observed):
            mask[observed] = False
        unobserved = np.nonzero(mask)[0].astype(np.int32)
        self._exact_blocks = all(b.exact for b in dev_blocks)
        return (
            dev_blocks, stacked, jnp.asarray(unobserved),
            jnp.asarray(attr_group),
        )

    # --------------------------------------------------------------- learn
    def learn(self, train: Dataset, test: Dataset):
        from libfm_tpu.data.streaming import StreamingDataset
        from libfm_tpu.learners import base

        base.check_num_features(self.cfg, train, test)
        if getattr(train, "relations", None):
            return self._learn_relational(train, test)
        cfg = self.cfg
        f = self.dtype
        n, k = cfg.num_features, cfg.num_factors
        self.min_target = train.min_target
        self.max_target = train.max_target

        if isinstance(train, StreamingDataset):
            blocks, stacked, unobserved, attr_group = (
                self._build_layout_stream(train)
            )
        else:
            blocks, stacked, unobserved, attr_group = self._build_layout(train)
        G = int(np.max(np.asarray(attr_group))) + 1
        num_attr_per_group = jnp.asarray(
            np.bincount(np.asarray(attr_group), minlength=G).astype(np.float64),
            dtype=f,
        )

        key = jax.random.PRNGKey(self.seed)
        key, kw, kv = jax.random.split(key, 3)
        # init: w ~ N(0, stdev) for MCMC (libfm.cpp:283), V ~ N(mean, stdev)
        w = cfg.init_mean + cfg.init_stdev * jax.random.normal(kw, (n,), dtype=f)
        vt = cfg.init_mean + cfg.init_stdev * jax.random.normal(
            kv, (k, n), dtype=f
        )
        w0_init = jnp.zeros((), f)
        if self.warm_start is not None:  # see __init__: only w0/V load
            vt = jnp.asarray(self.warm_start.v, dtype=f).T
            w0_init = jnp.asarray(self.warm_start.w0, dtype=f)
        w_lambda = (
            jnp.asarray(self._w_lambda_vec, dtype=f)
            if self._w_lambda_vec is not None
            else jnp.full((G,), self._init_w_lambda, dtype=f)
        )
        v_lambda = (
            jnp.asarray(self._v_lambda_vec, dtype=f)
            if self._v_lambda_vec is not None
            else jnp.full((G, k), self._init_v_lambda, dtype=f)
        )

        if isinstance(train, StreamingDataset):
            # device COO built from bounded .x windows (targets are
            # resident — 4 B/row, like the reference's DVector target)
            tr_rows, tr_cols, tr_vals = _coo_device_from_stream(train, f)
        else:
            tr_rows = jnp.asarray(train.row_of_entry)
            tr_cols = jnp.asarray(train.cols)
            tr_vals = jnp.asarray(train.vals, dtype=f)
        if isinstance(test, StreamingDataset):
            te_rows, te_cols, te_vals = _coo_device_from_stream(test, f)
        else:
            te_rows = jnp.asarray(test.row_of_entry)
            te_cols = jnp.asarray(test.cols)
            te_vals = jnp.asarray(test.vals, dtype=f)
        y_train = jnp.asarray(train.target, dtype=f)
        y_test = jnp.asarray(test.target, dtype=f)
        nc_train, nc_test = train.num_rows, test.num_rows
        nec = self.num_eval_cases if self.num_eval_cases is not None else nc_test
        eval_mask = jnp.asarray(
            (np.arange(nc_test) < nec).astype(np.float64), dtype=f
        )

        # initial prediction -> e := pred - target (both tasks init alike:
        # mcmc_simultaneous.h:70-86)
        e0 = (
            csr_predict(
                w0_init, w, vt, tr_rows, tr_cols, tr_vals, nc_train,
                cfg.use_bias, cfg.use_linear,
            )
            - y_train
        )

        state = MCMCState(
            w0=w0_init,
            w=w,
            vt=vt,
            alpha=jnp.asarray(1.0, f),
            w_mu=jnp.zeros((G,), f),
            w_lambda=w_lambda,
            v_mu=jnp.zeros((G, k), f),
            v_lambda=v_lambda,
            e=e0,
            pred_this=jnp.zeros((nc_test,), f),
            pred_sum_all=jnp.zeros((nc_test,), f),
            pred_sum_all_but5=jnp.zeros((nc_test,), f),
            key=key,
            rejected=jnp.zeros((), jnp.int32),
        )

        iteration = self._make_iteration_fn(nc_train, nc_test, len(blocks))
        # big static arrays cross the jit boundary as arguments, not
        # closure constants (constants are baked into the HLO: slow
        # compiles + duplicate HBM)
        statics = dict(
            blocks=blocks, stacked=stacked, unobserved=unobserved,
            attr_group=attr_group,
            num_attr_per_group=num_attr_per_group,
            tr_rows=tr_rows, tr_cols=tr_cols, tr_vals=tr_vals,
            te_rows=te_rows, te_cols=te_cols, te_vals=te_vals,
        )

        self.history = []
        start_iter = 0
        if self.checkpoint_path:
            state, start_iter = self._maybe_restore(state)
        for it in range(start_iter, self.num_iter):
            c0 = iter_clocks()
            state, metrics = iteration(
                state, y_train, y_test, jnp.asarray(it), eval_mask, statics
            )
            jax.block_until_ready(state.e)
            c1 = iter_clocks()
            self._log_iteration(it, metrics, tuple(b - a for a, b in zip(c0, c1)))
            if (
                self.checkpoint_path
                and self.checkpoint_every
                and (it + 1) % self.checkpoint_every == 0
            ):
                self._save_checkpoint(state, it + 1)
        self._final_state = state
        return self.history

    # ----------------------------------------------------- checkpointing
    def _ckpt_meta(self, it: int) -> dict:
        return dict(
            iter=it, seed=self.seed, num_features=self.cfg.num_features,
            num_factors=self.cfg.num_factors, task=self.task,
            do_sample=self.do_sample, do_multilevel=self.do_multilevel,
        )

    def _save_checkpoint(self, state, it: int) -> None:
        from libfm_tpu.utils import checkpoint as ckpt

        ckpt.save_state(self.checkpoint_path, state, self._ckpt_meta(it))

    def _maybe_restore(self, state):
        """Resume from self.checkpoint_path when it exists and matches.

        Covers the full sampler state (params, hyperparameters, e-cache,
        prediction accumulators, rng key) — the capability the reference
        disables -save_model for (libfm.cpp:123-133)."""
        import os

        from libfm_tpu.utils import checkpoint as ckpt

        if not os.path.exists(self.checkpoint_path):
            return state, 0
        try:
            restored, meta = ckpt.restore_state(
                self.checkpoint_path, like=state
            )
        except ValueError:
            # leaf-count/structure mismatch: a checkpoint written by a
            # different engine (scalar vs vector state trees) — warn and
            # start fresh rather than crash mid-restore
            print(
                f"WARNING: checkpoint {self.checkpoint_path} has a "
                "different state structure (other engine?); starting fresh."
            )
            return state, 0
        expect = self._ckpt_meta(int(meta.get("iter", 0)))
        if any(meta.get(k) != v for k, v in expect.items() if k != "iter"):
            print(
                f"WARNING: checkpoint {self.checkpoint_path} does not match "
                "this run's config; starting fresh."
            )
            return state, 0
        # engines share the meta echo but not the state tree (dict vs
        # dataclass, and leaf COUNTS can coincide) — verify every leaf's
        # shape against the template before trusting the restore
        leaves_r = jax.tree_util.tree_leaves(restored)
        leaves_t = jax.tree_util.tree_leaves(state)
        if any(
            np.shape(r) != tuple(np.shape(t))
            for r, t in zip(leaves_r, leaves_t)
        ):
            print(
                f"WARNING: checkpoint {self.checkpoint_path} has a "
                "different state structure (other engine?); starting fresh."
            )
            return state, 0
        it = int(meta["iter"])
        if self.verbose:
            print(f"Resuming from {self.checkpoint_path} at iteration {it}")
        restored = jax.tree_util.tree_map(jnp.asarray, restored)
        return restored, it

    def _make_iteration_fn(self, nc_train: int, nc_test: int, n_blocks: int):
        cfg = self.cfg
        f = self.dtype
        k = cfg.num_factors
        do_sample = self.do_sample
        do_multilevel = self.do_multilevel
        task = self.task
        alpha_0, gamma_0 = self.alpha_0, self.gamma_0
        beta_0, mu_0 = self.beta_0, self.mu_0
        w0_mean_0 = self.w0_mean_0
        reg0 = self.reg0
        min_t, max_t = self.min_target, self.max_target
        # f32 runaway bound for parameter draws (samplers.DRAW_BOUND),
        # scaled by the target magnitude so legitimately huge-scale
        # regression targets (e.g. timestamps) keep fitting
        draw_bound = samplers.DRAW_BOUND * max(
            1.0, abs(float(min_t)), abs(float(max_t))
        )

        def draw_all(state: MCMCState, statics):
            blocks = statics["blocks"]
            stacked = statics["stacked"]
            unobserved = statics["unobserved"]
            attr_group = statics["attr_group"]
            num_attr_per_group = statics["num_attr_per_group"]
            tr_rows, tr_cols, tr_vals = (
                statics["tr_rows"], statics["tr_cols"], statics["tr_vals"]
            )
            n_unobs = int(unobserved.shape[0])
            key = state.key
            rej = jnp.zeros((), jnp.int32)
            e = state.e

            # ---- alpha (fm_learn_mcmc.h:433)
            key, k1 = jax.random.split(key)
            alpha, r = draw_alpha(
                k1, e, nc_train, state.alpha, alpha_0, gamma_0,
                do_multilevel, do_sample,
            )
            rej += r

            # ---- w0 (fm_learn_mcmc.h:643-683); reg0 := fm.reg0
            w0 = state.w0
            if cfg.use_bias:
                key, k1 = jax.random.split(key)
                acc = jnp.sum(e) - nc_train * w0
                sigma_sqr = 1.0 / (reg0 + alpha * nc_train)
                mean = -sigma_sqr * (alpha * acc - w0_mean_0 * reg0)
                prop = (
                    samplers.gaussian(k1, mean, jnp.sqrt(sigma_sqr))
                    if do_sample
                    else mean
                )
                w0_new, r = samplers.finite_or(prop, w0, bound=draw_bound)
                rej += r
                e = e + (w0_new - w0)
                w0 = w0_new

            # ---- w hyperpriors + draws
            w, w_mu, w_lambda = state.w, state.w_mu, state.w_lambda
            if cfg.use_linear:
                if do_multilevel:
                    key, k1 = jax.random.split(key)
                    w_lambda, w_mu, r = draw_theta_hyperpriors(
                        k1, w, attr_group, num_attr_per_group, w_mu, w_lambda,
                        alpha_0, gamma_0, beta_0, mu_0, do_sample,
                    )
                    rej += r
                else:
                    w_mu = jnp.full_like(w_mu, mu_0)
                for blk in blocks:
                    key, k1 = jax.random.split(key)
                    w, e, r = draw_w_block(
                        w, e, blk, w_mu, w_lambda, alpha, do_sample, k1,
                        bound=draw_bound,
                    )
                    rej += r
                if stacked is not None:
                    key, ks = jax.random.split(key)
                    skeys = jax.random.split(ks, stacked.num_blocks)

                    def w_stack_body(carry, inp):
                        w, e, rej = carry
                        sb, kb = inp
                        blk = BlockArrays(
                            sb.features, sb.groups, sb.entry_rows,
                            sb.entry_vals, sb.entry_feat, exact=True,
                        )
                        w, e, r = draw_w_block(
                            w, e, blk, w_mu, w_lambda, alpha, do_sample, kb,
                            bound=draw_bound,
                        )
                        return (w, e, rej + r), None

                    (w, e, rej), _ = jax.lax.scan(
                        w_stack_body, (w, e, rej), (stacked, skeys)
                    )
                if n_unobs:
                    key, k1 = jax.random.split(key)
                    w, r = draw_unobserved(
                        w, unobserved,
                        w_lambda[attr_group[unobserved]],
                        w_mu[attr_group[unobserved]],
                        do_sample, k1, bound=draw_bound,
                    )
                    rej += r

            # ---- v hyperpriors (drawn for all factors up front, as in
            # draw_all: fm_learn_mcmc.h:515-526)
            vt, v_mu, v_lambda = state.vt, state.v_mu, state.v_lambda
            if k > 0:
                if do_multilevel:
                    # lambda then mu, per factor — vectorised over factors
                    key, k1 = jax.random.split(key)
                    G = num_attr_per_group.shape[0]
                    sum_v = seg_sum(vt.T, attr_group, G, sorted_ids=False)  # [G,k]
                    dev = vt.T - v_mu[attr_group]  # [n,k]
                    lam_gamma = (
                        beta_0 * (v_mu - mu_0) ** 2 + gamma_0
                        + seg_sum(dev * dev, attr_group, G, sorted_ids=False)
                    )
                    lam_alpha = alpha_0 + num_attr_per_group[:, None] + 1.0
                    ka, kb = jax.random.split(k1)
                    if do_sample:
                        lam_prop = samplers.gamma(ka, lam_alpha / 2.0, lam_gamma / 2.0)
                    else:
                        lam_prop = lam_alpha / lam_gamma
                    v_lambda, r1 = samplers.finite_or(lam_prop, v_lambda)
                    mu_mean = (sum_v + beta_0 * mu_0) / (
                        num_attr_per_group[:, None] + beta_0
                    )
                    mu_sigma_sqr = 1.0 / (
                        (num_attr_per_group[:, None] + beta_0) * v_lambda
                    )
                    if do_sample:
                        mu_prop = samplers.gaussian(kb, mu_mean, jnp.sqrt(mu_sigma_sqr))
                    else:
                        mu_prop = mu_mean
                    v_mu, r2 = samplers.finite_or(mu_prop, v_mu)
                    rej += r1 + r2
                else:
                    v_mu = jnp.full_like(v_mu, mu_0)

                # ---- per-factor coordinate draws (lax.scan over factors)
                def factor_body(carry, inp):
                    vt, e, rej = carry
                    fidx, fkey = inp
                    v_f = jax.lax.dynamic_slice_in_dim(vt, fidx, 1, axis=0)[0]
                    # rebuild q for this factor (add_main_q,
                    # fm_learn_mcmc.h:406-428)
                    q = seg_sum(v_f[tr_cols] * tr_vals, tr_rows, nc_train)
                    v_mu_f = jax.lax.dynamic_slice_in_dim(v_mu, fidx, 1, axis=1)[:, 0]
                    v_lam_f = jax.lax.dynamic_slice_in_dim(v_lambda, fidx, 1, axis=1)[:, 0]
                    keys = jax.random.split(fkey, n_blocks + 2)
                    for bi, blk in enumerate(blocks):
                        v_f, e, q, r = draw_v_block(
                            v_f, e, q, blk, v_mu_f, v_lam_f, alpha,
                            do_sample, keys[bi], bound=draw_bound,
                        )
                        rej += r
                    if stacked is not None:
                        skeys = jax.random.split(
                            keys[n_blocks], stacked.num_blocks
                        )

                        def v_stack_body(carry, inp):
                            v_f, e, q, rej = carry
                            sb, kb = inp
                            blk = BlockArrays(
                                sb.features, sb.groups, sb.entry_rows,
                                sb.entry_vals, sb.entry_feat, exact=True,
                            )
                            v_f, e, q, r = draw_v_block(
                                v_f, e, q, blk, v_mu_f, v_lam_f, alpha,
                                do_sample, kb, bound=draw_bound,
                            )
                            return (v_f, e, q, rej + r), None

                        (v_f, e, q, rej), _ = jax.lax.scan(
                            v_stack_body, (v_f, e, q, rej), (stacked, skeys)
                        )
                    if n_unobs:
                        v_f, r = draw_unobserved(
                            v_f, unobserved,
                            v_lam_f[attr_group[unobserved]],
                            v_mu_f[attr_group[unobserved]],
                            do_sample, keys[-1], bound=draw_bound,
                        )
                        rej += r
                    vt = jax.lax.dynamic_update_slice_in_dim(
                        vt, v_f[None, :], fidx, axis=0
                    )
                    return (vt, e, rej), None

                key, kf = jax.random.split(key)
                fkeys = jax.random.split(kf, k)
                (vt, e, rej), _ = jax.lax.scan(
                    factor_body,
                    (vt, e, rej),
                    (jnp.arange(k, dtype=jnp.int32), fkeys),
                )

            return MCMCState(
                w0=w0, w=w, vt=vt, alpha=alpha,
                w_mu=w_mu, w_lambda=w_lambda, v_mu=v_mu, v_lambda=v_lambda,
                e=e, pred_this=state.pred_this,
                pred_sum_all=state.pred_sum_all,
                pred_sum_all_but5=state.pred_sum_all_but5,
                key=key, rejected=rej,
            )

        @jax.jit
        def iteration(state: MCMCState, y_train, y_test, it, eval_mask, statics):
            state = draw_all(state, statics)

            # re-predict train & test (mcmc_simultaneous.h:122)
            pred_train = csr_predict(
                state.w0, state.w, state.vt,
                statics["tr_rows"], statics["tr_cols"], statics["tr_vals"],
                nc_train, cfg.use_bias, cfg.use_linear,
            )
            pred_test = csr_predict(
                state.w0, state.w, state.vt,
                statics["te_rows"], statics["te_cols"], statics["te_vals"],
                nc_test, cfg.use_bias, cfg.use_linear,
            )

            key = state.key
            if task == TASK_REGRESSION:
                p_test = pred_test
                pred_this = p_test
                p_clamped = jnp.clip(p_test, min_t, max_t)
                pred_sum_all = state.pred_sum_all + p_clamped
                pred_sum_all_but5 = state.pred_sum_all_but5 + jnp.where(
                    it >= 5, p_clamped, 0.0
                )
                ptc = jnp.clip(pred_train, min_t, max_t)
                train_err = ptc - y_train
                train_metric = jnp.sqrt(jnp.mean(train_err * train_err))
                e = pred_train - y_train
            else:
                p_test = samplers.cdf_gaussian(pred_test)
                pred_this = p_test
                pred_sum_all = state.pred_sum_all + p_test
                pred_sum_all_but5 = state.pred_sum_all_but5 + jnp.where(
                    it >= 5, p_test, 0.0
                )
                p_train = samplers.cdf_gaussian(pred_train)
                correct = ((p_train >= 0.5) & (y_train > 0.0)) | (
                    (p_train < 0.5) & (y_train < 0.0)
                )
                train_metric = correct.astype(f).mean()
                # probit data augmentation (mcmc_simultaneous.h:172-194)
                key, k1 = jax.random.split(key)
                if do_sample:
                    lat_pos = samplers.left_truncated_gaussian(
                        k1, 0.0, pred_train, 1.0
                    )
                    lat_neg = samplers.right_truncated_gaussian(
                        k1, 0.0, pred_train, 1.0
                    )
                else:
                    lat_pos = samplers.left_tn_expectation(pred_train)
                    lat_neg = samplers.right_tn_expectation(pred_train)
                latent = jnp.where(y_train >= 0.0, lat_pos, lat_neg)
                e = pred_train - latent

            # test metrics on the num_eval_cases prefix
            # (mcmc_simultaneous.h:213-265)
            n_all = it + 1.0
            n_but5 = jnp.maximum(it - 4.0, 1e-12)
            if task == TASK_REGRESSION:
                m_this = _masked_rmse_mae(pred_this, y_test, eval_mask, min_t, max_t, 1.0)
                m_all = _masked_rmse_mae(
                    pred_sum_all, y_test, eval_mask, min_t, max_t, 1.0 / n_all
                )
                m_but5 = _masked_rmse_mae(
                    pred_sum_all_but5, y_test, eval_mask, min_t, max_t, 1.0 / n_but5
                )
            else:
                m_this = _masked_acc_ll(pred_this, y_test, eval_mask, 1.0)
                m_all = _masked_acc_ll(pred_sum_all, y_test, eval_mask, 1.0 / n_all)
                m_but5 = _masked_acc_ll(
                    pred_sum_all_but5, y_test, eval_mask, 1.0 / n_but5
                )

            new_state = MCMCState(
                w0=state.w0, w=state.w, vt=state.vt, alpha=state.alpha,
                w_mu=state.w_mu, w_lambda=state.w_lambda,
                v_mu=state.v_mu, v_lambda=state.v_lambda,
                e=e, pred_this=pred_this, pred_sum_all=pred_sum_all,
                pred_sum_all_but5=pred_sum_all_but5, key=key,
                rejected=state.rejected,
            )
            metrics = dict(
                train=train_metric,
                this=m_this, all=m_all, but5=m_but5,
                alpha=state.alpha, rejected=state.rejected,
                w_mu=state.w_mu, w_lambda=state.w_lambda,
                v_mu=state.v_mu, v_lambda=state.v_lambda,
            )
            if task != TASK_REGRESSION:
                metrics["auc"] = _masked_auc(pred_sum_all, y_test, eval_mask)
            return new_state, metrics

        return iteration

    # ----------------------------------------------------------- reporting
    def _log_iteration(self, it, metrics, dt):
        """`dt` is either a wall-seconds float or the (user, cpu, wall)
        triple from timers.iter_clocks(); the triple populates the
        reference's time_learn / time_learn2 / time_learn4 fields
        (fm_learn_mcmc_simultaneous.h:202-208 — time_pred stays NaN for
        MCMC there too)."""
        if isinstance(dt, tuple):
            t_user, t_cpu, t_wall = dt
        else:
            t_user = t_cpu = t_wall = dt
        dt = t_wall
        tr = float(metrics["train"])
        if self.task == TASK_REGRESSION:
            te = float(metrics["all"][0])
            if self.verbose:
                print(f"#Iter={it:3d}\tTrain={tr:.6g}\tTest={te:.6g}")
        else:
            te = float(metrics["all"][0])
            ll = float(metrics["all"][1])
            if self.verbose:
                print(
                    f"#Iter={it:3d}\tTrain={tr:.6g}\tTest={te:.6g}\tTest(ll)={ll:.6g}"
                )
        self.history.append(
            dict(
                iter=it,
                train=tr,
                test_this=float(metrics["this"][0]),
                test_all=float(metrics["all"][0]),
                test_all_but5=float(metrics["but5"][0]),
                # secondary metric: MAE (regression) / log10-loss (classif.)
                test_this_m2=float(metrics["this"][1]),
                test_all_m2=float(metrics["all"][1]),
                test_all_but5_m2=float(metrics["but5"][1]),
                alpha=float(metrics["alpha"]),
                rejected=int(metrics["rejected"]),
                time=dt,
                **(
                    {"auc_all": float(metrics["auc"])}
                    if "auc" in metrics
                    else {}
                ),
            )
        )
        if self.rlog is not None:
            m = metrics
            self.rlog.log("time_learn", t_user)
            self.rlog.log("time_learn2", t_cpu)
            self.rlog.log("time_learn4", t_wall)
            self.rlog.log("alpha", float(m["alpha"]))
            if "w_mu" in m:
                w_mu = np.asarray(m["w_mu"]); w_lam = np.asarray(m["w_lambda"])
                v_mu = np.asarray(m["v_mu"]); v_lam = np.asarray(m["v_lambda"])
                for g in range(len(w_mu)):
                    self.rlog.log(f"wmu[{g}]", float(w_mu[g]))
                    self.rlog.log(f"wlambda[{g}]", float(w_lam[g]))
                for g in range(v_mu.shape[0]):
                    for fc in range(v_mu.shape[1]):
                        self.rlog.log(f"vmu[{g},{fc}]", float(v_mu[g, fc]))
                        self.rlog.log(f"vlambda[{g},{fc}]", float(v_lam[g, fc]))
            if self.task == TASK_REGRESSION:
                self.rlog.log("rmse", float(m["all"][0]))
                self.rlog.log("mae", float(m["all"][1]))
                self.rlog.log("rmse_mcmc_this", float(m["this"][0]))
                self.rlog.log("rmse_mcmc_all", float(m["all"][0]))
                self.rlog.log("rmse_mcmc_all_but5", float(m["but5"][0]))
            else:
                self.rlog.log("accuracy", float(m["all"][0]))
                self.rlog.log("acc_mcmc_this", float(m["this"][0]))
                self.rlog.log("acc_mcmc_all", float(m["all"][0]))
                self.rlog.log("acc_mcmc_all_but5", float(m["but5"][0]))
                self.rlog.log("ll_mcmc_this", float(m["this"][1]))
                self.rlog.log("ll_mcmc_all", float(m["all"][1]))
                self.rlog.log("ll_mcmc_all_but5", float(m["but5"][1]))
                if "auc" in m:
                    self.rlog.log("auc_mcmc_all", float(m["auc"]))
            self.rlog.new_line()

    def register_log_fields(self):
        """Pre-declare rlog fields (fm_learn_mcmc.h:1127-1157)."""
        if self.rlog is None:
            return
        nan = float("nan")
        if self.task == TASK_REGRESSION:
            for fname in ("rmse", "mae"):
                self.rlog.add_field(fname, nan)
        else:
            self.rlog.add_field("accuracy", nan)
        for fname in ("time_pred", "time_learn", "time_learn2", "time_learn4"):
            self.rlog.add_field(fname, nan)
        self.rlog.add_field("alpha", nan)
        if self.task == TASK_REGRESSION:
            for fname in ("rmse_mcmc_this", "rmse_mcmc_all", "rmse_mcmc_all_but5"):
                self.rlog.add_field(fname, nan)
        else:
            for fname in (
                "acc_mcmc_this", "acc_mcmc_all", "acc_mcmc_all_but5",
                "ll_mcmc_this", "ll_mcmc_all", "ll_mcmc_all_but5",
                "auc_mcmc_all",  # beyond the reference (BASELINE AUC)
            ):
                self.rlog.add_field(fname, nan)
        # per-group hyperparameter columns (fm_learn_mcmc.h:444-449, 521-526)
        for g in range(self._num_groups_for_log()):
            self.rlog.add_field(f"wmu[{g}]", nan)
            self.rlog.add_field(f"wlambda[{g}]", nan)
        for g in range(self._num_groups_for_log()):
            for fc in range(self.cfg.num_factors):
                self.rlog.add_field(f"vmu[{g},{fc}]", nan)
                self.rlog.add_field(f"vlambda[{g},{fc}]", nan)

    def _num_groups_for_log(self) -> int:
        if self.attr_group_np is None:
            return 1
        return int(self.attr_group_np.max()) + 1

    # ---------------------------------------------------------- inference
    def predict(self, test: Dataset) -> np.ndarray:
        """Posterior-mean predictions, clamped
        (/root/reference/src/libfm/src/fm_learn_mcmc.h:380-404). Only valid
        for the test set passed to learn()."""
        st = self._final_state
        if self.do_sample:
            out = np.asarray(st.pred_sum_all) / self.num_iter
        else:
            out = np.asarray(st.pred_this)
        if self.task == TASK_REGRESSION:
            return np.clip(out, self.min_target, self.max_target)
        return np.clip(out, 0.0, 1.0)

    def get_params(self) -> FMParams:
        st = self._final_state
        return FMParams(w0=st.w0, w=st.w, v=st.vt.T)

    def predict_new(self, ds: Dataset, batch_size: int = 8192) -> np.ndarray:
        """Predictions for data NOT passed to learn().

        The reference cannot do this at all for MCMC (predict_case throws,
        fm_learn_mcmc.h:141-143; predictions come only from the averaged
        in-run samples). This uses the final parameter sample as a point
        estimate: scores via the batched forward, then clamped to the
        observed target range (regression, fm_learn.h:137-139) or linked
        through the probit CDF — the MCMC model's own link
        (fm_learn_mcmc_simultaneous.h:164) — for classification. Less
        accurate than the posterior-mean `predict()` on the learn-time
        test set; use that when possible."""
        from libfm_tpu.data.batching import batch_dataset

        if ds.relations:
            # one forward pass over the materialised join — but gated the
            # same way the trainer gates expansion (mcmc_vector.py learn):
            # a fat-block dataset whose join expands far beyond its BS form
            # must not be materialised whole on the host. Above the cap the
            # expansion happens in bounded case-range chunks.
            from libfm_tpu.data.relation import expand_join, expansion_cost

            exp_nnz, _ = expansion_cost(ds)
            if exp_nnz > self.predict_expand_cap:
                return self._predict_new_chunked(ds, exp_nnz, batch_size)
            ds = expand_join(ds)
        if ds.num_features > self.cfg.num_features:
            # JAX gathers CLAMP out-of-bounds ids (they would silently
            # score with the LAST feature's weights)
            raise ValueError(
                f"dataset has feature ids up to {ds.num_features - 1} but "
                f"the model covers {self.cfg.num_features} features"
            )
        params = self.get_params()
        b = batch_dataset(ds, batch_size)
        ids, vals = jnp.asarray(b.ids), jnp.asarray(b.vals)

        from libfm_tpu.models.fm import fm_batch_terms

        @jax.jit
        def fwd(params, ids, vals):
            def body(_, batch):
                pred, _ = fm_batch_terms(params, batch[0], batch[1], self.cfg)
                return None, pred

            _, preds = jax.lax.scan(body, None, (ids, vals))
            return preds

        scores = np.asarray(fwd(params, ids, vals)).reshape(-1)[: ds.num_rows]
        if self.task == TASK_REGRESSION:
            return np.clip(scores, self.min_target, self.max_target)
        p = np.asarray(samplers.cdf_gaussian(jnp.asarray(scores)))
        return np.clip(p, 0.0, 1.0)

    # materialised-join size cap for predict_new (entries); above it the
    # expansion runs in case-range chunks. ~8 bytes/entry => ~400 MB peak.
    predict_expand_cap = 50_000_000

    def _predict_new_chunked(
        self, ds: Dataset, exp_nnz: int, batch_size: int
    ) -> np.ndarray:
        """predict_new for relational data whose full expansion exceeds
        predict_expand_cap: expand and score bounded case-range slices.
        Identical math to the unchunked path (the forward is per-case)."""
        from libfm_tpu.data.dataset import Dataset as _DS
        from libfm_tpu.data.relation import RelationJoin, expand_join

        nc = ds.num_rows
        per_case = max(1, exp_nnz // max(nc, 1))
        step = max(1, min(nc, (self.predict_expand_cap // 2) // per_case))
        out = []
        for a in range(0, nc, step):
            b = min(nc, a + step)
            sub = _DS(
                ds.indptr[a : b + 1] - ds.indptr[a],
                ds.cols[ds.indptr[a] : ds.indptr[b]],
                ds.vals[ds.indptr[a] : ds.indptr[b]],
                ds.target[a:b],
                ds.num_features,
            )
            sub.relations = [
                RelationJoin(r.data, r.row_map[a:b]) for r in ds.relations
            ]
            out.append(self.predict_new(expand_join(sub), batch_size))
        return np.concatenate(out)

    def _learn_relational(self, train, test):
        from libfm_tpu.learners.mcmc_relational import learn_relational

        return learn_relational(self, train, test)


class ALSLearner(MCMCLearner):
    """ALS = MCMC with expectation updates and fixed hyperpriors."""

    def __init__(self, *args, **kwargs):
        kwargs.setdefault("do_sample", False)
        kwargs.setdefault("do_multilevel", False)
        super().__init__(*args, **kwargs)


# --------------------------------------------------------------------------
# metric helpers (jit-side)
# --------------------------------------------------------------------------


def _masked_rmse_mae(pred_sum, y, mask, min_t, max_t, normalizer):
    # metric reductions run in float32 regardless of model dtype — a
    # bf16 mask.sum() is ~0.5% off by 10K cases (same convention as
    # _masked_auc); a no-op cast for f32/f64 models
    pred_sum = pred_sum.astype(jnp.result_type(pred_sum.dtype, jnp.float32))
    y = y.astype(pred_sum.dtype)
    mask = mask.astype(pred_sum.dtype)
    p = jnp.clip(pred_sum * normalizer, min_t, max_t)
    err = (p - y) * mask
    n = jnp.maximum(mask.sum(), 1.0)
    return jnp.sqrt((err * err).sum() / n), jnp.abs(err).sum() / n


def _masked_auc(p, y, mask):
    """ROC AUC via the Mann-Whitney rank-sum over the masked prefix.

    Capability beyond the reference (which logs only accuracy and
    log10-likelihood); BASELINE.json's quality metric names Criteo AUC.
    Ties get arbitrary (not midpoint) ranks — bias is O(ties/n), nil for
    continuous posterior-mean scores. Ranks/sums run in float32
    regardless of model dtype (bf16 rank arithmetic quantizes above 256).
    """
    p = p.astype(jnp.float32)
    mask = mask.astype(jnp.float32)
    n = p.shape[0]
    order = jnp.argsort(jnp.where(mask > 0, p, jnp.inf))
    ranks = jnp.zeros(n, p.dtype).at[order].set(
        jnp.arange(1, n + 1, dtype=p.dtype)
    )
    pos = (y > 0.0) & (mask > 0)
    neg = (y <= 0.0) & (mask > 0)
    npos = pos.sum().astype(p.dtype)
    nneg = neg.sum().astype(p.dtype)
    rsum = jnp.where(pos, ranks, 0.0).sum()
    return (rsum - npos * (npos + 1.0) / 2.0) / jnp.maximum(npos * nneg, 1.0)


def _masked_acc_ll(pred_sum, y, mask, normalizer):
    # float32 reductions regardless of model dtype (see _masked_rmse_mae)
    pred_sum = pred_sum.astype(jnp.result_type(pred_sum.dtype, jnp.float32))
    y = y.astype(pred_sum.dtype)
    mask = mask.astype(pred_sum.dtype)
    p = pred_sum * normalizer
    correct = (((p >= 0.5) & (y > 0.0)) | ((p < 0.5) & (y < 0.0))).astype(p.dtype)
    n = jnp.maximum(mask.sum(), 1.0)
    acc = (correct * mask).sum() / n
    m01 = (y + 1.0) * 0.5
    pc = jnp.clip(p, 0.01, 0.99)
    ll = m01 * jnp.log10(pc) + (1.0 - m01) * jnp.log10(1.0 - pc)
    return acc, -(ll * mask).sum() / n


