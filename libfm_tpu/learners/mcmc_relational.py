"""Relational (block-structure, BS) MCMC/ALS engine — VLDB 2013.

TPU-native restatement of the relational path of the reference MCMC
engine (/root/reference/src/libfm/src/fm_learn_mcmc.h): the joined design
matrix is never materialised; instead each relation is a shared feature
block with per-block-row caches

    relation_cache {wnum, q, wc, wc_sqr, y, we, weq}
    (/root/reference/src/libfm/src/fm_learn_mcmc.h:51-59)

so one Gibbs sweep costs O(nnz(main) + sum_r nnz(block_r)) instead of
O(nnz(full join)).

Mapping to the device:

- every per-block-row cache becomes a dense device array [num_block_rows]
  maintained by segment-sums over the train->block `row_map`;
- the per-coordinate draws become conflict-free-block parallel draws
  (identical in distribution to a sequential scan in block order — see
  learners/mcmc.py);
- relation feature draws use the block-aggregate posterior formulas of
  draw_w_rel (/root/reference/src/libfm/src/fm_learn_mcmc.h:734-790) and
  draw_v_rel (:849-909);
- the un-sync/re-sync dance of the reference (e.g. `cache[c].e -=
  r_cache[map].y` before a relation's draws, `+=` after, :478-509 and
  :598-638) is replaced by applying the *net* delta
  `e += (y_new - y_old)[row_map] (+ q'*(qB_new - qB_old)[row_map])`
  after the relation's draws — algebraically identical.

The whole iteration (draw_all + joint re-prediction + accumulators) is a
single jitted function; factors run under lax.scan, relations and their
conflict-free blocks are unrolled (static shapes).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from libfm_tpu.data.batching import conflict_free_blocks
from libfm_tpu.data.dataset import Dataset
from libfm_tpu.learners.mcmc import (
    BlockArrays,
    _posterior_gaussian,
    draw_alpha,
    draw_theta_hyperpriors,
    draw_unobserved,
    draw_w_block,
    draw_v_block,
    _masked_rmse_mae,
    _masked_acc_ll,
)
from libfm_tpu.ops import samplers
from libfm_tpu.ops.segment import seg_sum
from libfm_tpu.tasks import TASK_REGRESSION
from libfm_tpu.utils.timers import iter_clocks


@dataclass
class RelLayout:
    """Host-side, static description of one relation block."""

    num_block_rows: int
    attr_offset: int
    num_features: int
    # flat CSR entries of the block design matrix (entry rows are BLOCK rows)
    rows: np.ndarray
    cols: np.ndarray  # local feature ids
    vals: np.ndarray
    blocks: list  # list[BlockArrays] with entry_rows = block rows
    unobserved_local: np.ndarray  # local feature ids with no block entries
    row_map_train: np.ndarray
    row_map_test: np.ndarray
    wnum: np.ndarray  # float [num_block_rows]


def _build_rel_layout(join_train, join_test, nc_train: int, attr_group, f):
    rd = join_train.data
    nb = rd.num_cases
    ds = Dataset(
        rd.indptr, rd.cols, rd.vals, np.zeros(nb, dtype=np.float32), rd.num_features
    )
    local_groups = attr_group[rd.attr_offset : rd.attr_offset + rd.num_features]
    blocks_host = conflict_free_blocks(ds, attr_group=local_groups)
    observed = (
        np.concatenate([b.features for b in blocks_host])
        if blocks_host
        else np.empty(0, np.int32)
    )
    mask = np.ones(rd.num_features, dtype=bool)
    if len(observed):
        mask[observed] = False
    unobserved = np.nonzero(mask)[0].astype(np.int32)
    wnum = np.bincount(join_train.row_map, minlength=nb).astype(np.float64)
    dev_blocks = [
        BlockArrays(
            jnp.asarray(b.features),  # LOCAL feature ids
            jnp.asarray(local_groups[b.features]),
            jnp.asarray(b.entry_rows),  # block-row ids
            jnp.asarray(b.entry_vals, dtype=f),
            jnp.asarray(b.entry_feat),
            exact=b.exact,
        )
        for b in blocks_host
    ]
    return RelLayout(
        num_block_rows=nb,
        attr_offset=rd.attr_offset,
        num_features=rd.num_features,
        rows=ds.row_of_entry,
        cols=rd.cols.astype(np.int32),
        vals=rd.vals.astype(np.float32),
        blocks=dev_blocks,
        unobserved_local=unobserved,
        row_map_train=join_train.row_map.astype(np.int32),
        row_map_test=join_test.row_map.astype(np.int32),
        wnum=wnum,
    )


# --------------------------------------------------------------------------
# Relational block draws
# --------------------------------------------------------------------------


def draw_w_rel_block(w_off, we, y_b, wnum, blk: BlockArrays, w_mu, w_lambda,
                     alpha, do_sample, key, bound=None):
    """Parallel draw_w_rel over one conflict-free set of block features.

    Posterior accumulators per feature j (fm_learn_mcmc.h:734-752):
        num_acc = sum_entries x * we[b]
        den_acc = sum_entries x^2 * wnum[b]
    cache updates (:784-790): we[b] += x*delta*wnum[b]; y[b] += delta*x.
    `w_off` is the w slice for this relation (local indexing).
    """
    F = blk.num_features
    x = blk.entry_vals
    b = blk.entry_rows
    num_acc = seg_sum(x * we[b], blk.entry_feat, F)
    den_acc = seg_sum(x * x * wnum[b], blk.entry_feat, F)
    w_old = w_off[blk.features]
    w_new, n_rej = _posterior_gaussian(
        num_acc, den_acc, w_old, w_lambda[blk.groups], w_mu[blk.groups],
        alpha, do_sample, key, bound=bound,
    )
    delta = (w_new - w_old)[blk.entry_feat]
    we = we.at[b].add(x * delta * wnum[b], unique_indices=blk.exact)
    y_b = y_b.at[b].add(x * delta, unique_indices=blk.exact)
    w_off = w_off.at[blk.features].set(w_new, unique_indices=True)
    return w_off, we, y_b, n_rej


def draw_v_rel_block(v_off, q_b, y_b, we, weq, wc, wc_sqr, wnum,
                     blk: BlockArrays, v_mu_f, v_lambda_f, alpha, do_sample,
                     key, bound=None):
    """Parallel draw_v_rel over one conflict-free set of block features.

    Per feature j with h = x*(qB[b] - x*v) (fm_learn_mcmc.h:849-871):
        num_acc = sum h*we[b] + x*weq[b]
        den_acc = sum h^2*wnum[b] + 2*wc[b]*x*h + x^2*wc_sqr[b]
    cache updates (:898-908):
        we[b]  += delta*(h*wnum[b] + x*wc[b])
        qB[b]  += delta*x
        weq[b] += delta*(h*wc[b] + x*wc_sqr[b])
        y[b]   += delta*h
    """
    F = blk.num_features
    x = blk.entry_vals
    b = blk.entry_rows
    v_old = v_off[blk.features]
    h = x * (q_b[b] - x * v_old[blk.entry_feat])
    num_acc = seg_sum(h * we[b] + x * weq[b], blk.entry_feat, F)
    den_acc = seg_sum(
        h * h * wnum[b] + 2.0 * wc[b] * x * h + x * x * wc_sqr[b],
        blk.entry_feat, F,
    )
    v_new, n_rej = _posterior_gaussian(
        num_acc, den_acc, v_old, v_lambda_f[blk.groups], v_mu_f[blk.groups],
        alpha, do_sample, key, bound=bound,
    )
    delta = (v_new - v_old)[blk.entry_feat]
    we = we.at[b].add(delta * (h * wnum[b] + x * wc[b]), unique_indices=blk.exact)
    weq = weq.at[b].add(delta * (h * wc[b] + x * wc_sqr[b]), unique_indices=blk.exact)
    q_b = q_b.at[b].add(delta * x, unique_indices=blk.exact)
    y_b = y_b.at[b].add(delta * h, unique_indices=blk.exact)
    v_off = v_off.at[blk.features].set(v_new, unique_indices=True)
    return v_off, q_b, y_b, we, weq, n_rej


# --------------------------------------------------------------------------
# Driver
# --------------------------------------------------------------------------


def learn_relational(learner, train: Dataset, test: Dataset):
    """Run the BS MCMC/ALS loop for `learner` (an MCMCLearner)."""
    cfg = learner.cfg
    f = learner.dtype
    n, k = cfg.num_features, cfg.num_factors
    learner.min_target = train.min_target
    learner.max_target = train.max_target
    task = learner.task
    do_sample, do_multilevel = learner.do_sample, learner.do_multilevel
    alpha_0, gamma_0 = learner.alpha_0, learner.gamma_0
    beta_0, mu_0 = learner.beta_0, learner.mu_0
    min_t, max_t = learner.min_target, learner.max_target
    # f32 runaway bound for parameter draws (samplers.DRAW_BOUND)
    draw_bound = samplers.DRAW_BOUND * max(
        1.0, abs(float(min_t)), abs(float(max_t))
    )

    attr_group_np = learner.attr_group_np
    if attr_group_np is None:
        attr_group_np = np.zeros(n, dtype=np.int32)
    G = int(attr_group_np.max()) + 1
    attr_group = jnp.asarray(attr_group_np)
    num_attr_per_group = jnp.asarray(
        np.bincount(attr_group_np, minlength=G).astype(np.float64), dtype=f
    )

    # ---- layouts -----------------------------------------------------
    n_main = train.relations[0].data.attr_offset
    rels = [
        _build_rel_layout(jt, je, train.num_rows, attr_group_np, f)
        for jt, je in zip(train.relations, test.relations)
    ]

    main_blocks_host = conflict_free_blocks(
        train, attr_group=attr_group_np[: max(train.num_features, 1)]
    )
    main_blocks = [
        BlockArrays(
            jnp.asarray(b.features),
            jnp.asarray(attr_group_np[b.features]),
            jnp.asarray(b.entry_rows),
            jnp.asarray(b.entry_vals, dtype=f),
            jnp.asarray(b.entry_feat),
            exact=b.exact,
        )
        for b in main_blocks_host
    ]
    observed = (
        np.concatenate([b.features for b in main_blocks_host])
        if main_blocks_host
        else np.empty(0, np.int32)
    )
    mask = np.ones(n_main, dtype=bool)
    if len(observed):
        mask[observed] = False
    # main features with no train entries, drawn from the prior up to the
    # first relation offset (fm_learn_mcmc.h:467-476)
    main_unobs = np.nonzero(mask)[0].astype(np.int32)
    # relation features with no block entries + all global unobserved ids
    unobs_ids = [main_unobs] + [
        (r.unobserved_local + r.attr_offset).astype(np.int32) for r in rels
    ]
    unobserved = jnp.asarray(np.concatenate(unobs_ids))
    n_unobs = int(unobserved.shape[0])

    tr_rows = jnp.asarray(train.row_of_entry)
    tr_cols = jnp.asarray(train.cols)
    tr_vals = jnp.asarray(train.vals, dtype=f)
    te_rows = jnp.asarray(test.row_of_entry)
    te_cols = jnp.asarray(test.cols)
    te_vals = jnp.asarray(test.vals, dtype=f)
    y_train = jnp.asarray(train.target, dtype=f)
    y_test = jnp.asarray(test.target, dtype=f)
    nc_train, nc_test = train.num_rows, test.num_rows
    nec = (
        learner.num_eval_cases if learner.num_eval_cases is not None else nc_test
    )
    eval_mask = jnp.asarray((np.arange(nc_test) < nec).astype(np.float64), dtype=f)

    dev_rels = [
        dict(
            rows=jnp.asarray(r.rows),
            cols=jnp.asarray(r.cols),
            vals=jnp.asarray(r.vals, dtype=f),
            map_tr=jnp.asarray(r.row_map_train),
            map_te=jnp.asarray(r.row_map_test),
            wnum=jnp.asarray(r.wnum, dtype=f),
        )
        for r in rels
    ]

    # ---- joint prediction (predict_data_and_write_to_eterms analog) --
    def rel_predict(w0, w, vt, S):
        """Returns (pred_train[nc_tr], pred_test[nc_te], [y_b per rel])."""
        dev_rels = S["dev_rels"]
        tr_rows, tr_cols, tr_vals = S["tr_rows"], S["tr_cols"], S["tr_vals"]
        te_rows, te_cols, te_vals = S["te_rows"], S["te_cols"], S["te_vals"]
        vT = vt.T  # [n, k]
        q_bs, y_bs, lin_bs, sq_bs = [], [], [], []
        for r, d in zip(rels, dev_rels):
            voff = vT[r.attr_offset : r.attr_offset + r.num_features]
            vx = voff[d["cols"]] * d["vals"][:, None]  # [nnzB, k]
            q_b = seg_sum(vx, d["rows"], r.num_block_rows)  # [nb, k]
            sq_b = seg_sum(vx * vx, d["rows"], r.num_block_rows).sum(axis=1)
            lin_b = seg_sum(
                w[d["cols"] + r.attr_offset] * d["vals"], d["rows"],
                r.num_block_rows,
            )
            y_b = 0.5 * ((q_b * q_b).sum(axis=1) - sq_b)
            if cfg.use_linear:
                y_b = y_b + lin_b
            q_bs.append(q_b)
            y_bs.append(y_b)
            lin_bs.append(lin_b)
            sq_bs.append(sq_b)

        def main_pred(rows, cols, vals, nc, which):
            vx = vT[cols] * vals[:, None]
            q_main = seg_sum(vx, rows, nc)  # [nc, k]
            sq_main = seg_sum(vx * vx, rows, nc).sum(axis=1)
            q_all = q_main
            for d, q_b in zip(dev_rels, q_bs):
                q_all = q_all + q_b[d[which]]
            sq_all = sq_main
            for d, sq_b in zip(dev_rels, sq_bs):
                sq_all = sq_all + sq_b[d[which]]
            pred = 0.5 * ((q_all * q_all).sum(axis=1) - sq_all)
            if cfg.use_linear:
                lin = seg_sum(w[cols] * vals, rows, nc)
                for d, lin_b in zip(dev_rels, lin_bs):
                    lin = lin + lin_b[d[which]]
                pred = pred + lin
            if cfg.use_bias:
                pred = pred + w0
            return pred

        pred_tr = main_pred(tr_rows, tr_cols, tr_vals, nc_train, "map_tr")
        pred_te = main_pred(te_rows, te_cols, te_vals, nc_test, "map_te")
        return pred_tr, pred_te, y_bs

    # ---- init --------------------------------------------------------
    key = jax.random.PRNGKey(learner.seed)
    key, kw, kv = jax.random.split(key, 3)
    w = cfg.init_mean + cfg.init_stdev * jax.random.normal(kw, (n,), dtype=f)
    vt = cfg.init_mean + cfg.init_stdev * jax.random.normal(kv, (k, n), dtype=f)
    w0_init = jnp.zeros((), f)
    if learner.warm_start is not None:  # MCMCLearner.__init__: only w0/V load
        vt = jnp.asarray(learner.warm_start.v, dtype=f).T
        w0_init = jnp.asarray(learner.warm_start.w0, dtype=f)
    w_lambda = (
        jnp.asarray(learner._w_lambda_vec, dtype=f)
        if learner._w_lambda_vec is not None
        else jnp.full((G,), learner._init_w_lambda, dtype=f)
    )
    v_lambda = (
        jnp.asarray(learner._v_lambda_vec, dtype=f)
        if learner._v_lambda_vec is not None
        else jnp.full((G, k), learner._init_v_lambda, dtype=f)
    )

    statics = dict(
        dev_rels=dev_rels, main_blocks=main_blocks,
        attr_group=attr_group, num_attr_per_group=num_attr_per_group,
        unobserved=unobserved,
        tr_rows=tr_rows, tr_cols=tr_cols, tr_vals=tr_vals,
        te_rows=te_rows, te_cols=te_cols, te_vals=te_vals,
        y_train=y_train, y_test=y_test, eval_mask=eval_mask,
    )
    pred_tr0, _, y_bs0 = rel_predict(w0_init, w, vt, statics)
    state = dict(
        w0=w0_init,
        w=w,
        vt=vt,
        alpha=jnp.asarray(1.0, f),
        w_mu=jnp.zeros((G,), f),
        w_lambda=w_lambda,
        v_mu=jnp.zeros((G, k), f),
        v_lambda=v_lambda,
        e=pred_tr0 - y_train,
        y_bs=tuple(y_bs0),
        pred_this=jnp.zeros((nc_test,), f),
        pred_sum_all=jnp.zeros((nc_test,), f),
        pred_sum_all_but5=jnp.zeros((nc_test,), f),
        key=key,
        rejected=jnp.zeros((), jnp.int32),
    )

    # ---- one Gibbs iteration ----------------------------------------
    def draw_all(state, S):
        dev_rels = S["dev_rels"]
        main_blocks = S["main_blocks"]
        attr_group = S["attr_group"]
        num_attr_per_group = S["num_attr_per_group"]
        unobserved = S["unobserved"]
        tr_rows, tr_cols, tr_vals = S["tr_rows"], S["tr_cols"], S["tr_vals"]
        key = state["key"]
        rej = jnp.zeros((), jnp.int32)
        e = state["e"]
        y_bs = list(state["y_bs"])

        key, k1 = jax.random.split(key)
        alpha, r = draw_alpha(
            k1, e, nc_train, state["alpha"], alpha_0, gamma_0,
            do_multilevel, do_sample,
        )
        rej += r

        # w0 (uses full synced e)
        w0 = state["w0"]
        if cfg.use_bias:
            key, k1 = jax.random.split(key)
            acc = jnp.sum(e) - nc_train * w0
            sigma_sqr = 1.0 / (learner.reg0 + alpha * nc_train)
            mean = -sigma_sqr * (alpha * acc - learner.w0_mean_0 * learner.reg0)
            prop = (
                samplers.gaussian(k1, mean, jnp.sqrt(sigma_sqr))
                if do_sample else mean
            )
            w0_new, r = samplers.finite_or(prop, w0, bound=draw_bound)
            rej += r
            e = e + (w0_new - w0)
            w0 = w0_new

        w, w_mu, w_lambda = state["w"], state["w_mu"], state["w_lambda"]
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
            # main w draws on the full e (fm_learn_mcmc.h:454-465)
            for blk in main_blocks:
                key, k1 = jax.random.split(key)
                w, e, r = draw_w_block(
                    w, e, blk, w_mu, w_lambda, alpha, do_sample, k1,
                    bound=draw_bound,
                )
                rej += r
            # relation w draws (:478-509) — sequential over relations
            for ri, (r_lay, d) in enumerate(zip(rels, dev_rels)):
                off = r_lay.attr_offset
                nf = r_lay.num_features
                we = seg_sum(e, d["map_tr"], r_lay.num_block_rows)
                y_old = y_bs[ri]
                y_b = y_old
                w_off = jax.lax.dynamic_slice_in_dim(w, off, nf)
                gr_off = jax.lax.dynamic_slice_in_dim(attr_group, off, nf)
                del gr_off  # groups are baked into the BlockArrays
                for blk in r_lay.blocks:
                    key, k1 = jax.random.split(key)
                    w_off, we, y_b, r = draw_w_rel_block(
                        w_off, we, y_b, d["wnum"], blk, w_mu, w_lambda,
                        alpha, do_sample, k1, bound=draw_bound,
                    )
                    rej += r
                w = jax.lax.dynamic_update_slice_in_dim(w, w_off, off, axis=0)
                # resync e with the updated block prediction (:504-507)
                e = e + (y_b - y_old)[d["map_tr"]]
                y_bs[ri] = y_b
            if n_unobs:
                key, k1 = jax.random.split(key)
                w, r = draw_unobserved(
                    w, unobserved,
                    w_lambda[attr_group[unobserved]],
                    w_mu[attr_group[unobserved]],
                    do_sample, k1, bound=draw_bound,
                )
                rej += r

        # v hyperpriors (vectorised over factors)
        vt, v_mu, v_lambda = state["vt"], state["v_mu"], state["v_lambda"]
        if k > 0:
            if do_multilevel:
                key, k1 = jax.random.split(key)
                sum_v = seg_sum(vt.T, attr_group, G, sorted_ids=False)
                dev = vt.T - v_mu[attr_group]
                lam_gamma = (
                    beta_0 * (v_mu - mu_0) ** 2 + gamma_0
                    + seg_sum(dev * dev, attr_group, G, sorted_ids=False)
                )
                lam_alpha = alpha_0 + num_attr_per_group[:, None] + 1.0
                ka, kb = jax.random.split(k1)
                lam_prop = (
                    samplers.gamma(ka, lam_alpha / 2.0, lam_gamma / 2.0)
                    if do_sample else lam_alpha / lam_gamma
                )
                v_lambda, r1 = samplers.finite_or(lam_prop, v_lambda)
                mu_mean = (sum_v + beta_0 * mu_0) / (
                    num_attr_per_group[:, None] + beta_0
                )
                mu_sigma_sqr = 1.0 / ((num_attr_per_group[:, None] + beta_0) * v_lambda)
                mu_prop = (
                    samplers.gaussian(kb, mu_mean, jnp.sqrt(mu_sigma_sqr))
                    if do_sample else mu_mean
                )
                v_mu, r2 = samplers.finite_or(mu_prop, v_mu)
                rej += r1 + r2
            else:
                v_mu = jnp.full_like(v_mu, mu_0)

            def factor_body(carry, inp):
                vt, e, rej, y_bs = carry[0], carry[1], carry[2], list(carry[3])
                fidx, fkey = inp
                v_f = jax.lax.dynamic_slice_in_dim(vt, fidx, 1, axis=0)[0]
                v_mu_f = jax.lax.dynamic_slice_in_dim(v_mu, fidx, 1, axis=1)[:, 0]
                v_lam_f = jax.lax.dynamic_slice_in_dim(v_lambda, fidx, 1, axis=1)[:, 0]

                # q_main (add_main_q, :406-428) + per-relation q_B (:544-567)
                q = seg_sum(v_f[tr_cols] * tr_vals, tr_rows, nc_train)
                q_b_list = []
                for r_lay, d in zip(rels, dev_rels):
                    voff = jax.lax.dynamic_slice_in_dim(
                        v_f, r_lay.attr_offset, r_lay.num_features
                    )
                    q_b = seg_sum(
                        voff[d["cols"]] * d["vals"], d["rows"],
                        r_lay.num_block_rows,
                    )
                    q_b_list.append(q_b)
                    q = q + q_b[d["map_tr"]]  # q := q^M + sum q^B (:570-574)

                nkeys = 1 + len(main_blocks) + sum(
                    1 + len(r.blocks) for r in rels
                )
                keys = jax.random.split(fkey, max(nkeys, 2))
                ki = 0

                # main v draws on (q, e) — exact draw_v semantics
                for blk in main_blocks:
                    v_f, e, q, r = draw_v_block(
                        v_f, e, q, blk, v_mu_f, v_lam_f, alpha,
                        do_sample, keys[ki], bound=draw_bound,
                    )
                    ki += 1
                    rej += r

                # relation v draws (:598-638)
                for ri, (r_lay, d) in enumerate(zip(rels, dev_rels)):
                    nb = r_lay.num_block_rows
                    q_b = q_b_list[ri]
                    mp = d["map_tr"]
                    q_dash = q - q_b[mp]  # main q out of sync (:604)
                    we = seg_sum(e, mp, nb)
                    weq = seg_sum(e * q_dash, mp, nb)
                    wc = seg_sum(q_dash, mp, nb)
                    wc_sqr = seg_sum(q_dash * q_dash, mp, nb)
                    y_old, qb_old = y_bs[ri], q_b
                    y_b = y_old
                    v_off = jax.lax.dynamic_slice_in_dim(
                        v_f, r_lay.attr_offset, r_lay.num_features
                    )
                    for blk in r_lay.blocks:
                        v_off, q_b, y_b, we, weq, r = draw_v_rel_block(
                            v_off, q_b, y_b, we, weq, wc, wc_sqr,
                            d["wnum"], blk, v_mu_f, v_lam_f, alpha,
                            do_sample, keys[ki], bound=draw_bound,
                        )
                        ki += 1
                        rej += r
                    v_f = jax.lax.dynamic_update_slice_in_dim(
                        v_f, v_off, r_lay.attr_offset, axis=0
                    )
                    # resync e and q with net deltas (:631-636)
                    e = e + (y_b - y_old)[mp] + q_dash * (q_b - qb_old)[mp]
                    q = q_dash + q_b[mp]
                    y_bs[ri] = y_b

                if n_unobs:
                    v_f, r = draw_unobserved(
                        v_f, unobserved,
                        v_lam_f[attr_group[unobserved]],
                        v_mu_f[attr_group[unobserved]],
                        do_sample, keys[ki] if ki < len(keys) else keys[-1],
                        bound=draw_bound,
                    )
                    rej += r

                vt = jax.lax.dynamic_update_slice_in_dim(
                    vt, v_f[None, :], fidx, axis=0
                )
                return (vt, e, rej, tuple(y_bs)), None

            key, kf = jax.random.split(key)
            fkeys = jax.random.split(kf, k)
            (vt, e, rej, y_bs_t), _ = jax.lax.scan(
                factor_body,
                (vt, e, rej, tuple(y_bs)),
                (jnp.arange(k, dtype=jnp.int32), fkeys),
            )
            y_bs = list(y_bs_t)

        return dict(
            state,
            w0=w0, w=w, vt=vt, alpha=alpha,
            w_mu=w_mu, w_lambda=w_lambda, v_mu=v_mu, v_lambda=v_lambda,
            e=e, y_bs=tuple(y_bs), key=key, rejected=rej,
        )

    @jax.jit
    def iteration(state, it, S):
        y_train, y_test, eval_mask = S["y_train"], S["y_test"], S["eval_mask"]
        state = draw_all(state, S)
        pred_train, pred_test, y_bs = rel_predict(
            state["w0"], state["w"], state["vt"], S
        )
        key = state["key"]
        if task == TASK_REGRESSION:
            pred_this = pred_test
            p_clamped = jnp.clip(pred_test, min_t, max_t)
            pred_sum_all = state["pred_sum_all"] + p_clamped
            pred_sum_all_but5 = state["pred_sum_all_but5"] + jnp.where(
                it >= 5, p_clamped, 0.0
            )
            ptc = jnp.clip(pred_train, min_t, max_t)
            train_err = ptc - y_train
            train_metric = jnp.sqrt(jnp.mean(train_err * train_err))
            e = pred_train - y_train
        else:
            p_test = samplers.cdf_gaussian(pred_test)
            pred_this = p_test
            pred_sum_all = state["pred_sum_all"] + p_test
            pred_sum_all_but5 = state["pred_sum_all_but5"] + jnp.where(
                it >= 5, p_test, 0.0
            )
            p_train = samplers.cdf_gaussian(pred_train)
            correct = ((p_train >= 0.5) & (y_train > 0.0)) | (
                (p_train < 0.5) & (y_train < 0.0)
            )
            train_metric = correct.astype(f).mean()
            key, k1 = jax.random.split(key)
            if do_sample:
                lat_pos = samplers.left_truncated_gaussian(k1, 0.0, pred_train, 1.0)
                lat_neg = samplers.right_truncated_gaussian(k1, 0.0, pred_train, 1.0)
            else:
                lat_pos = samplers.left_tn_expectation(pred_train)
                lat_neg = samplers.right_tn_expectation(pred_train)
            latent = jnp.where(y_train >= 0.0, lat_pos, lat_neg)
            e = pred_train - latent

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

        new_state = dict(
            state,
            e=e, y_bs=tuple(y_bs), pred_this=pred_this,
            pred_sum_all=pred_sum_all, pred_sum_all_but5=pred_sum_all_but5,
            key=key,
        )
        metrics = dict(
            train=train_metric, this=m_this, all=m_all, but5=m_but5,
            alpha=state["alpha"], rejected=state["rejected"],
            w_mu=state["w_mu"], w_lambda=state["w_lambda"],
            v_mu=state["v_mu"], v_lambda=state["v_lambda"],
        )
        if task != TASK_REGRESSION:
            from libfm_tpu.learners.mcmc import _masked_auc

            metrics["auc"] = _masked_auc(pred_sum_all, y_test, eval_mask)
        return new_state, metrics

    learner.history = []
    start_iter = 0
    if learner.checkpoint_path:
        state, start_iter = learner._maybe_restore(state)
    for it in range(start_iter, learner.num_iter):
        c0 = iter_clocks()
        state, metrics = iteration(state, jnp.asarray(it, dtype=jnp.float32), statics)
        jax.block_until_ready(state["e"])
        c1 = iter_clocks()
        learner._log_iteration(
            it, metrics, tuple(b - a for a, b in zip(c0, c1))
        )
        if (
            learner.checkpoint_path
            and learner.checkpoint_every
            and (it + 1) % learner.checkpoint_every == 0
        ):
            learner._save_checkpoint(state, it + 1)

    from libfm_tpu.learners.mcmc import MCMCState

    learner._final_state = MCMCState(
        w0=state["w0"], w=state["w"], vt=state["vt"], alpha=state["alpha"],
        w_mu=state["w_mu"], w_lambda=state["w_lambda"],
        v_mu=state["v_mu"], v_lambda=state["v_lambda"], e=state["e"],
        pred_this=state["pred_this"], pred_sum_all=state["pred_sum_all"],
        pred_sum_all_but5=state["pred_sum_all_but5"], key=state["key"],
        rejected=state["rejected"],
    )
    return learner.history
