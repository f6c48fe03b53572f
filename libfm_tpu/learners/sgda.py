"""SGDA — SGD with self-adaptive per-group regularization (WSDM 2012).

TPU-native restatement of
/root/reference/src/libfm/src/fm_learn_sgd_element_adapt_reg.h:43-360.

The algorithm alternates parameter steps on training rows with
regularization (lambda) steps on validation rows:

- theta step (sgd_theta_step, :136-169): standard FM SGD with multiplier
  2*(clamp(p)-y) (regression) or y*(sigmoid(y*p)-1) (classification) and
  shrinkage 2*lambda*theta; the per-parameter gradients are cached for the
  look-ahead step.
- lambda step (sgd_lambda_step, :201-248): predicts a validation row with
  look-ahead parameters theta' = theta - lr*(grad + 2*lambda*theta)
  (predict_scaled, :171-199), then takes a gradient step on the per-group
  lambdas, clamped at 0.

Batched here: one theta step per training mini-batch followed by one
lambda step per validation mini-batch (round-robin), with lambda steps
skipped in iteration 0 (:303). Gradient caches are dense device arrays
grad_w[n], grad_v[n,k] updated by scatter (last-write within a batch).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from libfm_tpu.data.batching import batch_dataset
from libfm_tpu.data.dataset import Dataset
from libfm_tpu.learners.sgd import SGDLearner, _device_arrays
from libfm_tpu.models.fm import FMConfig, FMParams, fm_batch_terms
from libfm_tpu.tasks import TASK_REGRESSION
from libfm_tpu.utils.timers import iter_clocks


def sgda_multiplier(pred, y, task, min_t, max_t):
    """SGDA uses 2*(p-y) for regression (adapt_reg.h:139-144), unlike
    plain SGD's (p-y)."""
    if task == TASK_REGRESSION:
        return 2.0 * (jnp.clip(pred, min_t, max_t) - y)
    return y * (jax.nn.sigmoid(y * pred) - 1.0)


class SGDALearner(SGDLearner):
    def __init__(self, cfg: FMConfig, attr_group=None, **kwargs):
        super().__init__(cfg, **kwargs)
        self.attr_group_np = (
            np.asarray(attr_group, dtype=np.int32)
            if attr_group is not None
            else np.zeros(cfg.num_features, dtype=np.int32)
        )
        self.num_groups = int(self.attr_group_np.max()) + 1

    def _register_log_fields(self):
        super()._register_log_fields()
        self.rlog.add_field("rmse_val", float("nan"))

    def _make_steps(self, lr, min_t, max_t):
        """(theta_step, lambda_step) shared by learn / learn_stream.
        Pure per-batch functions of (params, grads, regs, batch) — the
        exact adapt_reg.h math, batched."""
        cfg, f = self.cfg, self.cfg.dtype
        G, k, n = self.num_groups, cfg.num_factors, cfg.num_features
        attr_group = jnp.asarray(self.attr_group_np)
        task = self.task

        def theta_step(params, grads, regs, batch):
            ids, vals, y, rmask = batch
            reg_w, reg_v = regs
            grad_w, grad_v = grads
            pred, vsum = fm_batch_terms(params, ids, vals, cfg)
            mult = jnp.where(
                rmask, sgda_multiplier(pred, y, task, min_t, max_t), 0.0
            )
            emask = (vals != 0.0).astype(f)
            g = attr_group[ids]  # [B, L]
            # padded slots (id 0, val 0) scatter into the dummy row n
            sids = jnp.where(vals != 0.0, ids, n).reshape(-1)

            # the reference guards every layer with k0/k1
            # (adapt_reg.h:146-168): -dim 0,*,k must not drift w0/w
            new_w0 = (
                params.w0 - lr * mult.sum() if cfg.use_bias else params.w0
            )
            # w
            if cfg.use_linear:
                gw_entries = mult[:, None] * vals  # [B, L]
                grad_w = grad_w.at[sids].set(gw_entries.reshape(-1))
                w_g = params.w[ids]
                upd_w = -lr * (gw_entries + 2.0 * reg_w[g] * w_g * emask)
                new_w = params.w.at[ids.reshape(-1)].add(upd_w.reshape(-1))
            else:
                new_w = params.w
            # v
            v_g = params.v[ids]  # [B, L, k]
            gv_entries = mult[:, None, None] * (
                vals[..., None] * (vsum[:, None, :] - v_g * vals[..., None])
            )
            grad_v = grad_v.at[sids].set(gv_entries.reshape(-1, k))
            upd_v = -lr * (
                gv_entries + 2.0 * reg_v[g] * v_g * emask[..., None]
            )
            new_v = params.v.at[ids.reshape(-1)].add(upd_v.reshape(-1, k))
            return FMParams(new_w0, new_w, new_v), (grad_w, grad_v)

        def lambda_step(params, grads, regs, batch):
            ids, vals, y, rmask = batch
            reg_w, reg_v = regs
            grad_w, grad_v = grads
            g = attr_group[ids]  # [B, L]
            emask = (vals != 0.0).astype(f)
            B = ids.shape[0]

            # look-ahead params on the validation rows (predict_scaled;
            # w0 is NOT looked ahead, adapt_reg.h:171-199, and k0/k1
            # gate each layer)
            w_g = params.w[ids]
            w_dash = w_g - lr * (grad_w[ids] + 2.0 * reg_w[g] * w_g)
            v_g = params.v[ids]  # [B, L, k]
            v_dash = v_g - lr * (grad_v[ids] + 2.0 * reg_v[g] * v_g)

            vx_d = v_dash * vals[..., None]
            sum_f_dash = vx_d.sum(axis=1)  # [B, k]
            p = 0.5 * (
                (sum_f_dash**2).sum(axis=1) - (vx_d**2).sum(axis=(1, 2))
            )
            if cfg.use_bias:
                p = p + params.w0
            if cfg.use_linear:
                p = p + (w_dash * vals).sum(axis=1)
            grad_loss = jnp.where(
                rmask, sgda_multiplier(p, y, task, min_t, max_t), 0.0
            )  # [B]

            # per-row per-group sums via one-hot segment reduction
            seg = (
                jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0) * G + g
            ).reshape(-1)  # row-major [B*L] combined (row, group) index

            def row_group_sum(entry_vals):  # [B, L] -> [B, G]
                return jax.ops.segment_sum(
                    entry_vals.reshape(-1), seg, num_segments=B * G
                ).reshape(B, G)

            # w lambdas (adapt_reg.h:212-223; only with a linear layer)
            if cfg.use_linear:
                lam_w = row_group_sum(vals * w_g * emask)  # [B, G]
                lam_w_grad = -2.0 * lr * lam_w
                reg_w = reg_w - lr * (
                    grad_loss[:, None] * lam_w_grad
                ).sum(axis=0)
                reg_w = jnp.maximum(reg_w, 0.0)

            # v lambdas (adapt_reg.h:224-247)
            xv = v_g * vals[..., None]  # [B, L, k]
            xv_dash = v_dash * vals[..., None]
            sum_f_g = jax.ops.segment_sum(
                xv.reshape(-1, k), seg, num_segments=B * G
            ).reshape(B, G, k)
            sum_fdf_g = jax.ops.segment_sum(
                (xv_dash * xv).reshape(-1, k), seg, num_segments=B * G
            ).reshape(B, G, k)
            lam_v_grad = -2.0 * lr * (
                sum_f_dash[:, None, :] * sum_f_g - sum_fdf_g
            )  # [B, G, k]
            reg_v = reg_v - lr * (
                grad_loss[:, None, None] * lam_v_grad
            ).sum(axis=0)
            reg_v = jnp.maximum(reg_v, 0.0)
            return (reg_w, reg_v)

        return theta_step, lambda_step

    def learn(self, train: Dataset, test: Dataset, validation: Dataset = None):
        if train.relations or getattr(test, "relations", None) or (
            validation is not None and getattr(validation, "relations", None)
        ):
            raise ValueError(
                "relations are not supported with SGD"
            )  # parity: /root/reference/src/libfm/src/fm_learn_sgd.h:61-63
        if validation is None:
            raise ValueError("SGDA requires a validation set")
        from libfm_tpu.learners import base

        base.check_num_features(self.cfg, train, test, validation)
        if self.params is None:
            self.init_params()
        # reference resets w and regs at learn() start (adapt_reg.h:281-289)
        self.params = FMParams(
            w0=self.params.w0, w=jnp.zeros_like(self.params.w), v=self.params.v
        )
        self.min_target = train.min_target
        self.max_target = train.max_target
        cfg, f = self.cfg, self.cfg.dtype
        G, k, n = self.num_groups, cfg.num_factors, cfg.num_features

        tb = batch_dataset(train, self.batch_size)
        vb = batch_dataset(validation, self.batch_size)
        eb = batch_dataset(test, self.batch_size)
        t_arrs, v_arrs, e_arrs = map(_device_arrays, (tb, vb, eb))
        attr_group = jnp.asarray(self.attr_group_np)
        lr = jnp.asarray(self.lrs[0], dtype=f)
        min_t, max_t = self.min_target, self.max_target
        task = self.task

        reg_w = jnp.zeros((G,), f)
        reg_v = jnp.zeros((G, k), f)
        # one dummy row (index n) absorbs the padded slots' scatter
        # writes — the reference caches gradients only at real entries
        # (adapt_reg.h:150-168); letting padding overwrite grad[0] with
        # zeros would corrupt feature 0's look-ahead
        grad_w = jnp.zeros((n + 1,), f)
        grad_v = jnp.zeros((n + 1, k), f)

        nb_t, nb_v = tb.num_batches, vb.num_batches
        theta_step, lambda_step = self._make_steps(lr, min_t, max_t)

        @jax.jit
        def epoch(params, grads, regs, t_arrs, v_arrs, do_lambda):
            def body(carry, i):
                params, grads, regs = carry
                batch = tuple(a[i] for a in t_arrs)
                params, grads = theta_step(params, grads, regs, batch)

                def with_lambda(regs):
                    vbatch = tuple(a[i % nb_v] for a in v_arrs)
                    return lambda_step(params, grads, regs, vbatch)

                regs = jax.lax.cond(do_lambda, with_lambda, lambda r: r, regs)
                return (params, grads, regs), None

            (params, grads, regs), _ = jax.lax.scan(
                body, (params, grads, regs), jnp.arange(nb_t)
            )
            return params, grads, regs

        history = []
        for it in range(self.num_iter):
            c0 = iter_clocks()
            self.params, (grad_w, grad_v), (reg_w, reg_v) = epoch(
                self.params, (grad_w, grad_v), (reg_w, reg_v),
                t_arrs, v_arrs, jnp.asarray(it > 0),
            )
            jax.block_until_ready(self.params.v)
            c1 = iter_clocks()
            dt = c1[2] - c0[2]
            m_val = self._eval(self.params, *v_arrs, min_t, max_t)
            m_train = self._eval(self.params, *t_arrs, min_t, max_t)
            m_test = self._eval(self.params, *e_arrs, min_t, max_t)
            tr, te, vl = float(m_train[0]), float(m_test[0]), float(m_val[0])
            c2 = iter_clocks()
            history.append((tr, te, vl, dt))
            if self.verbose:
                print(f"#Iter={it:3d}\tTrain={tr:.6g}\tTest={te:.6g}")
            if self.rlog is not None:
                if self.task == TASK_REGRESSION:
                    self.rlog.log("rmse", te)
                else:
                    self.rlog.log("accuracy", te)
                self.rlog.log("rmse_train", tr)
                self.rlog.log("rmse_val", vl)
                self.rlog.log("time_learn", c1[0] - c0[0])
                self.rlog.log("time_learn4", dt)
                self.rlog.log("time_pred", c2[0] - c1[0])
                self.rlog.new_line()
        self.reg_w, self.reg_v = reg_w, reg_v
        self.history = history
        return history

    def learn_stream(self, stream, test: Dataset, validation=None,
                     max_nnz: int | None = None):
        """Out-of-core SGDA: the TRAIN set streams from a binary .x/.y
        pair with bounded host memory (the reference trains any learner
        straight from the LargeSparseMatrixHD cache,
        /root/reference/src/util/fmatrix.h:165-281). `validation` may be
        a resident Dataset OR a StreamingDataset: the lambda steps
        consume validation batches round-robin (adapt_reg.h:294-311), a
        strictly sequential access pattern, so a streamed validation
        reads through one bounded window cycling over the file — a
        validation set larger than host RAM works, matching the
        reference's bounded-cache construction of every Data
        (libfm.cpp:141-174). Interleaves one lambda step per train
        batch, skipping iteration 0."""
        if validation is None:
            raise ValueError("SGDA requires a validation set")
        if getattr(test, "relations", None) or getattr(
            validation, "relations", None
        ):
            raise ValueError(
                "relations are not supported with SGD"
            )  # parity: /root/reference/src/libfm/src/fm_learn_sgd.h:61-63
        if max_nnz is None:
            max_nnz = max(stream.max_row_nnz(), 1)
        from libfm_tpu.learners import base

        base.check_num_features(self.cfg, stream, test, validation)
        if self.params is None:
            self.init_params()
        # reference resets w and regs at learn() start (adapt_reg.h:281-289)
        self.params = FMParams(
            w0=self.params.w0, w=jnp.zeros_like(self.params.w),
            v=self.params.v,
        )
        self.min_target = stream.min_target
        self.max_target = stream.max_target
        f = self.cfg.dtype
        G, k, n = self.num_groups, self.cfg.num_factors, self.cfg.num_features

        from libfm_tpu.data.streaming import StreamingDataset

        val_stream = isinstance(validation, StreamingDataset)
        if val_stream:
            v_max_nnz = max(validation.max_row_nnz(), 1)

            def _val_batches():
                # round-robin over the streamed validation file, one
                # bounded window resident at a time. Recreated at each
                # epoch start: the reference resets its validation
                # iterator per iteration (adapt_reg.h:299) and wraps
                # mid-epoch (:304-307) — matching the resident path's
                # bi % nb_v indexing.
                while True:
                    empty = True
                    for vids, vvals, vy, vm in validation.iter_batches(
                        self.batch_size, v_max_nnz
                    ):
                        empty = False
                        yield (
                            jnp.asarray(vids), jnp.asarray(vvals),
                            jnp.asarray(vy), jnp.asarray(vm),
                        )
                    if empty:
                        raise ValueError("validation stream is empty")

            val_iter = None  # fresh per epoch (see the epoch loop)
            v_arrs, nb_v = None, 1
            cfg_ = self.cfg
            task_ = self.task

            @jax.jit
            def _val_sums(params, vids, vvals, vy, vm):
                # per-batch metric sums (combined host-side across the
                # streamed pass; RMSE needs global sums, not batch RMSEs)
                pred, _ = fm_batch_terms(params, vids, vvals, cfg_)
                m = vm.astype(pred.dtype)
                if task_ == TASK_REGRESSION:
                    err = (jnp.clip(pred, min_t, max_t) - vy) * m
                    return (err * err).sum(), m.sum()
                correct = ((pred >= 0) & (vy >= 0)) | ((pred < 0) & (vy < 0))
                return (correct.astype(pred.dtype) * m).sum(), m.sum()
        else:
            vb = batch_dataset(validation, self.batch_size)
            v_arrs = _device_arrays(vb)
            nb_v = vb.num_batches
            val_iter = None
        eb = batch_dataset(test, self.batch_size)
        e_arrs = _device_arrays(eb)
        lr = jnp.asarray(self.lrs[0], dtype=f)
        min_t, max_t = self.min_target, self.max_target
        theta_step, lambda_step = self._make_steps(lr, min_t, max_t)

        @jax.jit
        def step(params, grads, regs, tbatch, vbatch, do_lambda):
            params, grads = theta_step(params, grads, regs, tbatch)
            regs = jax.lax.cond(
                do_lambda,
                lambda r: lambda_step(params, grads, r, vbatch),
                lambda r: r,
                regs,
            )
            return params, grads, regs

        grads = (jnp.zeros((n + 1,), f), jnp.zeros((n + 1, k), f))
        regs = (jnp.zeros((G,), f), jnp.zeros((G, k), f))
        history = []
        for it in range(self.num_iter):
            c0 = iter_clocks()
            bi = 0
            if val_stream:
                val_iter = _val_batches()  # reset per epoch (adapt_reg.h:299)
            for ids, vals, y, m in stream.iter_batches(
                self.batch_size, max_nnz
            ):
                vbatch = (
                    next(val_iter) if val_stream
                    else tuple(a[bi % nb_v] for a in v_arrs)
                )
                self.params, grads, regs = step(
                    self.params, grads, regs,
                    (jnp.asarray(ids), jnp.asarray(vals), jnp.asarray(y),
                     jnp.asarray(m)),
                    vbatch, jnp.asarray(it > 0),
                )
                bi += 1
            jax.block_until_ready(self.params.v)
            c1 = iter_clocks()
            dt = c1[2] - c0[2]
            if it == 0 and stream.truncated_rows:
                import warnings

                warnings.warn(
                    f"learn_stream: max_nnz={max_nnz} truncated "
                    f"{stream.truncated_rows} rows; pass max_nnz=None "
                    "for the lossless default",
                    stacklevel=2,
                )
            if val_stream:
                sq = cnt = 0.0
                for vids, vvals, vy, vm in validation.iter_batches(
                    self.batch_size, v_max_nnz
                ):
                    s_, c_ = _val_sums(
                        self.params, jnp.asarray(vids), jnp.asarray(vvals),
                        jnp.asarray(vy), jnp.asarray(vm),
                    )
                    sq += float(s_)
                    cnt += float(c_)
                cnt = max(cnt, 1.0)
                vl = (
                    float(np.sqrt(sq / cnt))
                    if self.task == TASK_REGRESSION else sq / cnt
                )
            else:
                vl = float(self._eval(self.params, *v_arrs, min_t, max_t)[0])
            m_test = self._eval(self.params, *e_arrs, min_t, max_t)
            te = float(m_test[0])
            c2 = iter_clocks()
            history.append((float("nan"), te, vl, dt))
            if self.verbose:
                print(f"#Iter={it:3d}\tTest={te:.6g}")
            if self.rlog is not None:
                if self.task == TASK_REGRESSION:
                    self.rlog.log("rmse", te)
                else:
                    self.rlog.log("accuracy", te)
                self.rlog.log("rmse_val", vl)
                self.rlog.log("time_learn", c1[0] - c0[0])
                self.rlog.log("time_learn4", dt)
                self.rlog.log("time_pred", c2[0] - c1[0])
                self.rlog.new_line()
        self.reg_w, self.reg_v = regs
        self.history = history
        return history
