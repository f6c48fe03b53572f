"""Sharded (DP x TP) SGD training over a (data, model) mesh.

The single-device step (learners/sgd.py, restating
/root/reference/src/fm_core/fm_sgd.h:33-51) is jitted with
NamedShardings: the batch is split over `data`, the parameter tables
w/V are row-split over `model`. XLA's SPMD partitioner turns

- `params.v[ids]` into a sharded gather (all-gather of the active rows
  over ICI on the model axis),
- the `.at[ids].add` scatter into a reduce-scatter back onto the owning
  shards,
- the w0/metric reductions into psums over the data axis.

No hand-written collectives: the layout is the contract, the compiler
schedules the communication (the scaling-book recipe).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from libfm_tpu.data.batching import BatchedCSR, batch_dataset
from libfm_tpu.models.fm import FMConfig
from libfm_tpu.learners.sgd import SGDLearner, sgd_batch_update
from libfm_tpu.parallel.mesh import fm_shardings, make_mesh
from libfm_tpu.tasks import TASK_REGRESSION


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pad_features_for_mesh(cfg: FMConfig, mesh) -> FMConfig:
    """Pad the feature count so w/V shard evenly over the model axis.
    Padded rows are never referenced (feature ids < num_features)."""
    m = mesh.shape["model"]
    n_pad = _round_up(max(cfg.num_features, m), m)
    if n_pad == cfg.num_features:
        return cfg
    import dataclasses

    return dataclasses.replace(cfg, num_features=n_pad)


def make_sharded_train_step(cfg: FMConfig, task: int, mesh):
    """One jitted mini-batch SGD step with explicit input/output
    shardings over `mesh`."""
    param_sh, batch_sh, repl = fm_shardings(mesh)

    def step(params, ids, vals, y, row_mask, lrs, min_t, max_t):
        return sgd_batch_update(
            params, ids, vals, y, row_mask, cfg,
            lrs[0], lrs[1], lrs[2], task, min_t, max_t,
        )

    return jax.jit(
        step,
        in_shardings=(param_sh, *batch_sh, repl, repl, repl),
        out_shardings=param_sh,
    )


def make_sharded_eval_step(cfg: FMConfig, task: int, mesh):
    """Masked (sum_sq_err, sum_abs_err, count) partial sums for one batch;
    the caller accumulates across batches and finalises RMSE/MAE."""
    from libfm_tpu.models.fm import fm_batch_terms

    param_sh, batch_sh, repl = fm_shardings(mesh)

    def step(params, ids, vals, y, row_mask, min_t, max_t):
        pred, _ = fm_batch_terms(params, ids, vals, cfg)
        m = row_mask.astype(pred.dtype)
        if task == TASK_REGRESSION:
            err = (jnp.clip(pred, min_t, max_t) - y) * m
            return (err * err).sum(), jnp.abs(err).sum(), m.sum()
        correct = ((pred >= 0) & (y >= 0)) | ((pred < 0) & (y < 0))
        return (correct.astype(pred.dtype) * m).sum(), jnp.zeros(()), m.sum()

    return jax.jit(
        step,
        in_shardings=(param_sh, *batch_sh, repl, repl),
        out_shardings=(repl, repl, repl),
    )


class ShardedSGDLearner(SGDLearner):
    """SGD learner whose parameters and batches live sharded on a mesh.

    Differences from the single-device learner: the epoch is a Python loop
    of jitted sharded steps (one dispatch per batch — batches stay device-
    resident between steps), and batch/feature counts are padded to the
    mesh shape.
    """

    def __init__(self, cfg: FMConfig, mesh=None, **kwargs):
        self.mesh = mesh if mesh is not None else make_mesh()
        cfg = pad_features_for_mesh(cfg, self.mesh)
        super().__init__(cfg, **kwargs)
        # batch must divide evenly over the data axis
        d = self.mesh.shape["data"]
        self.batch_size = _round_up(self.batch_size, d)
        self._step = make_sharded_train_step(cfg, self.task, self.mesh)
        self._eval_step = make_sharded_eval_step(cfg, self.task, self.mesh)

    def learn(self, train, test):
        if train.relations:
            raise ValueError("relations are not supported with SGD")
        if self.params is None:
            self.init_params()
        param_sh, batch_sh, repl = fm_shardings(self.mesh)
        self.params = jax.tree.map(
            lambda x, s: _put_global(np.asarray(x), s), self.params, param_sh
        )
        self.min_target = train.min_target
        self.max_target = train.max_target

        tb = batch_dataset(train, self.batch_size)
        eb = batch_dataset(test, self.batch_size)
        t_batches = _device_put_batches(tb, batch_sh)
        e_batches = _device_put_batches(eb, batch_sh)
        lrs = jnp.asarray(self.lrs, dtype=jnp.float32)
        min_t, max_t = self.min_target, self.max_target

        from libfm_tpu.tasks import TASK_REGRESSION
        from libfm_tpu.utils.timers import iter_clocks

        history = []
        for it in range(self.num_iter):
            c0 = iter_clocks()
            for b in t_batches:
                self.params = self._step(
                    self.params, *b, lrs, min_t, max_t
                )
            jax.block_until_ready(self.params.v)
            c1 = iter_clocks()
            dt = c1[2] - c0[2]
            tr = self._eval_batches(t_batches, min_t, max_t)
            te = self._eval_batches(e_batches, min_t, max_t)
            c2 = iter_clocks()
            history.append((tr, te, dt))
            if self.verbose:
                print(f"#Iter={it:3d}\tTrain={tr:.6g}\tTest={te:.6g}")
            if self.rlog is not None:
                if self.task == TASK_REGRESSION:
                    self.rlog.log("rmse", te)
                else:
                    self.rlog.log("accuracy", te)
                self.rlog.log("rmse_train", tr)
                self.rlog.log("time_learn", c1[0] - c0[0])
                self.rlog.log("time_learn4", dt)
                self.rlog.log("time_pred", c2[0] - c1[0])
                self.rlog.new_line()
        self.history = history
        return history

    def evaluate(self, ds) -> float:
        """Sharded eval (works multi-process, unlike the parent's
        single-device jit)."""
        _, batch_sh, _ = fm_shardings(self.mesh)
        b = batch_dataset(ds, self.batch_size)
        return self._eval_batches(
            _device_put_batches(b, batch_sh), self.min_target, self.max_target
        )

    def predict(self, ds) -> np.ndarray:
        """Linked predictions over the mesh; fully-replicated outputs so
        every process holds the full vector."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from libfm_tpu.learners import base
        from libfm_tpu.models.fm import fm_batch_terms

        param_sh, batch_sh, repl = fm_shardings(self.mesh)
        b = batch_dataset(ds, self.batch_size)
        batches = _device_put_batches(b, batch_sh)
        fwd = jax.jit(
            lambda p, ids, vals: fm_batch_terms(p, ids, vals, self.cfg)[0],
            out_shardings=NamedSharding(self.mesh, P()),
        )
        preds = np.concatenate(
            [np.asarray(fwd(self.params, bt[0], bt[1])) for bt in batches]
        )[: ds.num_rows]
        return np.asarray(
            base.link_prediction(
                jnp.asarray(preds), self.task, self.min_target, self.max_target
            )
        )

    def _eval_batches(self, batches, min_t, max_t):
        sq = ab = cnt = 0.0
        for b in batches:
            s, a, c = self._eval_step(self.params, *b, min_t, max_t)
            sq, ab, cnt = sq + float(s), ab + float(a), cnt + float(c)
        cnt = max(cnt, 1.0)
        if self.task == TASK_REGRESSION:
            return float(np.sqrt(sq / cnt))
        return sq / cnt


def _put_global(np_arr, sharding):
    """Place one batch array under `sharding`, working in BOTH single-
    and multi-process runs: device_put cannot target non-addressable
    shards, so multi-process uses make_array_from_callback (each process
    materialises only the index ranges its own devices hold)."""
    if jax.process_count() == 1:
        return jax.device_put(jnp.asarray(np_arr), sharding)
    return jax.make_array_from_callback(
        np_arr.shape, sharding, lambda idx: np_arr[idx]
    )


def _device_put_batches(b: BatchedCSR, batch_sh):
    out = []
    for i in range(b.num_batches):
        out.append(
            (
                _put_global(b.ids[i], batch_sh[0]),
                _put_global(b.vals[i], batch_sh[1]),
                _put_global(b.y[i], batch_sh[2]),
                _put_global(b.row_mask[i], batch_sh[3]),
            )
        )
    return out
