"""Mini-batch SGD learner.

TPU-native restatement of the reference element-wise SGD
(/root/reference/src/libfm/src/fm_learn_sgd_element.h:48-78 and the
fm_SGD update kernel /root/reference/src/fm_core/fm_sgd.h:33-51):

- per-example multiplier: regression `clamp(p) - y`
  (fm_learn_sgd_element.h:60-62), classification
  `-y * (1 - sigmoid(y*p))` (line 64);
- updates: w0 -= lr*(mult + reg0*w0); w_i -= lr*(mult*x_i + regw*w_i);
  v_if -= lr*(mult*(vsum_f*x_i - v_if*x_i^2) + regv*v_if)
  (fm_sgd.h:36-50).

Instead of a serial pass over rows, examples are processed in padded
mini-batches: all multipliers in a batch are computed from the same
parameter snapshot and the per-entry updates are scatter-added. With
batch_size=1 this reproduces the reference's sequential updates exactly
(including regularising only the features present in the example); with
larger batches it is standard sum-reduced mini-batch SGD. The whole epoch
runs as one jitted lax.scan over batches so no host round-trips occur.

Per-layer learn rates (`-learn_rate r0,r1,r2`) follow
/root/reference/src/libfm/libfm.cpp:386-404.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from libfm_tpu.data.batching import BatchedCSR, batch_dataset
from libfm_tpu.data.dataset import Dataset
from libfm_tpu.learners import base
from libfm_tpu.models.fm import FMConfig, FMParams, fm_batch_terms, init_fm
from libfm_tpu.tasks import TASK_REGRESSION
from libfm_tpu.utils.timers import iter_clocks


def sgd_multiplier(pred, y, task: int, min_target, max_target):
    if task == TASK_REGRESSION:
        p = jnp.clip(pred, min_target, max_target)
        return p - y
    # classification: -y * (1 - sigmoid(y * p))
    return -y * (1.0 - jax.nn.sigmoid(y * pred))


def sgd_batch_update(
    params: FMParams,
    ids,
    vals,
    y,
    row_mask,
    cfg: FMConfig,
    lr0,
    lr1,
    lr2,
    task: int,
    min_target,
    max_target,
):
    """One mini-batch SGD step; returns updated params."""
    pred, vsum = fm_batch_terms(params, ids, vals, cfg)
    mult = sgd_multiplier(pred, y, task, min_target, max_target)
    mult = jnp.where(row_mask, mult, 0.0)  # padded rows contribute nothing

    entry_mask = (vals != 0.0).astype(vals.dtype)  # [B, L]

    new_w0 = params.w0
    if cfg.use_bias:
        # reference applies reg0 per example; sum over the batch
        n_real = row_mask.sum().astype(vals.dtype)
        new_w0 = params.w0 - lr0 * (mult.sum() + n_real * cfg.reg0 * params.w0)

    new_w = params.w
    if cfg.use_linear:
        w_g = params.w[ids]  # [B, L]
        gw = mult[:, None] * vals + cfg.regw * w_g * entry_mask
        new_w = params.w.at[ids.reshape(-1)].add(
            (-lr1 * gw).reshape(-1), indices_are_sorted=False, unique_indices=False
        )

    v_g = params.v[ids]  # [B, L, k]
    # grad_v_if = mult * (vsum_f * x_i - v_if * x_i^2)   (fm_sgd.h:47)
    gv = mult[:, None, None] * (
        vsum[:, None, :] * vals[..., None] - v_g * (vals * vals)[..., None]
    ) + cfg.regv * v_g * entry_mask[..., None]
    new_v = params.v.at[ids.reshape(-1)].add(
        (-lr2 * gv).reshape(-1, params.v.shape[1]),
        indices_are_sorted=False,
        unique_indices=False,
    )
    return FMParams(w0=new_w0, w=new_w, v=new_v)


def make_epoch_fn(cfg: FMConfig, task: int, mode: str = "general"):
    """Build a jitted epoch function over a BatchedCSR stack.

    The scan body works on a PACKED parameter table P = [w | V] ([n,
    1+k]) so each mini-batch costs ONE row gather + ONE row scatter
    instead of two of each. Measured TPU optimizations
    (studies/sgd_floor.py + BENCHNOTES "SGD scatter pipeline"):

    - all per-entry math runs TRANSPOSED, [1+k, B*L], so the batch dim
      sits in VPU lanes — the natural [B, L, 1+k] orientation leaves
      ~9/128 lanes live and ran ~2.4x slower end to end;
    - the scatter indices are pre-sorted on the host once per batch
      stack (ids are static across epochs) and the updates permuted
      inside the jit, so XLA's scatter lowering skips its per-batch
      bitonic sort (`indices_are_sorted=True`);
    - `mode` specializations chosen by the learner from the (static)
      batch stack — "pair": L == 2 with all values 1 (the one-hot
      recommender shape) collapses the pairwise trick to
      pred = w0 + w_u + w_i + v_u.v_i and grad_v_u = mult * v_i
      (0.325 -> 0.244 s/epoch at ML-10M k=8); "onehot": values all 1
      at general L drops every x-multiply and the entry mask.

    Same math as sgd_batch_update (exact fm_sgd.h formulas) up to f32
    rounding: the scatter summation order for duplicate features, and
    in "pair" mode the product form of the interaction (the pairwise
    trick's 0.5[(v_u+v_i)^2 - v_u^2 - v_i^2] rounds differently from
    the direct v_u.v_i it equals algebraically).
    """
    k = cfg.num_factors

    def pair_step(w0, P, ids, vals, y, row_mask, sids, perm,
                  lrs, min_t, max_t):
        B, L = vals.shape
        E = B * L
        rows = P[ids.reshape(-1)]                     # [E, 1+k]
        rT = rows.reshape(B, L, 1 + k).transpose(2, 1, 0)  # [1+k, 2, B]
        w2 = rT[0]                                    # [2, B]
        v2 = rT[1:]                                   # [k, 2, B]
        pred = (v2[:, 0] * v2[:, 1]).sum(axis=0)
        if cfg.use_linear:
            pred = pred + w2.sum(axis=0)
        if cfg.use_bias:
            pred = pred + w0
        mult = sgd_multiplier(pred, y, task, min_t, max_t)
        mult = jnp.where(row_mask, mult, 0.0)         # [B]
        # padded rows gather feature 0: mask their regularizer terms
        mask = row_mask.astype(vals.dtype)[None, :]   # [1, B]
        if cfg.use_bias:
            n_real = row_mask.sum().astype(vals.dtype)
            w0 = w0 - lrs[0] * (mult.sum() + n_real * cfg.reg0 * w0)
        if cfg.use_linear:
            gw = mult[None, :] + cfg.regw * w2 * mask
        else:
            gw = jnp.zeros_like(w2)
        gv = mult * v2[:, ::-1] + cfg.regv * v2 * mask[None]
        upd = jnp.concatenate(
            [(-lrs[1] * gw)[None], -lrs[2] * gv], axis=0
        )  # [1+k, 2, B]
        upd_rows = upd.transpose(2, 1, 0).reshape(E, 1 + k)
        P = P.at[sids].add(upd_rows[perm], indices_are_sorted=True)
        return w0, P

    def packed_step(w0, P, ids, vals, y, row_mask, sids, perm,
                    lrs, min_t, max_t):
        B, L = vals.shape
        E = B * L
        onehot = mode == "onehot"
        rows = P[ids.reshape(-1)]        # [E, 1+k] — the single gather
        rT = rows.T                      # [1+k, E]: entries in lanes
        vT = vals.reshape(1, E)
        w_g = rT[0]                      # [E]
        v_g = rT[1:]                     # [k, E]
        vx = v_g if onehot else v_g * vT
        vsB = vx.reshape(k, B, L).sum(axis=2)       # [k, B]
        pred = 0.5 * (
            (vsB * vsB).sum(axis=0)
            - (vx * vx).reshape(k, B, L).sum(axis=(0, 2))
        )
        if cfg.use_linear:
            pred = pred + (
                w_g.reshape(B, L).sum(axis=1)
                if onehot
                else (w_g * vT[0]).reshape(B, L).sum(axis=1)
            )
        if cfg.use_bias:
            pred = pred + w0
        mult = sgd_multiplier(pred, y, task, min_t, max_t)
        mult = jnp.where(row_mask, mult, 0.0)       # [B]
        mE = jnp.repeat(mult, L)                    # [E]
        # one-hot stacks have no partial-row padding beyond masked rows,
        # whose multiplier is already zero; their reg terms mask by row
        emask = (
            jnp.repeat(row_mask, L).astype(vals.dtype)[None]
            if onehot
            else (vT != 0.0).astype(vals.dtype)
        )  # [1, E]

        if cfg.use_bias:
            n_real = row_mask.sum().astype(vals.dtype)
            w0 = w0 - lrs[0] * (mult.sum() + n_real * cfg.reg0 * w0)
        if cfg.use_linear:
            gw = (mE if onehot else mE * vT[0]) + cfg.regw * w_g * emask[0]
        else:
            gw = jnp.zeros((E,), vals.dtype)
        vsum = jnp.repeat(vsB, L, axis=1)           # [k, E]
        gv = (
            mE * (vsum - v_g)
            if onehot
            else mE * (vsum * vT - v_g * (vT * vT))
        ) + cfg.regv * v_g * emask
        upd = jnp.concatenate(
            [(-lrs[1] * gw)[None], -lrs[2] * gv], axis=0
        )  # [1+k, E]
        # permute updates into the pre-sorted scatter order
        P = P.at[sids].add(upd.T[perm], indices_are_sorted=True)
        return w0, P

    if mode == "pair":
        packed_step = pair_step

    def epoch(params, ids, vals, y, row_mask, sids, perm, lrs, min_t, max_t):
        P = jnp.concatenate([params.w[:, None], params.v], axis=1)

        def body(carry, batch):
            w0, P = carry
            b_ids, b_vals, b_y, b_mask, b_sids, b_perm = batch
            w0, P = packed_step(
                w0, P, b_ids, b_vals, b_y, b_mask, b_sids, b_perm,
                lrs, min_t, max_t,
            )
            return (w0, P), None

        (w0, P), _ = jax.lax.scan(
            body, (params.w0, P), (ids, vals, y, row_mask, sids, perm)
        )
        return FMParams(w0=w0, w=P[:, 0], v=P[:, 1:])

    return jax.jit(epoch)


def _epoch_mode(train: Dataset, tb: BatchedCSR) -> str:
    """Pick the epoch specialization from the STATIC batch stack:
    "pair" for uniform 2-entry one-hot rows (the recommender shape),
    "onehot" for uniform-L one-hot rows, else "general". Measured on
    ML-10M k=8 (studies/sgd_floor.py): pair 0.325 -> 0.244 s/epoch."""
    lengths = np.diff(train.indptr)
    L = tb.ids.shape[2]
    uniform = lengths.size > 0 and int(lengths.min()) == int(
        lengths.max()
    ) == L
    if not uniform:
        return "general"
    if not (train.vals == 1.0).all():
        return "general"
    return "pair" if L == 2 else "onehot"


def sorted_scatter_order(ids: np.ndarray):
    """Host-side, once per batch stack: per-batch stable argsort of the
    flattened scatter ids. Returns (sorted_ids [NB, E], perm [NB, E])."""
    nb = ids.shape[0]
    E = ids.shape[1] * ids.shape[2]
    flat = np.ascontiguousarray(ids).reshape(nb, E)
    perm = np.argsort(flat, axis=1, kind="stable").astype(np.int32)
    sids = np.take_along_axis(flat, perm, axis=1)
    return sids, perm


def make_eval_fn(cfg: FMConfig, task: int):
    def evaluate(params, ids, vals, y, row_mask, min_t, max_t):
        def body(carry, batch):
            b_ids, b_vals, b_y, b_mask = batch
            pred, _ = fm_batch_terms(params, b_ids, b_vals, cfg)
            m = b_mask.astype(pred.dtype)
            if task == TASK_REGRESSION:
                p = jnp.clip(pred, min_t, max_t)
                err = (p - b_y) * m
                sq, ab = (err * err).sum(), jnp.abs(err).sum()
            else:
                correct = ((pred >= 0) & (b_y >= 0)) | ((pred < 0) & (b_y < 0))
                sq, ab = (correct.astype(pred.dtype) * m).sum(), jnp.zeros(())
            cnt = m.sum()
            return (carry[0] + sq, carry[1] + ab, carry[2] + cnt), None

        (sq, ab, cnt), _ = jax.lax.scan(
            body, (jnp.zeros(()), jnp.zeros(()), jnp.zeros(())),
            (ids, vals, y, row_mask),
        )
        cnt = jnp.maximum(cnt, 1.0)
        if task == TASK_REGRESSION:
            return jnp.sqrt(sq / cnt), ab / cnt  # rmse, mae
        return sq / cnt, ab  # accuracy, 0

    return jax.jit(evaluate)


class SGDLearner:
    """Driver for mini-batch SGD training.

    With batch_size=1 this is the reference algorithm exactly; larger
    batches trade per-step fidelity for TPU throughput (reference prints
    "DON'T FORGET TO SHUFFLE" for the same reason —
    fm_learn_sgd_element.h:51; use Dataset.shuffled()).
    """

    def __init__(
        self,
        cfg: FMConfig,
        task: int = TASK_REGRESSION,
        num_iter: int = 100,
        learn_rate: float = 0.1,
        learn_rates: tuple | None = None,
        batch_size: int = 1024,
        seed: int = 1,
        rlog=None,
        verbose: bool = True,
    ):
        self.cfg = cfg
        self.task = task
        self.num_iter = num_iter
        self.lrs = tuple(learn_rates) if learn_rates else (learn_rate,) * 3
        self.batch_size = batch_size
        self.seed = seed
        self.rlog = rlog
        self.verbose = verbose
        self.params: FMParams | None = None
        self.min_target = 0.0
        self.max_target = 0.0
        self._epoch = make_epoch_fn(cfg, task)
        self._epoch_mode_built = "general"
        self._eval = make_eval_fn(cfg, task)
        if rlog is not None:
            self._register_log_fields()

    def _register_log_fields(self):
        nan = float("nan")
        if self.task == TASK_REGRESSION:
            self.rlog.add_field("rmse", nan)
            self.rlog.add_field("mae", nan)
        else:
            self.rlog.add_field("accuracy", nan)
        for f in ("time_pred", "time_learn", "time_learn2", "time_learn4"):
            self.rlog.add_field(f, nan)
        self.rlog.add_field("rmse_train", nan)

    def init_params(self, params: FMParams | None = None):
        if params is None:
            params = init_fm(self.cfg, jax.random.PRNGKey(self.seed))
        self.params = params
        return params

    def learn(self, train: Dataset, test: Dataset):
        if train.relations or getattr(test, "relations", None):
            raise ValueError(
                "relations are not supported with SGD"
            )  # parity: /root/reference/src/libfm/src/fm_learn_sgd.h:61-63
        base.check_num_features(self.cfg, train, test)
        if self.params is None:
            self.init_params()
        self.min_target = train.min_target
        self.max_target = train.max_target

        tb = batch_dataset(train, self.batch_size)
        eb = batch_dataset(test, self.batch_size)
        mode = _epoch_mode(train, tb)
        if mode != self._epoch_mode_built:
            self._epoch = make_epoch_fn(self.cfg, self.task, mode)
            self._epoch_mode_built = mode
        t_arrs = _device_arrays(tb)
        e_arrs = _device_arrays(eb)
        sids, perm = sorted_scatter_order(tb.ids)
        t_scatter = (jnp.asarray(sids), jnp.asarray(perm))
        lrs = jnp.asarray(self.lrs, dtype=jnp.float32)
        min_t, max_t = self.min_target, self.max_target

        history = []
        for it in range(self.num_iter):
            c0 = iter_clocks()
            self.params = self._epoch(
                self.params, *t_arrs, *t_scatter, lrs, min_t, max_t
            )
            jax.block_until_ready(self.params.v)
            c1 = iter_clocks()
            dt = c1[2] - c0[2]
            m_train = self._eval(self.params, *t_arrs, min_t, max_t)
            m_test = self._eval(self.params, *e_arrs, min_t, max_t)
            tr, te = float(m_train[0]), float(m_test[0])
            c2 = iter_clocks()
            history.append((tr, te, dt))
            if self.verbose:
                print(f"#Iter={it:3d}\tTrain={tr:.6g}\tTest={te:.6g}")
            if self.rlog is not None:
                if self.task == TASK_REGRESSION:
                    self.rlog.log("rmse", te)
                    self.rlog.log("mae", float(m_test[1]))
                else:
                    self.rlog.log("accuracy", te)
                self.rlog.log("rmse_train", tr)
                # reference SGD logs user-CPU learn time and eval time
                # (fm_learn_sgd_element.h:55-74, fm_learn.h:126,149);
                # time_learn2 is the clock() analog (process-CPU) and
                # time_learn4 records wall seconds (the meaningful
                # quantity when the work runs on a device)
                self.rlog.log("time_learn", c1[0] - c0[0])
                self.rlog.log("time_learn2", c1[1] - c0[1])
                self.rlog.log("time_learn4", dt)
                self.rlog.log("time_pred", c2[0] - c1[0])
                self.rlog.new_line()
        self.history = history
        return history

    def learn_stream(self, stream, test: Dataset, max_nnz: int | None = None):
        """Out-of-core SGD: one pass per iteration over a
        StreamingDataset (bounded host memory), jitted step per batch.
        The reference's analog is training straight from the
        LargeSparseMatrixHD cache (/root/reference/src/util/fmatrix.h:
        165-281).

        max_nnz defaults to the stream's true max row length (lossless);
        passing a smaller value truncates long rows, which is reported
        via a warning with drop counts."""
        if max_nnz is None:
            max_nnz = max(stream.max_row_nnz(), 1)
        base.check_num_features(self.cfg, stream, test)
        if self.params is None:
            self.init_params()
        self.min_target = stream.min_target
        self.max_target = stream.max_target
        eb = batch_dataset(test, self.batch_size)
        e_arrs = _device_arrays(eb)
        lrs = jnp.asarray(self.lrs, dtype=jnp.float32)
        min_t, max_t = self.min_target, self.max_target
        step = jax.jit(
            lambda p, ids, vals, y, m: sgd_batch_update(
                p, ids, vals, y, m, self.cfg,
                lrs[0], lrs[1], lrs[2], self.task, min_t, max_t,
            )
        )
        history = []
        for it in range(self.num_iter):
            c0 = iter_clocks()
            for ids, vals, y, m in stream.iter_batches(self.batch_size, max_nnz):
                self.params = step(
                    self.params, jnp.asarray(ids), jnp.asarray(vals),
                    jnp.asarray(y), jnp.asarray(m),
                )
            jax.block_until_ready(self.params.v)
            c1 = iter_clocks()
            dt = c1[2] - c0[2]
            if it == 0 and stream.truncated_rows:
                import warnings

                warnings.warn(
                    f"learn_stream: max_nnz={max_nnz} truncated "
                    f"{stream.truncated_rows} rows "
                    f"({stream.truncated_entries} entries dropped); "
                    "pass max_nnz=None for the lossless default",
                    stacklevel=2,
                )
            m_test = self._eval(self.params, *e_arrs, min_t, max_t)
            te = float(m_test[0])
            c2 = iter_clocks()
            history.append((float("nan"), te, dt))
            if self.verbose:
                print(f"#Iter={it:3d}\tTest={te:.6g}")
            if self.rlog is not None:
                if self.task == TASK_REGRESSION:
                    self.rlog.log("rmse", te)
                    self.rlog.log("mae", float(m_test[1]))
                else:
                    self.rlog.log("accuracy", te)
                self.rlog.log("time_learn", c1[0] - c0[0])
                self.rlog.log("time_learn2", c1[1] - c0[1])
                self.rlog.log("time_learn4", dt)
                self.rlog.log("time_pred", c2[0] - c1[0])
                self.rlog.new_line()
        self.history = history
        return history

    def evaluate(self, ds: Dataset) -> float:
        if getattr(ds, "relations", None):
            raise ValueError(
                "relations are not supported with SGD"
            )  # parity: fm_learn_sgd.h:61-63 (batching would silently
            # drop the block features otherwise)
        b = batch_dataset(ds, self.batch_size)
        m = self._eval(self.params, *_device_arrays(b), self.min_target, self.max_target)
        return float(m[0])

    def predict(self, ds: Dataset) -> np.ndarray:
        """Linked predictions (clamped / sigmoid):
        /root/reference/src/libfm/src/fm_learn_sgd.h:76-90."""
        if getattr(ds, "relations", None):
            raise ValueError(
                "relations are not supported with SGD"
            )  # parity: fm_learn_sgd.h:61-63
        b = batch_dataset(ds, self.batch_size)
        ids, vals, _, _ = _device_arrays(b)

        @jax.jit
        def fwd(params, ids, vals):
            def body(_, batch):
                pred, _ = fm_batch_terms(params, batch[0], batch[1], self.cfg)
                return None, pred

            _, preds = jax.lax.scan(body, None, (ids, vals))
            return preds

        preds = np.asarray(fwd(self.params, ids, vals)).reshape(-1)[: ds.num_rows]
        return np.asarray(
            base.link_prediction(
                jnp.asarray(preds), self.task, self.min_target, self.max_target
            )
        )


def _device_arrays(b: BatchedCSR):
    return (
        jnp.asarray(b.ids),
        jnp.asarray(b.vals),
        jnp.asarray(b.y),
        jnp.asarray(b.row_mask),
    )
