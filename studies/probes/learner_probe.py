"""Instrument SGDLearner.learn's loop: per-phase wall times + jit cache
size per iteration (a growing cache = retrace per call)."""
import json
import sys
import time

import jax

sys.path.insert(0, "/root/repo")

from libfm_tpu.data.synth import ctr_like
from libfm_tpu.learners import sgd as sgd_mod
from libfm_tpu.learners.sgd import SGDLearner
from libfm_tpu.models.fm import FMConfig
from libfm_tpu.tasks import TASK_CLASSIFICATION

train, test, _ = ctr_like(
    num_fields=13, field_cardinality=5000, num_examples=2_000_000, seed=1
)
train.binarize_targets()
test.binarize_targets()
cfg = FMConfig(num_features=train.num_features, num_factors=16,
               regv=0.01, regw=0.01)

lrn = SGDLearner(cfg, task=TASK_CLASSIFICATION, num_iter=6,
                 learn_rate=1e-4, batch_size=32768, seed=1, verbose=False)

# monkeypatch the loop's pieces with timers by wrapping learn via a
# sliced copy: easier — wrap _epoch and _eval attributes post-build.
orig_learn = lrn.learn
log = []


def learn_patched(train, test):
    import numpy as np
    from libfm_tpu.data.batching import batch_dataset
    from libfm_tpu.learners.sgd import (
        _device_arrays, _epoch_mode, make_epoch_fn, sorted_scatter_order,
    )
    import jax.numpy as jnp
    from libfm_tpu.learners import base

    self = lrn
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
    print("mode:", mode, flush=True)
    for it in range(self.num_iter):
        t0 = time.perf_counter()
        self.params = self._epoch(
            self.params, *t_arrs, *t_scatter, lrs, min_t, max_t
        )
        t1 = time.perf_counter()
        jax.block_until_ready(self.params.v)
        t2 = time.perf_counter()
        m_train = self._eval(self.params, *t_arrs, min_t, max_t)
        tr = float(m_train[0])
        t3 = time.perf_counter()
        m_test = self._eval(self.params, *e_arrs, min_t, max_t)
        te = float(m_test[0])
        t4 = time.perf_counter()
        row = dict(
            it=it,
            dispatch=round(t1 - t0, 3), block=round(t2 - t1, 3),
            ev_tr=round(t3 - t2, 3), ev_te=round(t4 - t3, 3),
            cache=self._epoch._cache_size(),
        )
        log.append(row)
        print(row, flush=True)


learn_patched(train, test)
open("/root/repo/studies/results/sgdc_learner_probe.json", "w").write(
    json.dumps(log, indent=1))
