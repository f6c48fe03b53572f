"""Pin the learner-loop 6x: time epoch calls alone vs interleaved with
the learner's eval calls, CTR shape. Times each call separately."""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from libfm_tpu.data.synth import ctr_like
from libfm_tpu.data.batching import batch_dataset
from libfm_tpu.learners.sgd import (
    make_epoch_fn, make_eval_fn, sorted_scatter_order, _device_arrays,
)
from libfm_tpu.models.fm import FMConfig, init_fm
from libfm_tpu.tasks import TASK_CLASSIFICATION

train, test, _ = ctr_like(
    num_fields=13, field_cardinality=5000, num_examples=2_000_000, seed=1
)
train.binarize_targets()
test.binarize_targets()
cfg = FMConfig(num_features=train.num_features, num_factors=16,
               regv=0.01, regw=0.01)
tb = batch_dataset(train, 32768)
eb = batch_dataset(test, 32768)
arrs = _device_arrays(tb)
earrs = _device_arrays(eb)
sids, perm = sorted_scatter_order(tb.ids)
scat = (jnp.asarray(sids), jnp.asarray(perm))
lrs = jnp.asarray((1e-4,) * 3, jnp.float32)
mn, mx = train.min_target, train.max_target

fn = make_epoch_fn(cfg, TASK_CLASSIFICATION, "onehot")
ev = make_eval_fn(cfg, TASK_CLASSIFICATION)
p = init_fm(cfg, jax.random.PRNGKey(1))
# warm all three programs
p = fn(p, *arrs, *scat, lrs, mn, mx); jax.block_until_ready(p.v)
float(ev(p, *arrs, mn, mx)[0]); float(ev(p, *earrs, mn, mx)[0])

res = {"epoch_alone": [], "epoch_inter": [], "ev_tr": [], "ev_te": []}
for _ in range(4):
    t0 = time.perf_counter()
    p = fn(p, *arrs, *scat, lrs, mn, mx); jax.block_until_ready(p.v)
    res["epoch_alone"].append(round(time.perf_counter() - t0, 3))
for _ in range(4):
    t0 = time.perf_counter()
    p = fn(p, *arrs, *scat, lrs, mn, mx); jax.block_until_ready(p.v)
    res["epoch_inter"].append(round(time.perf_counter() - t0, 3))
    t0 = time.perf_counter()
    float(ev(p, *arrs, mn, mx)[0])
    res["ev_tr"].append(round(time.perf_counter() - t0, 3))
    t0 = time.perf_counter()
    float(ev(p, *earrs, mn, mx)[0])
    res["ev_te"].append(round(time.perf_counter() - t0, 3))
print(res, flush=True)
open("/root/repo/studies/results/sgdc_interleave.json", "w").write(
    json.dumps(res, indent=1))
