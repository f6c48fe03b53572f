"""Which half owns the 6x: the shipping epoch fn, or the learner loop?
Times make_epoch_fn(cfg, task, 'onehot') exactly as the study does, for
classification and regression, and the full SGDLearner.learn loop."""
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
    SGDLearner, make_epoch_fn, sorted_scatter_order, _device_arrays,
)
from libfm_tpu.models.fm import FMConfig, FMParams, init_fm
from libfm_tpu.tasks import TASK_CLASSIFICATION, TASK_REGRESSION

train, test, _ = ctr_like(
    num_fields=13, field_cardinality=5000, num_examples=2_000_000, seed=1
)
train.binarize_targets()
test.binarize_targets()
cfg = FMConfig(num_features=train.num_features, num_factors=16,
               regv=0.01, regw=0.01)
tb = batch_dataset(train, 32768)
arrs = _device_arrays(tb)
sids, perm = sorted_scatter_order(tb.ids)
scat = (jnp.asarray(sids), jnp.asarray(perm))
lrs = jnp.asarray((1e-4,) * 3, jnp.float32)
res = {}

for name, task in (("cls", TASK_CLASSIFICATION), ("reg", TASK_REGRESSION)):
    fn = make_epoch_fn(cfg, task, "onehot")
    params = init_fm(cfg, jax.random.PRNGKey(1))
    p = fn(params, *arrs, *scat, lrs, train.min_target, train.max_target)
    jax.block_until_ready(p.v)
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        p = fn(p, *arrs, *scat, lrs, train.min_target, train.max_target)
        jax.block_until_ready(p.v)
        ts.append(time.perf_counter() - t0)
    res[f"ship_fn_{name}_s"] = round(float(np.median(ts)), 4)
    print(name, res[f"ship_fn_{name}_s"], flush=True)

# full learner loop, 4 epochs, report per-epoch dt list
lrn = SGDLearner(cfg, task=TASK_CLASSIFICATION, num_iter=4,
                 learn_rate=1e-4, batch_size=32768, seed=1, verbose=False)
lrn.learn(train, test)
res["learner_dts"] = [round(h[2], 4) for h in lrn.history]
print(res, flush=True)
open("/root/repo/studies/results/sgdc_repro.json", "w").write(
    json.dumps(res, indent=1))
