"""Bisect the CTR SGD epoch (60 ms/batch?!): which stage dominates at
the L=13, k=16, n=65K shape."""
import json
import sys

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/studies")
import sgd_floor as sf  # noqa: E402

from libfm_tpu.data.synth import ctr_like  # noqa: E402
from libfm_tpu.models.fm import FMConfig  # noqa: E402

train, test, _ = ctr_like(
    num_fields=13, field_cardinality=5000, num_examples=1_800_000, seed=1
)
train.binarize_targets()
cfg = FMConfig(num_features=train.num_features, num_factors=16,
               regv=0.01, regw=0.01)
n = train.num_features
rng = np.random.default_rng(0)
results = []
for B in (8192, 32768, 65536):
    stack = sf.build_stack(train, B)
    nb = stack[0].shape[0]
    variants = (
        ["onehot"] if B != 32768
        else ["dispatch", "gather_only", "scatteronly", "mathfwd",
              "noscatter", "full", "onehot"]
    )
    for variant in variants:
        fn = sf.make_variant(cfg, variant)
        P = jnp.asarray(
            rng.standard_normal((n, 1 + cfg.num_factors)), jnp.float32
        ) * 0.01
        dt, _, _ = sf.time_epoch(fn, jnp.zeros((), jnp.float32), P, stack)
        results.append(dict(B=B, nb=nb, variant=variant,
                            epoch_s=round(dt, 4),
                            ms_per_batch=round(dt / nb * 1e3, 4)))
        print(results[-1], flush=True)
open("/root/repo/studies/results/sgdc_bisect.json", "w").write(
    json.dumps(results, indent=1))
