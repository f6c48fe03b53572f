"""Downward B sweep for ML-10M pair-mode SGD (config #1): the CTR sweep
showed B=8192 beats B=32768 — was never tried below 32768 on ML."""
import json
import sys

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/studies")
import sgd_floor as sf  # noqa: E402

from libfm_tpu.models.fm import FMConfig  # noqa: E402


class _A:
    ratings = 10_000_000


from bench import _ml_data  # noqa: E402

train, _ = _ml_data(_A)
cfg = FMConfig(num_features=train.num_features, num_factors=8, regv=0.01)
rng = np.random.default_rng(0)
results = []
for B in (4096, 8192, 16384, 32768):
    stack = sf.build_stack(train, B)
    nb = stack[0].shape[0]
    fn = sf.make_variant(cfg, "pair")
    P = jnp.asarray(
        rng.standard_normal((train.num_features, 1 + cfg.num_factors)),
        jnp.float32) * 0.01
    dt, _, _ = sf.time_epoch(fn, jnp.zeros((), jnp.float32), P, stack)
    results.append(dict(B=B, nb=nb, epoch_s=round(dt, 4),
                        ms_per_batch=round(dt / nb * 1e3, 4)))
    print(results[-1], flush=True)
open("/root/repo/studies/results/ml_bsweep_down.json", "w").write(
    json.dumps(results, indent=1))
