"""Worker for the 2-process multi-host parity test (test_multihost.py).

Each process simulates one host with 4 CPU devices, joins the
jax.distributed coordination service, and trains sharded SGD over the
global 8-device mesh with per-host batch assembly — the real multi-host
code path (jax.distributed.initialize + make_array_from_callback), just
with CPU devices standing in for TPU chips.

Usage: python _multihost_worker.py <rank> <nproc> <port>
"""

import os
import sys

rank, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from libfm_tpu.parallel.multihost import (
    init_distributed,
    make_global_array,
    process_shard,
)

init_distributed(f"127.0.0.1:{port}", nproc, rank)
assert jax.process_count() == nproc, jax.process_count()
assert jax.local_device_count() == 4
assert jax.device_count() == 4 * nproc

from libfm_tpu.data.batching import batch_dataset
from libfm_tpu.data.synth import movielens_like
from libfm_tpu.models.fm import FMConfig, init_fm
from libfm_tpu.parallel.mesh import make_mesh
from libfm_tpu.parallel.sharded_sgd import (
    make_sharded_eval_step,
    make_sharded_train_step,
    pad_features_for_mesh,
)
from libfm_tpu.tasks import TASK_REGRESSION

mesh = make_mesh()  # all 8 global devices on the data axis
D = mesh.shape["data"]

train, test = movielens_like(num_users=100, num_items=80, num_ratings=6000, seed=7)
cfg = pad_features_for_mesh(
    FMConfig(num_features=train.num_features, num_factors=4, regv=0.01), mesh
)
B = 512
tb = batch_dataset(train, B)
eb = batch_dataset(test, B)

# per-host rows: this process's devices own a contiguous row range of
# every batch (the data axis is laid out in process order)
rows = process_shard(B)
row0 = rows.start


def put_batches(b):
    out = []
    for i in range(b.num_batches):
        out.append(
            (
                make_global_array((B, b.ids.shape[2]), b.ids[i, rows], row0, mesh, P("data", None)),
                make_global_array((B, b.vals.shape[2]), b.vals[i, rows], row0, mesh, P("data", None)),
                make_global_array((B,), b.y[i, rows], row0, mesh, P("data")),
                make_global_array((B,), b.row_mask[i, rows], row0, mesh, P("data")),
            )
        )
    return out


t_batches = put_batches(tb)
e_batches = put_batches(eb)

params = init_fm(cfg, jax.random.PRNGKey(1))
step = make_sharded_train_step(cfg, TASK_REGRESSION, mesh)
ev = make_sharded_eval_step(cfg, TASK_REGRESSION, mesh)
lrs = jnp.asarray([0.01, 0.01, 0.01], jnp.float32)
min_t, max_t = train.min_target, train.max_target

for it in range(3):
    for b in t_batches:
        params = step(params, *b, lrs, min_t, max_t)

sq = cnt = 0.0
for b in e_batches:
    s, _, c = ev(params, *b, min_t, max_t)
    sq += float(s)
    cnt += float(c)
rmse = float(np.sqrt(sq / max(cnt, 1.0)))
print(f"FINAL_RMSE={rmse:.6f}", flush=True)

# ---- MCMC vector engine over a 2-process (data, model) mesh ----
# the north-star config #5 shape: V row-sharded across hosts (TP) while
# A shards over data; both ranks must produce the identical trajectory
from libfm_tpu.learners.mcmc_vector import MCMCVectorLearner

tp_mesh = make_mesh(data=2, model=4)
mc = MCMCVectorLearner(
    FMConfig(num_features=train.num_features, num_factors=4),
    num_iter=3, seed=3, verbose=False, mesh=tp_mesh,
)
mc.learn(train, test)
print(f"MCMC_FINAL={mc.history[-1]['test_this']:.6f}", flush=True)

# ---- end-to-end CLI drive over the same 2-process mesh ----
trp = f"/tmp/mh{port}_{rank}.train"
tep = f"/tmp/mh{port}_{rank}.test"
train.to_libfm_text(trp)
test.to_libfm_text(tep)

import contextlib
import io

from libfm_tpu import cli

buf = io.StringIO()
with contextlib.redirect_stdout(buf):
    rc = cli.main([
        "-task", "r", "-train", trp, "-test", tep, "-method", "sgd",
        "-dim", "1,1,4", "-learn_rate", "0.01", "-iter", "2",
        "-batch_size", "512", "-mesh", "8,1", "-seed", "1",
    ])
assert rc == 0, buf.getvalue()
final = [l for l in buf.getvalue().splitlines() if l.startswith("Final")][-1]
print(f"CLI_{final}", flush=True)
