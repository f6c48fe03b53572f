"""Device mesh + sharding layouts for FM training.

The reference is single-threaded (SURVEY.md section "Parallelism"); the
TPU framework's scaling design is original, per the BASELINE.json north
star:

- mesh axes `(data, model)`;
- examples (ids/vals/y batches) sharded over `data` (DP);
- the factor table `V[n, k]` and `w[n]` row-sharded over `model`
  (embedding-table style TP) — per-batch active-row exchange is delegated
  to XLA's SPMD partitioner, which lowers the gathers/scatters on a
  sharded table to all-gather / reduce-scatter collectives over ICI;
- scalar w0, hyperparameters and metric reductions replicated / psum'd.

Multi-host entry: call `jax.distributed.initialize()` before building the
mesh; `make_mesh` then spans all processes' devices.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int | None = None, model: int = 1, devices=None) -> Mesh:
    """Build a (data, model) mesh. Defaults: all devices on the data axis."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


def fm_shardings(mesh: Mesh):
    """Return (param_shardings, batch_shardings, replicated) for FMParams
    pytrees and (ids, vals, y, mask) batches."""
    from libfm_tpu.models.fm import FMParams

    param = FMParams(
        w0=NamedSharding(mesh, P()),
        w=NamedSharding(mesh, P("model")),
        v=NamedSharding(mesh, P("model", None)),
    )
    batch = (
        NamedSharding(mesh, P("data", None)),  # ids [B, L]
        NamedSharding(mesh, P("data", None)),  # vals [B, L]
        NamedSharding(mesh, P("data")),  # y [B]
        NamedSharding(mesh, P("data")),  # row_mask [B]
    )
    repl = NamedSharding(mesh, P())
    return param, batch, repl
