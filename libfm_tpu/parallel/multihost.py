"""Multi-host (multi-process) training support.

The reference is a single-process binary (SURVEY.md §2: no threads, no
MPI); multi-host scaling is a north-star capability designed here from
scratch the JAX way:

1. `init_distributed()` — one `jax.distributed.initialize` call per
   process (coordinator + rank from env or explicit args). After it,
   `jax.devices()` spans ALL processes and a Mesh built over them gives
   global SPMD: the same `NamedSharding` annotations used single-host
   drive ICI+DCN collectives across hosts.
2. `process_shard()` + `make_global_array()` — per-process data
   loading: `process_shard(num_rows)` is the contiguous row range this
   process owns; `make_global_array` assembles the global jax.Array
   from that local slab via `jax.make_array_from_callback`, so no host
   ever materialises remote rows.

Env contract (set by the launcher, e.g. one per host):
    LIBFM_COORDINATOR  host:port of process 0 (default 127.0.0.1:9731)
    LIBFM_NUM_PROCS    total process count
    LIBFM_PROC_ID      this process's rank in [0, LIBFM_NUM_PROCS)
If LIBFM_NUM_PROCS is unset, `jax.distributed.initialize()` falls back
to auto-detection (TPU pod metadata / SLURM).
"""

from __future__ import annotations

import os

import numpy as np

import jax


def init_distributed(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize the JAX distributed runtime for this process."""
    coordinator = coordinator or os.environ.get("LIBFM_COORDINATOR")
    if num_processes is None and "LIBFM_NUM_PROCS" in os.environ:
        num_processes = int(os.environ["LIBFM_NUM_PROCS"])
    if process_id is None and "LIBFM_PROC_ID" in os.environ:
        process_id = int(os.environ["LIBFM_PROC_ID"])
    if num_processes is None:
        jax.distributed.initialize()  # auto-detect (TPU pod / SLURM)
        return
    jax.distributed.initialize(
        coordinator_address=coordinator or "127.0.0.1:9731",
        num_processes=num_processes,
        process_id=process_id or 0,
    )


def process_shard(num_rows: int) -> slice:
    """The contiguous row range this process owns under an even split of
    the data axis across processes (per-host data loading: each host
    reads only its slice of the training file)."""
    p, np_ = jax.process_index(), jax.process_count()
    per = (num_rows + np_ - 1) // np_
    return slice(p * per, min((p + 1) * per, num_rows))


def make_global_array(
    global_shape, local_np: np.ndarray, row0: int, mesh, pspec
) -> jax.Array:
    """Assemble a global jax.Array whose rows this process only holds for
    the slab local_np = global[row0 : row0 + len(local_np)].

    `make_array_from_callback` invokes the callback only for the shard
    indices THIS process's devices own, so as long as the mesh's `data`
    axis is laid out so each process owns a contiguous row range (the
    `make_mesh` default: devices in process order), no host ever
    materialises remote rows.
    """
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, pspec)

    def cb(index):
        r = index[0]
        start = 0 if r.start is None else r.start
        stop = global_shape[0] if r.stop is None else r.stop
        if start < row0 or stop > row0 + len(local_np):
            # a negative python slice start would silently wrap — the
            # mesh's data axis must give this process a contiguous row
            # range covering every shard its devices own
            raise ValueError(
                f"device shard rows [{start}, {stop}) fall outside this "
                f"process's slab [{row0}, {row0 + len(local_np)}); check "
                "process_shard/mesh process ordering"
            )
        # the row slice must be joined with the trailing-dim index in ONE
        # tuple — applying index[1:] to the sliced array would re-index
        # axis 0
        return local_np[
            (slice(start - row0, stop - row0),) + tuple(index[1:])
        ]

    return jax.make_array_from_callback(tuple(global_shape), sharding, cb)
