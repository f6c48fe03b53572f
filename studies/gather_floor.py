"""Random-row gather/scatter strategies on TPU: measure the floor.

The measured ~45 ns/row random-row gather/scatter floor (BENCHNOTES
"SGD config #1 floor proof") bottlenecks two workloads: the SGD packed
epoch (2 row ops/entry) and the BS cache build (42.5 ms of a 189 ms
iteration). This study measures candidate strategies on the real chip
so any kernel work is chosen by evidence.

Methodology note (important on this box): the axon tunnel's
`jax.block_until_ready` does NOT reliably synchronize independent
repeated dispatches of the same computation, and a host fetch costs a
~25-29 ms RTT. Every timing below therefore runs REPS chained
iterations inside ONE jitted fori_loop (each rep's input depends on the
previous rep's output, and the index vector is rotated per rep so no
two reps are CSE-identical), fetches one scalar at the end, and
subtracts the measured RTT once.

Usage: python studies/gather_floor.py
"""

import functools
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

REPS = 10


def sync_time(fn, *args, iters=3):
    """Median wall time of fn(*args) synchronized by a scalar fetch."""
    outs = []
    float(fn(*args))  # compile
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


@jax.jit
def _trivial(x):
    return x + 1.0


def tunnel_rtt():
    return sync_time(_trivial, jnp.zeros(()))


# ---------------------------------------------------------------- XLA
@functools.partial(jax.jit, static_argnums=(2,))
def gather_chain(A, ids, reps):
    """reps chained gathers; ids rotated by r each rep to defeat CSE."""
    n = A.shape[0]

    def body(r, acc):
        rows = A[(ids + r) % n]
        return acc + rows.sum()

    return jax.lax.fori_loop(0, reps, body, jnp.zeros((), jnp.float32))


@functools.partial(jax.jit, static_argnums=(2,))
def gather_block_sum_chain(A, ids2d, reps):
    """BS cache-build consumer: [nb, Lb] ids -> per-block sums."""
    n = A.shape[0]

    def body(r, acc):
        rows = A[(ids2d + r) % n]         # [nb, Lb, K]
        return acc + rows.sum(axis=1).sum()

    return jax.lax.fori_loop(0, reps, body, jnp.zeros((), jnp.float32))


@functools.partial(jax.jit, static_argnums=(2,))
def scatter_add_chain(A, ids, reps):
    n = A.shape[0]
    upd = jnp.ones((ids.shape[0], A.shape[1]), A.dtype)

    def body(r, A):
        return A.at[(ids + r) % n].add(upd)

    out = jax.lax.fori_loop(0, reps, body, A)
    return out.sum()


@functools.partial(jax.jit, static_argnums=(2, 3))
def onehot_gather_chain(A, ids, reps, dtype_name):
    n = A.shape[0]
    dt = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    Ad = A.astype(dt)

    def body(r, acc):
        oh = jax.nn.one_hot((ids + r) % n, n, dtype=dt)
        rows = jax.lax.dot_general(
            oh, Ad, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc + rows.sum()

    return jax.lax.fori_loop(0, reps, body, jnp.zeros((), jnp.float32))


def bench_shape(name, N, K, R, results, rtt, with_onehot=True,
                block_lb=None):
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((N, K)), jnp.float32)
    ids_np = rng.integers(0, N, R).astype(np.int32)
    ids = jnp.asarray(ids_np)
    ids_sorted = jnp.asarray(np.sort(ids_np))

    def rec(strategy, dt_total):
        dt = (dt_total - rtt) / REPS
        ns = dt / R * 1e9
        results.append(
            dict(shape=name, N=N, K=K, R=R, strategy=strategy,
                 ms=round(dt * 1e3, 3), ns_per_row=round(ns, 2))
        )
        print(f"  {name:12s} {strategy:14s} {dt*1e3:9.3f} ms  "
              f"{ns:7.2f} ns/row", flush=True)

    rec("gather", sync_time(gather_chain, A, ids, REPS))
    rec("gather_sorted", sync_time(gather_chain, A, ids_sorted, REPS))
    rec("scatter_add", sync_time(scatter_add_chain, A, ids, REPS))
    rec("scatter_sorted", sync_time(scatter_add_chain, A, ids_sorted, REPS))

    if block_lb:  # BS layout: [nb, Lb] grouped ids, and sorted-in-row
        nb = R // block_lb
        ids2d = ids_np[: nb * block_lb].reshape(nb, block_lb)
        rec("gblock", sync_time(
            gather_block_sum_chain, A, jnp.asarray(ids2d), REPS))
        rec("gblock_sorted", sync_time(
            gather_block_sum_chain, A, jnp.asarray(np.sort(ids2d, axis=1)),
            REPS))

    if with_onehot:
        for dt_name in ("f32", "bf16"):
            try:
                rec(f"onehot_{dt_name}", sync_time(
                    onehot_gather_chain, A, ids, REPS, dt_name))
            except Exception as e:
                print(f"  {name:12s} onehot_{dt_name}   failed: "
                      f"{type(e).__name__}")


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rtt = tunnel_rtt()
    print(f"tunnel RTT: {rtt*1e3:.2f} ms", flush=True)
    results = []
    # SGD packed-epoch shape (ML-10M: 82K features, packed [w|V] k=8)
    bench_shape("sgd_k8", 82_000, 9, 65_536, results, rtt)
    # lane-padded row (does physical row width change the rate?)
    bench_shape("sgd_k8_p16", 82_000, 16, 65_536, results, rtt)
    # tiny table: does the floor depend on table size at all?
    bench_shape("tiny_k8", 8_192, 9, 65_536, results, rtt)
    # SGD k=64 shape
    bench_shape("sgd_k64", 82_000, 65, 65_536, results, rtt,
                with_onehot=False)
    # BS cache-build shape: A=[nc_pad, 1+k], 1.22M case slots in [nb, Lb]
    bench_shape("bs_k32", 1_050_000, 33, 1_228_800, results, rtt,
                with_onehot=False, block_lb=256)

    with open("studies/results/gather_floor.json", "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote studies/results/gather_floor.json")


if __name__ == "__main__":
    main()
