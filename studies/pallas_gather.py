"""Pallas VMEM-resident table: random sublane read/RMW rate.

Hypothesis: the ~45 ns/row XLA random row gather/scatter floor (see
gather_floor.py) can be beaten for SMALL parameter tables by keeping
the packed table VMEM-resident inside one pallas kernel and doing
per-row dynamic sublane reads/writes — no HBM round trip per row.

Layout: the packed SGD table P = [w | V] ([n, 1+k] f32) is flattened to
[n, 128] only notionally — here we benchmark the primitive: a [NSUB,
128] f32 VMEM table, a stream of random sublane indices, and three
access patterns:

  read      acc += T[idx[i]]            (gather rate)
  rmw       T[idx[i]] += delta          (scatter-add rate)
  vec_take  jnp.take(T, idx_chunk)      (does Mosaic vectorize it?)

Timing uses the chained-fori/host-fetch methodology from
gather_floor.py (axon tunnel: identical dispatches dedupe, RTT ~29 ms).

Usage: python studies/pallas_gather.py
"""

import functools
import json
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

UNROLL = 8


def sync_time(fn, *args, iters=3):
    float(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


@jax.jit
def _trivial(x):
    return x + 1.0


# ------------------------------------------------------------- read
def make_read_kernel(nsub, nids, reps):
    def kernel(ids_ref, T_ref, out_ref):
        def rep_body(r, acc):
            # rotate ids by r so reps aren't identical
            def body(i, accs):
                res = []
                for u in range(UNROLL):
                    idx = jax.lax.rem(ids_ref[i * UNROLL + u] + r, nsub)
                    res.append(accs[u] + T_ref[pl.ds(idx, 1), :])
                return tuple(res)

            accs = jax.lax.fori_loop(
                0, nids // UNROLL, body,
                tuple(acc for _ in range(UNROLL)),
            )
            total = accs[0]
            for u in range(1, UNROLL):
                total = total + accs[u]
            return total

        out_ref[...] = jax.lax.fori_loop(
            0, reps, rep_body, jnp.zeros((1, 128), jnp.float32)
        )

    @jax.jit
    def run(ids, T):
        out = pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        )(ids, T)
        return out.sum()

    return run


# ------------------------------------------------------------- rmw
def make_rmw_kernel(nsub, nids, reps):
    def kernel(ids_ref, T_ref, out_ref, scratch):
        scratch[...] = T_ref[...]

        def rep_body(r, _):
            def body(i, _):
                idx = jax.lax.rem(ids_ref[i] + r, nsub)
                row = scratch[pl.ds(idx, 1), :]
                scratch[pl.ds(idx, 1), :] = row + 1.0
                return _

            return jax.lax.fori_loop(0, nids, body, _)

        jax.lax.fori_loop(0, reps, rep_body, 0)
        out_ref[...] = scratch[pl.ds(0, 1), :]

    @jax.jit
    def run(ids, T):
        out = pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((nsub, 128), jnp.float32)],
        )(ids, T)
        return out.sum()

    return run


# --------------------------------------------------------- vec take
def make_take_kernel(nsub, nids, reps, chunk=256):
    def kernel(ids_ref, T_ref, out_ref):
        def rep_body(r, acc):
            def body(c, acc):
                idx = (
                    jax.lax.dynamic_slice(ids_ref[...], (c * chunk,), (chunk,))
                    + r
                ) % nsub
                rows = jnp.take(T_ref[...], idx, axis=0)  # [chunk, 128]
                return acc + rows.sum(axis=0, keepdims=True)

            return jax.lax.fori_loop(0, nids // chunk, body, acc)

        out_ref[...] = jax.lax.fori_loop(
            0, reps, rep_body, jnp.zeros((1, 128), jnp.float32)
        )

    @jax.jit
    def run(ids, T):
        out = pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        )(ids, T)
        return out.sum()

    return run


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rtt = sync_time(_trivial, jnp.zeros(()))
    print(f"tunnel RTT: {rtt*1e3:.2f} ms", flush=True)

    NSUB = 10_256          # 82K rows / 8-per-sublane-row -> ~5.25 MB
    NIDS = 16_384          # ids per inner pass
    REPS = 20
    rng = np.random.default_rng(0)
    T = jnp.asarray(rng.standard_normal((NSUB, 128)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, NSUB, NIDS).astype(np.int32))

    results = []

    def rec(strategy, dt_total, nrows):
        dt = (dt_total - rtt) / REPS
        ns = dt / nrows * 1e9
        results.append(dict(strategy=strategy, ms=round(dt * 1e3, 3),
                            ns_per_row=round(ns, 2)))
        print(f"  {strategy:10s} {dt*1e3:9.3f} ms  {ns:7.2f} ns/row",
              flush=True)

    for name, maker in [
        ("read", make_read_kernel),
        ("rmw", make_rmw_kernel),
        ("vec_take", make_take_kernel),
    ]:
        try:
            run = maker(NSUB, NIDS, REPS)
            rec(name, sync_time(run, ids, T), NIDS)
        except Exception as e:
            print(f"  {name:10s} failed: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    with open("studies/results/pallas_gather.json", "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote studies/results/pallas_gather.json", flush=True)


if __name__ == "__main__":
    main()
