"""Slab-gather mechanisms for the headline stats pass (VERDICT r4 item 4).

Round-4 finding: slicing A with a TRACED offset inside the scan body
(dynamic_slice on a scan input) made the headline 1.7x SLOWER — XLA
does not materialise the slice as a resident buffer. The BS engine's
working slab trick (mcmc_rel_vector.py _slab_case_layout) instead
UNROLLS over slabs with STATIC slice offsets. This study measures the
candidate mechanisms at the exact headline shape (A = [9M, 65] f32,
9M slots in W=32 segments, einsum consumer) so the engine ships the
right one:

  big       gather [C, W, 1+k] slots straight from the 2.3 GB A
  dyn       dynamic_slice with a traced offset inside the scan (shipped
            r4 first attempt — the regression)
  unroll16  static python-loop slabs of ~16 MB, inner scan per slab
  unroll32  static slabs of ~32 MB
  xs        A reshaped [ns, SLAB, 1+k] and fed as scan xs

Usage: python studies/slab_stats.py [--nc 9000000] [--k 64]
"""

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def time_call(fn, A, *args, reps=3):
    out = fn(A, *args)
    float(out[1])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(A, *args)
        float(out[1])
        ts.append(time.perf_counter() - t0)
        A = out[0]
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nc", type=int, default=9_000_000)
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--w", type=int, default=32)
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    NC, k, W = args.nc, args.k, args.w
    d = 1 + k
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((NC, d)).astype(np.float32))
    results = []
    print(f"devices: {jax.devices()}  A = [{NC}, {d}]", flush=True)

    def rec(name, dt, slots):
        ns = dt / slots * 1e9
        results.append(dict(variant=name, s=round(dt, 4),
                            ns_per_slot=round(ns, 2)))
        print(f"{name:9s} {dt:7.4f} s  {ns:6.2f} ns/slot", flush=True)

    def consume(rows):  # [C, W, d] -> scalar-ish einsum consumer
        hq = rows[..., 1:]
        return jnp.einsum(
            "swi,swj->ij", hq, hq, preferred_element_type=jnp.float32
        )

    # ---- big ---------------------------------------------------------
    CS = 262144 // W  # segments per step
    steps = NC // (CS * W)
    ids_big = rng.integers(0, NC, (steps, CS, W)).astype(np.int32)

    @jax.jit
    def big(A, ids):
        def body(acc, sc):
            return acc + consume(A[sc]), None

        acc, _ = jax.lax.scan(body, jnp.zeros((k, k), jnp.float32), ids)
        return A + acc.sum() * 1e-20, acc.sum()

    rec("big", time_call(big, A, jnp.asarray(ids_big)), steps * CS * W)

    # ---- slab id layout (sorted cases, grid slabs) -------------------
    def grid_ids(slab):
        ns = NC // slab
        cs = slab // W
        ids = (
            np.arange(ns * slab, dtype=np.int32).reshape(ns, cs, W) % slab
        )
        return ids, ns, cs

    # ---- dyn: traced-offset dynamic_slice inside the scan ------------
    SLAB = 64512
    ids_d, ns_d, cs_d = grid_ids(SLAB)
    starts = (np.arange(ns_d) * SLAB).astype(np.int32)

    @jax.jit
    def dyn(A, ids, starts):
        def body(acc, inp):
            sc, st = inp
            As = jax.lax.dynamic_slice(A, (st, 0), (SLAB, d))
            return acc + consume(As[sc]), None

        acc, _ = jax.lax.scan(
            body, jnp.zeros((k, k), jnp.float32),
            (ids, jnp.asarray(starts)),
        )
        return A + acc.sum() * 1e-20, acc.sum()

    rec("dyn", time_call(dyn, A, jnp.asarray(ids_d), starts),
        ns_d * SLAB)

    # ---- unroll: static offsets, inner scan per slab -----------------
    for name, slab_bytes in (("unroll16", 16 << 20), ("unroll32", 32 << 20)):
        slab = (slab_bytes // (d * 4)) // W * W
        ids_u, ns_u, cs_u = grid_ids(slab)
        ids_arr = jnp.asarray(ids_u)

        # one gather per slab (cs_u segments at once), STATIC offsets
        def make2(slab=slab, ns_u=ns_u):
            @jax.jit
            def unroll(A, ids):
                acc = jnp.zeros((k, k), jnp.float32)
                for i in range(ns_u):
                    As = jax.lax.slice_in_dim(A, i * slab, (i + 1) * slab)
                    acc = acc + consume(As[ids[i]])
                return A + acc.sum() * 1e-20, acc.sum()

            return unroll

        try:
            t0 = time.time()
            fn = make2()
            dt = time_call(fn, A, ids_arr)
            rec(name, dt, ns_u * slab)
            print(f"  (compile+run wall {time.time()-t0:.0f}s, "
                  f"{ns_u} slabs)", flush=True)
        except Exception as e:
            print(f"{name} failed: {type(e).__name__}: {e}", flush=True)

    # ---- xs: scan over A reshaped [ns, SLAB, d] ----------------------
    ids_x, ns_x, cs_x = grid_ids(SLAB)

    @jax.jit
    def xs(A, ids):
        A3 = A[: ns_x * SLAB].reshape(ns_x, SLAB, d)

        def body(acc, inp):
            As, sc = inp
            return acc + consume(As[sc]), None

        acc, _ = jax.lax.scan(
            body, jnp.zeros((k, k), jnp.float32), (A3, ids)
        )
        return A + acc.sum() * 1e-20, acc.sum()

    rec("xs", time_call(xs, A, jnp.asarray(ids_x)), ns_x * SLAB)

    with open("studies/results/slab_stats.json", "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote studies/results/slab_stats.json")


if __name__ == "__main__":
    main()
