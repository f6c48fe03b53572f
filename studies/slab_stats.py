"""Case-reordering premise for the headline stats pass (VERDICT r4 item 4).

The ML-10M k=64 stats pass gathers 18M random A rows per sweep at the
~45 ns/row big-table floor (~0.5 s of the 0.92 s stats phase). Case
order is a free permutation of A's rows: sorting cases by the dominant
block's feature makes that block's slot gathers land in bounded case
windows, so the pass can dynamic_slice a ~16 MB slab of A and gather
from the chip-resident slice at the measured ~2.2 ns/row rate (the BS
engine's slab trick, BENCHNOTES "Gather cost vs table size").

This study measures the stats-pass kernel at the exact headline shape:
  big   — gather [C, W, 1+k] slots from the full 2.3 GB A (status quo)
  slab  — one 32K-case slab per scan step, slab-relative gathers
  slab64— 64K-case slabs (33 MB — the 10 ns/row zone)
both with the real einsum consumer (hq^T hq moments into a GG carry).

Usage: python studies/slab_stats.py [--nc 9000000] [--k 64]
"""

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def time_call(fn, *args, reps=3):
    out = fn(*args)
    float(out[1])  # compile + run
    ts = []
    A = args[0]
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(A, *args[1:])
        float(out[1])
        ts.append(time.perf_counter() - t0)
        A = out[0]  # chain
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nc", type=int, default=9_000_000)
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--w", type=int, default=256)
    ap.add_argument("--slots-per-step", type=int, default=262144)
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    NC, k, W = args.nc, args.k, args.w
    rng = np.random.default_rng(0)
    A = jnp.asarray(
        rng.standard_normal((NC + 1, 1 + k)).astype(np.float32)
    )
    nslots = NC  # one slot per case (one block of a 2-entry design)
    nseg = nslots // W

    results = []

    def run(name, fn, ids_np, steps_meta, slot_count):
        ids = jnp.asarray(ids_np)
        dt = time_call(fn, A, ids, *steps_meta)
        ns = dt / slot_count * 1e9
        results.append(dict(variant=name, s=round(dt, 4),
                            ns_per_slot=round(ns, 2)))
        print(f"{name:8s} {dt:7.4f} s  {ns:6.2f} ns/slot", flush=True)

    # ---- big: C segments per step, random ids over all of A ----------
    C = args.slots_per_step // W
    steps = nseg // C
    ids_big = rng.integers(0, NC, (steps, C, W)).astype(np.int32)

    @jax.jit
    def big(A, ids):
        GG0 = jnp.zeros((C, k, k), jnp.float32)

        def body(GG, sc):
            A_slot = A[sc]  # [C, W, 1+k]
            hq = A_slot[..., 1:]
            GG = GG + jnp.einsum(
                "swi,swj->sij", hq, hq,
                preferred_element_type=jnp.float32,
            )
            return GG, None

        GG, _ = jax.lax.scan(big_body := body, GG0, ids)
        return A + GG.sum() * 0.0, GG.sum()

    run("big", big, ids_big, (), steps * C * W)

    # ---- slab: one SLAB-case window per step ------------------------
    for name, SLAB in (("slab", 32768), ("slab64", 65536)):
        Cs = SLAB // W  # segments per step (slots == cases in the slab)
        steps_s = NC // SLAB
        # slab-relative ids: each step's slots lie within its window
        ids_s = rng.integers(0, SLAB, (steps_s, Cs, W)).astype(np.int32)
        starts = (np.arange(steps_s) * SLAB).astype(np.int32)

        def make_slab(SLAB_, Cs_):
            @jax.jit
            def slab(A, ids, starts):
                GG0 = jnp.zeros((Cs_, k, k), jnp.float32)

                def body(GG, inp):
                    sc, st = inp
                    A_slab = jax.lax.dynamic_slice(
                        A, (st, 0), (SLAB_, 1 + k)
                    )
                    A_slot = A_slab[sc]  # [Cs, W, 1+k]
                    hq = A_slot[..., 1:]
                    GG = GG + jnp.einsum(
                        "swi,swj->sij", hq, hq,
                        preferred_element_type=jnp.float32,
                    )
                    return GG, None

                GG, _ = jax.lax.scan(body, GG0, (ids, jnp.asarray(starts)))
                return A + GG.sum() * 0.0, GG.sum()

            return slab

        run(name, make_slab(SLAB, Cs), ids_s, (starts,), steps_s * SLAB)

    with open("studies/results/slab_stats.json", "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote studies/results/slab_stats.json")


if __name__ == "__main__":
    main()
