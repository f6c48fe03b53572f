"""SGD packed-epoch bisection: where do the 0.94 ms/batch go?

VERDICT r3 item #1: config #1 sits at 3.2x (0.328 s/epoch, B=32768,
275 batches) with a measured ~0.94 ms/batch cost whose composition is
unknown, and an unexplained regression at B=65536 (0.373 s). This study
bisects the packed step on the real chip and sweeps batch size, so the
next change is chosen by evidence (the round-2 "floor proof" failed
precisely because this wasn't done).

Methodology: every variant runs the REAL epoch shape — one jitted
lax.scan over the full ML-10M batch stack — and is timed over chained
calls (each call consumes the previous call's params so the tunnel
cannot dedup), synchronized by a scalar fetch (see gather_floor.py's
RTT note).

Variants:
  full          the shipping packed step (gather + math + perm + scatter)
  noperm        scatter natural-order updates unsorted (no perm gather,
                no indices_are_sorted)
  noscatter     gather + math, updates reduced into a scalar
  gather_only   row gather only, summed
  dispatch      empty body (scan + carry overhead floor)

Usage: python studies/sgd_floor.py [--ratings 10000000] [--bs 32768 ...]
"""

import argparse
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def build_stack(train, B):
    from libfm_tpu.data.batching import batch_dataset
    from libfm_tpu.learners.sgd import sorted_scatter_order

    tb = batch_dataset(train, B)
    sids, perm = sorted_scatter_order(tb.ids)
    return (
        jnp.asarray(tb.ids), jnp.asarray(tb.vals), jnp.asarray(tb.y),
        jnp.asarray(tb.row_mask), jnp.asarray(sids), jnp.asarray(perm),
    )


def dedup_order(sids_np):
    """Host-side: per-batch unique sorted ids (padded with a dummy id
    n+pos so every slot stays unique) + entry->unique segment map."""
    nb, E = sids_np.shape
    U = max(len(np.unique(b)) for b in sids_np)
    n = int(sids_np.max()) + 1
    usids = np.zeros((nb, U), np.int32)
    segid = np.zeros((nb, E), np.int32)
    for i in range(nb):
        u, inv = np.unique(sids_np[i], return_inverse=True)
        usids[i, : len(u)] = u
        # dummy rows live past n — the study pads P by U rows so the
        # padding scatter slots stay genuinely unique and in bounds
        usids[i, len(u):] = np.arange(U - len(u)) + n
        segid[i] = inv
    return usids, segid


def make_variant(cfg, variant):
    """Epoch fn of (w0, P, stack arrays...) -> (w0, P, acc)."""
    k = cfg.num_factors
    lr0 = lr1 = lr2 = 0.003

    def step(w0, P, acc, ids, vals, y, row_mask, sids, perm, *dd):
        B, L = vals.shape
        E = B * L
        if variant == "dispatch":
            return w0, P, acc + y.sum()
        rows = P[ids.reshape(-1)]
        if variant == "natural":
            # no transposes: all math in the gathered [B, L, 1+k]
            # orientation, scatter natural-order unsorted
            r3 = rows.reshape(B, L, 1 + k)
            w_g = r3[..., 0]
            v_g = r3[..., 1:]
            vx = v_g * vals[..., None]
            vsB = vx.sum(axis=1)                      # [B, k]
            pred = 0.5 * ((vsB * vsB).sum(-1) - (vx * vx).sum((1, 2)))
            pred = pred + (w_g * vals).sum(-1) + w0
            mult = jnp.where(row_mask, pred - y, 0.0)
            n_real = row_mask.sum().astype(vals.dtype)
            w0 = w0 - lr0 * (mult.sum() + n_real * cfg.reg0 * w0)
            emask = (vals != 0.0).astype(vals.dtype)
            gw = mult[:, None] * vals + cfg.regw * w_g * emask
            gv = mult[:, None, None] * (
                vsB[:, None, :] * vals[..., None]
                - v_g * (vals * vals)[..., None]
            ) + cfg.regv * v_g * emask[..., None]
            upd = jnp.concatenate(
                [(-lr1 * gw)[..., None], -lr2 * gv], axis=-1
            ).reshape(E, 1 + k)
            P = P.at[ids.reshape(-1)].add(upd)
            return w0, P, acc
        if variant == "onehot":
            # vals == 1 for every real entry (ML one-hot); padding rows
            # are masked via mult. Same transposed pipeline minus every
            # val multiply and the emask.
            rT = rows.T
            w_g = rT[0]
            v_g = rT[1:]
            vsB = v_g.reshape(k, B, L).sum(axis=2)
            pred = 0.5 * (
                (vsB * vsB).sum(axis=0)
                - (v_g * v_g).reshape(k, B, L).sum(axis=(0, 2))
            )
            pred = pred + w_g.reshape(B, L).sum(axis=1) + w0
            mult = jnp.where(row_mask, pred - y, 0.0)
            mE = jnp.repeat(mult, L)
            n_real = row_mask.sum().astype(vals.dtype)
            w0 = w0 - lr0 * (mult.sum() + n_real * cfg.reg0 * w0)
            gw = mE + cfg.regw * w_g
            vsum = jnp.repeat(vsB, L, axis=1)
            gv = mE * (vsum - v_g) + cfg.regv * v_g
            upd = jnp.concatenate([(-lr1 * gw)[None], -lr2 * gv], axis=0)
            P = P.at[sids].add(upd.T[perm], indices_are_sorted=True)
            return w0, P, acc
        if variant == "pair":
            # L == 2 one-hot closed form (the ML shape): pred = w0 + w_u
            # + w_i + v_u . v_i; grad_v_u = mult * v_i (and vice versa).
            # Transposed orientation, minimal op count.
            rT = rows.reshape(B, L, 1 + k).transpose(2, 1, 0)  # [1+k, 2, B]
            w2 = rT[0]          # [2, B]
            v2 = rT[1:]         # [k, 2, B]
            pred = w0 + w2.sum(axis=0) + (v2[:, 0] * v2[:, 1]).sum(axis=0)
            mult = jnp.where(row_mask, pred - y, 0.0)   # [B]
            n_real = row_mask.sum().astype(vals.dtype)
            w0 = w0 - lr0 * (mult.sum() + n_real * cfg.reg0 * w0)
            gw = mult[None, :] + cfg.regw * w2          # [2, B]
            gv = mult * v2[:, ::-1] + cfg.regv * v2     # [k, 2, B]
            upd = jnp.concatenate([(-lr1 * gw)[None], -lr2 * gv], axis=0)
            upd_rows = upd.transpose(2, 1, 0).reshape(E, 1 + k)
            P = P.at[sids].add(upd_rows[perm], indices_are_sorted=True)
            return w0, P, acc
        rT = rows.T
        if variant == "gather_only":
            return w0, P, acc + rT.sum()
        if variant == "scatteronly":
            # pure sorted scatter of a cheap update (rows scaled) at the
            # presorted ids — isolates the scatter from math and perm
            P = P.at[sids].add(rows * 1e-6, indices_are_sorted=True)
            return w0, P, acc
        if variant == "mathfwd":
            # gather + forward only (no grads, no scatter)
            vT = vals.reshape(1, E)
            w_g = rT[0]
            v_g = rT[1:]
            vx = v_g * vT
            vsB = vx.reshape(k, B, L).sum(axis=2)
            pred = 0.5 * (
                (vsB * vsB).sum(axis=0)
                - (vx * vx).reshape(k, B, L).sum(axis=(0, 2))
            )
            pred = pred + (w_g * vT[0]).reshape(B, L).sum(axis=1) + w0
            mult = jnp.where(row_mask, pred - y, 0.0)
            return w0, P, acc + mult.sum()
        vT = vals.reshape(1, E)
        w_g = rT[0]
        v_g = rT[1:]
        vx = v_g * vT
        vsB = vx.reshape(k, B, L).sum(axis=2)
        pred = 0.5 * (
            (vsB * vsB).sum(axis=0)
            - (vx * vx).reshape(k, B, L).sum(axis=(0, 2))
        )
        pred = pred + (w_g * vT[0]).reshape(B, L).sum(axis=1) + w0
        mult = jnp.where(row_mask, pred - y, 0.0)
        mE = jnp.repeat(mult, L)
        emask = (vT != 0.0).astype(vals.dtype)
        n_real = row_mask.sum().astype(vals.dtype)
        w0 = w0 - lr0 * (mult.sum() + n_real * cfg.reg0 * w0)
        gw = mE * vT[0] + cfg.regw * w_g * emask[0]
        vsum = jnp.repeat(vsB, L, axis=1)
        gv = mE * (vsum * vT - v_g * (vT * vT)) + cfg.regv * v_g * emask
        upd = jnp.concatenate([(-lr1 * gw)[None], -lr2 * gv], axis=0)
        if variant == "noscatter":
            return w0, P, acc + upd.sum()
        if variant == "noperm":
            P = P.at[ids.reshape(-1)].add(upd.T)
            return w0, P, acc
        if variant == "dedup":
            # combine duplicate ids (sorted segments) then scatter the
            # ~40% fewer unique rows with unique_indices=True
            usids, segs = dd
            comb = jax.ops.segment_sum(
                upd.T[perm], segs, num_segments=usids.shape[0],
                indices_are_sorted=True,
            )
            P = P.at[usids].add(
                comb, indices_are_sorted=True, unique_indices=True
            )
            return w0, P, acc
        P = P.at[sids].add(upd.T[perm], indices_are_sorted=True)
        return w0, P, acc

    def epoch(w0, P, *arrs):
        def body(carry, batch):
            w0, P, acc = carry
            w0, P, acc = step(w0, P, acc, *batch)
            return (w0, P, acc), None

        (w0, P, acc), _ = jax.lax.scan(
            body, (w0, P, jnp.zeros((), jnp.float32)), arrs
        )
        return w0, P, acc + P[0].sum()

    return jax.jit(epoch, donate_argnums=(1,))


def time_epoch(fn, w0, P, stack, reps=4):
    # chain calls through params so no two calls are dedup-identical
    w0, P, acc = fn(w0, P, *stack)
    float(acc)  # compile+run
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        w0, P, acc = fn(w0, P, *stack)
        float(acc)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), w0, P


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ratings", type=int, default=10_000_000)
    ap.add_argument("--bs", type=int, nargs="*",
                    default=[32768, 65536, 131072, 262144])
    ap.add_argument("--variants", nargs="*",
                    default=["full", "noperm", "noscatter", "gather_only",
                             "dispatch"])
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from libfm_tpu.models.fm import FMConfig

    class _A:
        ratings = args.ratings

    from bench import _ml_data

    train, _ = _ml_data(_A)
    cfg = FMConfig(num_features=train.num_features, num_factors=8,
                   regv=0.01)
    n = train.num_features
    rng = np.random.default_rng(0)
    results = []
    print(f"devices: {jax.devices()}  rows={train.num_rows}  n={n}",
          flush=True)
    for B in args.bs:
        stack = build_stack(train, B)
        nb = stack[0].shape[0]
        for variant in args.variants:
            if variant == "dedup":
                usids, _ = dedup_order(np.asarray(stack[4]))
                # sorted-entry segment ids: positions within the sorted
                # id vector (nondecreasing by construction)
                segs = np.zeros(stack[4].shape, np.int32)
                sids_np = np.asarray(stack[4])
                for i in range(nb):
                    segs[i] = np.searchsorted(
                        np.asarray(usids[i]), sids_np[i]
                    )
                vstack = stack + (jnp.asarray(usids), jnp.asarray(segs))
            else:
                vstack = stack
            fn = make_variant(cfg, variant)
            n_rows = n + (vstack[6].shape[1] if variant == "dedup" else 0)
            P = jnp.asarray(
                rng.standard_normal((n_rows, 1 + cfg.num_factors)),
                jnp.float32,
            ) * 0.01
            dt, _, _ = time_epoch(fn, jnp.zeros((), jnp.float32), P, vstack)
            per_batch = dt / nb
            results.append(dict(B=B, nb=nb, variant=variant,
                                epoch_s=round(dt, 4),
                                ms_per_batch=round(per_batch * 1e3, 4)))
            print(f"B={B:7d} nb={nb:4d} {variant:12s} {dt:7.4f} s/epoch  "
                  f"{per_batch*1e3:7.4f} ms/batch", flush=True)
    with open("studies/results/sgd_floor.json", "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote studies/results/sgd_floor.json")


if __name__ == "__main__":
    main()
