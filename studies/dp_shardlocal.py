"""Shard-local DP lowering for the flat vector sweep — demonstrated
(NEXT.md open lever #1; follow-up to studies/scaling_projection.py).

The round-5 HLO inventory (studies/results/scaling_projection_r5.json,
`hlo_dp_data8`) showed that the as-lowered DP path ALL-GATHERS the
data-sharded A=[e|Q] table for the slot gathers (~2.3 full-table
gathers/iter = 2.3 x 2.41 GB at the ML-10M shape) — correct but
wire-inefficient (projected 28% efficiency at 2 hosts). The projected
fix (78%): keep every per-case touch shard-local and move ONLY the
per-feature sufficient statistics across the wire, as
reduce-scatter(MOM) + feature-sharded draws + all-gather(theta-delta).

This study DEMONSTRATES that lowering on the virtual 8-device CPU mesh
with a representative flat one-hot FM Gibbs/ALS sweep (the engine's
case-major stats form, mcmc_vector.py `stats_case_chunk`: per-case
moment rows one-hot-matmul'd into MOM, draws reconstructed per feature
after the reduction — no per-case v-gather):

  1. single-device reference sweep (plain jnp, one device);
  2. shard_map DP sweep: case shards accumulate LOCAL partial moments,
     `psum_scatter` tiles them over the data axis (each shard draws
     F/D features), `all_gather` broadcasts the theta deltas, and the
     A update is pure-local. A never crosses the wire.

Asserts sharded == single parity (f32 reduction-order tolerance) and
inventories every collective in the compiled SPMD module: the data-axis
traffic must be exactly {reduce-scatter [F, MW], all-gather [F, d]} —
no A-shaped (nc-row) collective. Writes
studies/results/dp_shardlocal_r5.json with the inventory, the parity
numbers, and the bench-shape wire volumes this demonstrates.

Usage: python studies/dp_shardlocal.py   (CPU only; no TPU claim)
"""

import json
import sys
from functools import partial

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp


def _pin_cpu(n=8):
    # safe to call after the module-level `import jax`: the backend
    # initialises lazily, on first device use
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", n)


D_MESH = 8
F = 512  # features per one-hot block (divisible by D_MESH)
K = 8
NC = 65536
LAM = 1.0  # ridge (lambda/alpha) — ALS mode, deterministic


def make_problem(seed=0):
    rng = np.random.default_rng(seed)
    sid0 = rng.integers(0, F, NC).astype(np.int32)
    sid1 = rng.integers(0, F, NC).astype(np.int32)
    y = rng.standard_normal(NC).astype(np.float32)
    w = (0.01 * rng.standard_normal(2 * F)).astype(np.float32)
    V = (0.1 * rng.standard_normal((2 * F, K))).astype(np.float32)
    return sid0, sid1, y, w, V


def _init_A(sid0, sid1, y, w, V):
    """A = [e | Q] for the 2-block one-hot FM (Q = v_u + v_i,
    e = pred - y with the pairwise trick)."""
    import jax.numpy as jnp

    vu = V[sid0]
    vi = V[sid1 + F]
    Q = vu + vi
    sum_sq = vu * vu + vi * vi
    pred = w[sid0] + w[sid1 + F] + 0.5 * jnp.sum(Q * Q - sum_sq, axis=1)
    e = pred - y
    return jnp.concatenate([e[:, None], Q], axis=1)


def _moments(A, sid):
    """Per-feature one-hot moment rows (engine form, unpacked QQ):
    [Q (x) Q | Q | eQ | 1 | e] -> MOM [F, MW]."""
    import jax.numpy as jnp

    e = A[:, 0]
    Q = A[:, 1:]
    QQ = (Q[:, :, None] * Q[:, None, :]).reshape(-1, K * K)
    rows = jnp.concatenate(
        [QQ, Q, e[:, None] * Q, jnp.ones((e.shape[0], 1), jnp.float32),
         e[:, None]],
        axis=1,
    )
    onehot = (sid[:, None] == jnp.arange(F, dtype=jnp.int32)[None, :])
    return jnp.einsum(
        "cf,cs->fs", onehot.astype(jnp.float32), rows,
        preferred_element_type=jnp.float32,
    )


def _draw_from_moments(MOM, w_f, V_f):
    """Reconstruct per-feature Gram/rhs over h = [1, qp] (qp = Q - v_f)
    and solve the ridge system — deterministic ALS joint draw."""
    import jax.numpy as jnp

    d = 1 + K
    QQ = MOM[:, : K * K].reshape(F, K, K)
    Qs = MOM[:, K * K : K * K + K]
    eQ = MOM[:, K * K + K : K * K + 2 * K]
    n = MOM[:, -2]
    es = MOM[:, -1]
    v = V_f  # [F, K]
    # sum qp (x) qp = QQ - v (x) Q - Q (x) v + n v (x) v
    G11 = (
        QQ
        - v[:, :, None] * Qs[:, None, :]
        - Qs[:, :, None] * v[:, None, :]
        + n[:, None, None] * (v[:, :, None] * v[:, None, :])
    )
    g01 = Qs - n[:, None] * v  # sum qp
    Gram = jnp.zeros((F, d, d), jnp.float32)
    Gram = Gram.at[:, 0, 0].set(n)
    Gram = Gram.at[:, 0, 1:].set(g01)
    Gram = Gram.at[:, 1:, 0].set(g01)
    Gram = Gram.at[:, 1:, 1:].set(G11)
    rhs_e = jnp.concatenate([es[:, None], eQ - es[:, None] * v], axis=1)
    theta_old = jnp.concatenate([w_f[:, None], V_f], axis=1)
    rhs = jnp.einsum("fij,fj->fi", Gram, theta_old) - rhs_e
    A_mat = Gram + LAM * jnp.eye(d, dtype=jnp.float32)[None]
    return jnp.linalg.solve(A_mat, rhs[..., None])[..., 0]  # [F, d]


def _apply_update(A, sid, dth, v_old):
    """Local A update: e += dw + qp . dv ; Q += dv (one-hot x = 1)."""
    import jax.numpy as jnp

    d_c = dth[sid]  # [nc, 1+K]
    qp = A[:, 1:] - v_old[sid]
    e_new = A[:, 0] + d_c[:, 0] + jnp.sum(qp * d_c[:, 1:], axis=1)
    Q_new = A[:, 1:] + d_c[:, 1:]
    return jnp.concatenate([e_new[:, None], Q_new], axis=1)


def sweep_single(A, sid0, sid1, w, V):
    """One full sweep (both blocks), single device."""
    import jax.numpy as jnp

    for b, sid in ((0, sid0), (1, sid1)):
        off = b * F
        w_f = jax.lax.dynamic_slice_in_dim(w, off, F)
        V_f = jax.lax.dynamic_slice_in_dim(V, off, F)
        MOM = _moments(A, sid)
        theta_new = _draw_from_moments(MOM, w_f, V_f)
        theta_old = jnp.concatenate([w_f[:, None], V_f], axis=1)
        dth = theta_new - theta_old
        A = _apply_update(A, sid, dth, V_f)
        w = jax.lax.dynamic_update_slice_in_dim(w, theta_new[:, 0], off, 0)
        V = jax.lax.dynamic_update_slice_in_dim(V, theta_new[:, 1:], off, 0)
    return A, w, V


def make_sweep_shardlocal(mesh):
    """Shard-local DP sweep: A/sid sharded over 'data'; the ONLY wire
    traffic is psum_scatter(MOM) + all_gather(theta delta)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    def body(A_l, sid0_l, sid1_l, w, V):
        # runs per data shard: A_l [nc/D, 1+K], sid*_l local case shards,
        # w/V replicated
        for b, sid_l in ((0, sid0_l), (1, sid1_l)):
            off = b * F
            w_f = jax.lax.dynamic_slice_in_dim(w, off, F)
            V_f = jax.lax.dynamic_slice_in_dim(V, off, F)
            MOM_part = _moments(A_l, sid_l)  # local partial [F, MW]
            # reduce-scatter: shard i receives the summed tile of F/D
            # feature rows -> draws are feature-sharded over `data`
            MOM_t = jax.lax.psum_scatter(
                MOM_part, "data", scatter_dimension=0, tiled=True
            )  # [F/D, MW]
            i = jax.lax.axis_index("data")
            FD = F // D_MESH
            w_t = jax.lax.dynamic_slice_in_dim(w_f, i * FD, FD)
            V_t = jax.lax.dynamic_slice_in_dim(V_f, i * FD, FD)
            # same reconstruction/solve on the local feature tile
            d = 1 + K
            QQ = MOM_t[:, : K * K].reshape(FD, K, K)
            Qs = MOM_t[:, K * K : K * K + K]
            eQ = MOM_t[:, K * K + K : K * K + 2 * K]
            n = MOM_t[:, -2]
            es = MOM_t[:, -1]
            G11 = (
                QQ
                - V_t[:, :, None] * Qs[:, None, :]
                - Qs[:, :, None] * V_t[:, None, :]
                + n[:, None, None] * (V_t[:, :, None] * V_t[:, None, :])
            )
            g01 = Qs - n[:, None] * V_t
            Gram = jnp.zeros((FD, d, d), jnp.float32)
            Gram = Gram.at[:, 0, 0].set(n)
            Gram = Gram.at[:, 0, 1:].set(g01)
            Gram = Gram.at[:, 1:, 0].set(g01)
            Gram = Gram.at[:, 1:, 1:].set(G11)
            rhs_e = jnp.concatenate(
                [es[:, None], eQ - es[:, None] * V_t], axis=1
            )
            th_old_t = jnp.concatenate([w_t[:, None], V_t], axis=1)
            rhs = jnp.einsum("fij,fj->fi", Gram, th_old_t) - rhs_e
            A_mat = Gram + LAM * jnp.eye(d, dtype=jnp.float32)[None]
            th_new_t = jnp.linalg.solve(A_mat, rhs[..., None])[..., 0]
            dth_t = th_new_t - th_old_t  # [F/D, d]
            # all-gather the theta deltas (the ONLY broadcastward wire op)
            dth = jax.lax.all_gather(
                dth_t, "data", tiled=True
            )  # [F, d]
            A_l = _apply_update(A_l, sid_l, dth, V_f)
            th_new = jnp.concatenate([w_f[:, None], V_f], axis=1) + dth
            w = jax.lax.dynamic_update_slice_in_dim(
                w, th_new[:, 0], off, 0
            )
            V = jax.lax.dynamic_update_slice_in_dim(
                V, th_new[:, 1:], off, 0
            )
        return A_l, w, V

    return shard_map(
        body, mesh=mesh,
        in_specs=(P("data", None), P("data"), P("data"), P(), P()),
        out_specs=(P("data", None), P(), P()),
        check_vma=False,
    )


# reuse the round-5 inventory parser
sys.path.insert(0, "studies")
from scaling_projection import collective_inventory  # noqa: E402


def main():
    _pin_cpu(D_MESH)
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    sid0, sid1, y, w, V = make_problem()
    A0 = _init_A(
        jnp.asarray(sid0), jnp.asarray(sid1), jnp.asarray(y),
        jnp.asarray(w), jnp.asarray(V),
    )

    # --- single-device reference (2 sweeps) ---
    f_single = jax.jit(sweep_single)
    A_s, w_s, V_s = A0, jnp.asarray(w), jnp.asarray(V)
    for _ in range(2):
        A_s, w_s, V_s = f_single(
            A_s, jnp.asarray(sid0), jnp.asarray(sid1), w_s, V_s
        )

    # --- shard-local DP ---
    mesh = Mesh(np.array(jax.devices()[:D_MESH]), ("data",))
    sweep_dp = make_sweep_shardlocal(mesh)
    sh_case2 = NamedSharding(mesh, P("data", None))
    sh_case1 = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    args = (
        jax.device_put(A0, sh_case2),
        jax.device_put(jnp.asarray(sid0), sh_case1),
        jax.device_put(jnp.asarray(sid1), sh_case1),
        jax.device_put(jnp.asarray(w), repl),
        jax.device_put(jnp.asarray(V), repl),
    )
    f_dp = jax.jit(sweep_dp)
    lowered = f_dp.lower(*args)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    inv = collective_inventory(hlo)

    A_d, w_d, V_d = args[0], args[3], args[4]
    for _ in range(2):
        A_d, w_d, V_d = f_dp(args[0] if A_d is None else A_d,
                             args[1], args[2], w_d, V_d)

    # --- parity ---
    dw = float(jnp.max(jnp.abs(w_d - w_s)))
    dV = float(jnp.max(jnp.abs(V_d - V_s)))
    dA = float(jnp.max(jnp.abs(A_d - A_s)))
    scale = float(jnp.max(jnp.abs(w_s))) + float(jnp.max(jnp.abs(V_s)))
    ok = dw < 2e-4 and dV < 2e-4 and dA < 2e-3

    # --- the claim the inventory must support ---
    MW = K * K + 2 * K + 2
    a_rows_collectives = [
        op for op in inv
        if op["shape"] and op["shape"][0] >= NC // D_MESH
    ]
    agg = {}
    for op in inv:
        key = (op["kind"], op["dtype"], tuple(op["shape"]))
        agg[key] = agg.get(key, 0) + 1

    # demonstrated per-sweep wire bytes (both blocks), this shape
    demo_bytes = 2 * (F * MW * 4 + F * (1 + K) * 4)

    # bench-shape volumes with the engine's PACKED stats rows
    # (GW = T + 2k + 2): what this lowering moves per iteration for
    # config #3 — compare scaling_projection_r5.json's fix projection
    k = 64
    T = k * (k + 1) // 2
    GW = T + 2 * k + 2
    F3 = 71567 + 10681
    bench_bytes = F3 * GW * 4 + F3 * (k + 1) * 4
    out = dict(
        parity=dict(
            sweeps=2, max_abs_dw=dw, max_abs_dV=dV, max_abs_dA=dA,
            scale=scale, ok=bool(ok),
        ),
        collective_inventory=[
            dict(kind=k_[0], dtype=k_[1], shape=list(k_[2]), count=c)
            for k_, c in sorted(agg.items())
        ],
        a_table_collectives=a_rows_collectives,
        claim=(
            "A (the [nc, 1+k] case table) never crosses the wire: the "
            "only data-axis collectives are the per-block "
            "reduce-scatter of MOM [F, MW] and the all-gather of the "
            "theta deltas [F, 1+k] — the lowering the 78% projection "
            "assumed (scaling_projection_r5.json "
            "ml_k64_dp_shardlocal_fix) is constructible with shard_map "
            "and matches the single-device sweep numerically."
        ),
        demo_shape=dict(F_per_block=F, K=K, NC=NC, D=D_MESH, MW=MW),
        demo_wire_bytes_per_sweep=demo_bytes,
        bench_shape_wire_bytes_per_iter=dict(
            config="#3 ML-10M k=64 (packed GW rows)",
            gg_reduce_bytes=F3 * GW * 4,
            theta_allgather_bytes=F3 * (k + 1) * 4,
            total=bench_bytes,
            vs_as_lowered_A_allgathers="2.3 x 2.41e9 B (28% projected)",
        ),
    )
    with open("studies/results/dp_shardlocal_r5.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(dict(parity=out["parity"],
                          collectives=out["collective_inventory"]),
                     indent=1))
    print("A-table-sized collectives:", len(a_rows_collectives))
    print("wrote studies/results/dp_shardlocal_r5.json")
    if not ok:
        sys.exit(1)
    if a_rows_collectives:
        print("FAIL: an A-sized array crossed the wire", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
