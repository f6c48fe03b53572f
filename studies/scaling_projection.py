"""Multi-chip scaling projection without multi-chip hardware
(VERDICT r4 item 4).

Phase 1 (empirical, virtual CPU mesh): run the flat vector engine under
DP (data=8) and TP (data=2 x model=4) with `capture_hlo`, and inventory
every collective the SPMD partitioner inserted into the compiled
per-iteration chunk — op kind, shape, bytes, and whether it sits inside
a while body (executed once per scan step).

Phase 2 (analytic, bench shapes): evaluate the dominant collective
volumes at the real config #3 / #5 shapes and project 1-host (8 chip)
and 2-host (16 chip) iteration times under stated bandwidth
assumptions. Assumptions (v5e-class, stated so a skeptic can recompute):
  ICI ring all-reduce effective bandwidth  : 4.5e10 B/s per chip
  DCN per host                             : 1.25e10 B/s (100 Gbps)
  no compute/comm overlap (conservative)
Ring all-reduce moves 2(N-1)/N x bytes, reduce-scatter/all-gather
(N-1)/N x bytes.

Usage: python studies/scaling_projection.py   (CPU only — pins the
backend before any jax import side effects)
"""

import json
import re
import sys

sys.path.insert(0, ".")

import numpy as np


def _pin_cpu(n=8):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", n)


DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8, "s32": 4,
    "u64": 8, "u32": 4, "s8": 1, "u8": 1, "pred": 1,
}

COLLECTIVES = (
    "all-reduce", "all-gather", "reduce-scatter", "collective-permute",
    "all-to-all",
)


def collective_inventory(hlo_text):
    """Parse collective ops out of HLO text: kind, dtype, shape, bytes,
    and whether the op sits inside a while-loop body computation."""
    out = []
    # computations look like:  %body.123 (...) -> ... {   ... ops ... }
    # track which computation each line belongs to, and which are bodies
    body_names = set(
        m.group(1)
        for m in re.finditer(r"while\(.*?\), condition=%?([\w.-]+)", hlo_text)
    )
    body_names |= set(
        m.group(1)
        for m in re.finditer(r"body=%?([\w.-]+)", hlo_text)
    )
    current = None
    for line in hlo_text.splitlines():
        m_comp = re.match(r"\s*%?([\w.-]+)\s*\([^)]*\)\s*->", line)
        if m_comp and "{" in line:
            current = m_comp.group(1)
        for kind in COLLECTIVES:
            m = re.search(
                r"=\s*\(?([a-z0-9]+)\[([\d,]*)\]", line
            )
            if f" {kind}(" in line and m:
                dt, dims = m.group(1), m.group(2)
                shape = [int(x) for x in dims.split(",")] if dims else []
                nbytes = int(np.prod(shape)) * DTYPE_BYTES.get(dt, 4) if shape else DTYPE_BYTES.get(dt, 4)
                out.append(dict(
                    kind=kind, dtype=dt, shape=shape, bytes=nbytes,
                    in_loop_body=current in body_names if current else False,
                ))
    return out


def run_capture(mesh_shape, num_features=512, k=8, rows=2000, task="r"):
    import jax

    from libfm_tpu.data.synth import movielens_like
    from libfm_tpu.learners.mcmc_vector import MCMCVectorLearner
    from libfm_tpu.models.fm import FMConfig
    from libfm_tpu.parallel.mesh import make_mesh

    data, model = mesh_shape
    mesh = make_mesh(data=data, model=model,
                     devices=jax.devices()[: data * model])
    train, test = movielens_like(
        num_users=num_features // 2, num_items=num_features // 2,
        num_ratings=rows, seed=0,
    )
    lr = MCMCVectorLearner(
        FMConfig(num_features=train.num_features, num_factors=k),
        num_iter=9, seed=0, verbose=False, mesh=mesh,
    )
    lr.capture_hlo = True
    lr.learn(train, test)
    report = {}
    for L, h in lr._hlo.items():
        inv = collective_inventory(h["text"])
        agg = {}
        for op in inv:
            key = (op["kind"], op["dtype"], tuple(op["shape"]),
                   op["in_loop_body"])
            agg[key] = agg.get(key, 0) + 1
        report[str(L)] = dict(
            n_collectives=len(inv),
            total_static_bytes=sum(op["bytes"] for op in inv),
            ops=[
                dict(kind=k_[0], dtype=k_[1], shape=list(k_[2]),
                     in_loop_body=k_[3], count=c,
                     bytes_each=int(
                         np.prod(k_[2]) * DTYPE_BYTES.get(k_[1], 4)
                     ) if k_[2] else DTYPE_BYTES.get(k_[1], 4))
                for k_, c in sorted(
                    agg.items(),
                    key=lambda kv: -np.prod(kv[0][2]) if kv[0][2] else 0,
                )
            ],
            cost_analysis={
                k_: float(v) for k_, v in (h["cost"] or {}).items()
                if isinstance(v, (int, float)) and k_ in (
                    "flops", "bytes accessed", "optimal_seconds",
                )
            },
        )
    return report


def analytic_projection():
    """Dominant-term projection at bench shapes. The per-iteration
    collective volume of the flat engine is dominated by the
    per-feature sufficient statistics (GG) reduction over the data
    axis; A-table updates and slot layouts are data-sharded and local;
    metric/hyperprior reductions are O(G k) scalars."""
    ICI = 4.5e10
    DCN = 1.25e10

    def ring_ar(bytes_, n):
        return 2 * (n - 1) / n * bytes_

    configs = {}
    # config #3 (headline): ML-10M k=64, 2 one-hot blocks (users 71567,
    # items 10681) -> GG rows ~ F per block, GW = T + 2k + 2
    k = 64
    T = k * (k + 1) // 2
    GW = T + 2 * k + 2
    F_total = 71567 + 10681
    gg_bytes = F_total * GW * 4
    theta_bytes = F_total * (k + 1) * 4
    # THE dominant as-lowered term (phase-1 HLO inventory): the SPMD
    # partitioner ALL-GATHERS the data-sharded A=[e|Q] table for the
    # slot-layout gathers — ~11 all-gathers per 7-step fast chunk plus
    # 6 on the refresh chunk => ~2.3 full-table all-gathers per
    # iteration. At bench scale A = (9M + 262K) x 65 x 4 B = 2.41 GB.
    A_bytes = (9_000_000 + (1 << 18)) * (1 + k) * 4
    ag_per_iter = 11 / 7 + 6 / 8
    t_compute_1chip = 0.808  # measured BENCH r5 (chunked dispatch)
    for hosts, chips in ((1, 8), (2, 16)):
        # as-lowered: A all-gathers ride the slowest axis the data dim
        # crosses (ICI within a host; DCN when data spans hosts)
        t_ag_ici = ag_per_iter * (7 / 8) * A_bytes / ICI
        t_ag_dcn = (
            0.0 if hosts == 1
            else ag_per_iter * 0.5 * A_bytes / DCN
        )
        t_gg = ring_ar(gg_bytes, 8) / ICI + (
            0.0 if hosts == 1
            else 2 * (hosts - 1) / hosts * (gg_bytes / 8) / DCN
        )
        t_comp = t_compute_1chip / chips
        configs.setdefault("ml_k64_dp_as_lowered", {})[
            f"{hosts}host_{chips}chip"
        ] = dict(
            t_compute_s=round(t_comp, 4),
            t_A_allgather_s=round(t_ag_ici + t_ag_dcn, 4),
            t_gg_reduce_s=round(t_gg, 4),
            t_iter_s=round(t_comp + t_ag_ici + t_ag_dcn + t_gg, 4),
        )
    al = configs["ml_k64_dp_as_lowered"]
    al["efficiency_2host_vs_1host"] = round(
        al["1host_8chip"]["t_iter_s"]
        / al["2host_16chip"]["t_iter_s"] / 2, 3
    )
    al["verdict"] = (
        "FAILS the >=80% bar as lowered: the slot-path A all-gathers "
        "(2.3 x 2.41 GB per iteration) dominate — DP sharding of A is "
        "correctness-complete but not communication-efficient."
    )
    # fixed lowering: slot layouts partitioned by CASE shard so the A
    # gathers stay shard-local (layouts are built host-side — each data
    # shard gets the segments whose cases it owns; cross-shard features
    # contribute partial stats combined by the existing GG reduction),
    # and the GG reduction becomes reduce-scatter + feature-sharded
    # draws + theta all-gather (the TP=model path applied along data).
    for hosts, chips in ((1, 8), (2, 16)):
        t_rs = (7 / 8) * (gg_bytes + theta_bytes) / ICI + (
            0.0 if hosts == 1
            else (gg_bytes / 8 + theta_bytes) / DCN
        )
        t_comp = t_compute_1chip / chips
        configs.setdefault("ml_k64_dp_shardlocal_fix", {})[
            f"{hosts}host_{chips}chip"
        ] = dict(
            t_compute_s=round(t_comp, 4), t_comm_s=round(t_rs, 4),
            t_iter_s=round(t_comp + t_rs, 4),
        )
    fx = configs["ml_k64_dp_shardlocal_fix"]
    fx["efficiency_2host_vs_1host"] = round(
        fx["1host_8chip"]["t_iter_s"]
        / fx["2host_16chip"]["t_iter_s"] / 2, 3
    )
    configs["ml_k64_dp_volumes"] = dict(
        A_allgather_bytes_each=A_bytes, allgathers_per_iter=ag_per_iter,
        gg_reduce_bytes=gg_bytes, theta_bytes=theta_bytes,
    )

    # config #5: LV k=128, 1.04M features, TP model=4: GG/MOM are
    # model-sharded (no data-axis GG all-reduce of the dense path);
    # cross-axis costs are the V-row gathers for data-sharded slot
    # chunks + the A-update exchanges.
    k5 = 128
    T5 = k5 * (k5 + 1) // 2
    GW5 = T5 + 2 * k5 + 2
    F5 = 1_040_000
    configs["lv_k128_tp"] = dict(
        gg_sharded_bytes_per_model_shard=int(F5 * GW5 * 4 / 4),
        v_table_bytes=F5 * (k5 + 1) * 4,
        note="with model=4 TP the [F, GW] stats (4.3 GB at f32!) live "
             "sharded — they never cross the wire whole; the wire cost "
             "is the per-chunk V-row exchange (bounded by nnz per "
             "iteration x (1+k) x 4 B = 2.7M x 26 x 129 x 4 / iter "
             "only if every gather crossed shards; XLA's gather "
             "partitioning keeps hits local when feature blocks align "
             "with shards). Single-chip iter 5.81 s is compute-bound "
             "(BENCHNOTES roofline), so 2-host DP on top of TP=4 "
             "projects > 90% efficiency: the data-axis reduction is "
             "the model-sharded GG (1.07 GB/shard intra-host ICI "
             "~24 ms vs 2.9 s compute/chip at 2-way DP).",
    )
    t5_ici = ring_ar(F5 * GW5 * 4 / 4, 2) / ICI
    configs["lv_k128_tp"]["2host_8chip_tp4_dp2"] = dict(
        t_compute_s=round(5.81 / 2, 3),
        t_ici_allreduce_s=round(t5_ici, 4),
        efficiency_vs_1host=round(
            (5.81 / 1) / (5.81 / 2 + t5_ici) / 2, 3
        ),
    )
    return configs


def main():
    _pin_cpu(8)
    out = {"assumptions": {
        "ici_bytes_per_s": 4.5e10, "dcn_bytes_per_s": 1.25e10,
        "overlap": "none (conservative)",
        "ring_allreduce_factor": "2(N-1)/N",
    }}
    print("capturing DP (data=8) HLO...", flush=True)
    out["hlo_dp_data8"] = run_capture((8, 1))
    print("capturing TP (data=2, model=4) HLO...", flush=True)
    out["hlo_tp_d2m4"] = run_capture((2, 4), k=16)
    out["projection"] = analytic_projection()
    with open("studies/results/scaling_projection_r5.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out["projection"], indent=1))
    print("wrote studies/results/scaling_projection_r5.json")


if __name__ == "__main__":
    main()
