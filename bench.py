"""Headline benchmark: MCMC Gibbs FM, k=64, ML-10M-scale (BASELINE config #3).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference libFM binary (g++ -O3, single thread) measured on
this machine at 94.1 s/Gibbs-iteration on the same synthetic ML-10M
dataset => 95.7K examples/s on one CPU core (see BASELINE.md "Measured
baseline"). vs_baseline is the per-chip speedup over that number; the
north-star target is >=10.
"""

import argparse
import json
import sys
import time

import numpy as np


BASELINE_EXAMPLES_PER_S = 95_700.0  # reference libFM, 1 CPU core (BASELINE.md)
# reference MCMC task=c -dim 1,1,16 on the same CTR synthetic (13 fields x
# 5000, 1.8M train rows), 1 CPU core: 9.63 s/iter measured => 187K ex/s
BASELINE_CTR_EXAMPLES_PER_S = 187_000.0


def bench_bs(args):
    """Fat-block relational (BS) regression: 1M cases joined to one
    4000-row x 16-entry gaussian block over 20K features, k=32 — the
    regime the VLDB'13 dedup algebra exists for. Reference binary on
    this shape: 0.39 s/iter (1 CPU core, rlog time_learn median)."""
    import json
    import time

    import numpy as np

    from libfm_tpu.data.dataset import Dataset
    from libfm_tpu.data.relation import RelationData, RelationJoin
    from libfm_tpu.learners.mcmc_vector import MCMCVectorLearner
    from libfm_tpu.models.fm import FMConfig

    rng = np.random.default_rng(7)
    NB, W, NF = 4000, 16, 20000
    NTR = min(args.ratings, 1_000_000)
    NTE = NTR // 10
    cols = np.stack(
        [np.sort(rng.choice(NF, W, replace=False)) for _ in range(NB)]
    ).astype(np.int32)
    vals = rng.standard_normal((NB, W)).astype(np.float32)
    rd = RelationData(
        np.arange(NB + 1, dtype=np.int64) * W, cols.ravel(), vals.ravel(), NF
    )
    rd.attr_offset = 0
    beta = rng.standard_normal(NF).astype(np.float32) * 0.1
    score = (vals * beta[cols]).sum(axis=1)

    def build(m, y):
        nc = len(y)
        ds = Dataset(
            np.zeros(nc + 1, np.int64), np.empty(0, np.int32),
            np.empty(0, np.float32), y, 0,
        )
        ds.relations = [RelationJoin(rd, m)]
        return ds

    mtr = rng.integers(0, NB, NTR).astype(np.int32)
    mte = rng.integers(0, NB, NTE).astype(np.int32)
    train = build(mtr, (score[mtr] + 0.3 * rng.standard_normal(NTR)).astype(np.float32))
    test = build(mte, (score[mte] + 0.3 * rng.standard_normal(NTE)).astype(np.float32))

    cfg = FMConfig(num_features=NF, num_factors=32)
    learner = MCMCVectorLearner(
        cfg, num_iter=args.iters + 1, seed=1, verbose=True
    )
    learner.expand_max_ratio = 0.0  # this shape expands ~15x; force BS form
    t0 = time.time()
    learner.learn(train, test)
    times = [h["time"] for h in learner.history[1:]]
    dt = float(np.median(times))
    print(
        json.dumps(
            {
                "metric": "mcmc_bs_fatblock_k32_seconds_per_iteration",
                "value": round(dt, 4),
                "unit": "s/iter",
                "vs_baseline": round(0.39 / dt, 2),
                "detail": {
                    "mode": learner.relational_mode,
                    "test_rmse_mcmc_all": round(
                        float(learner.history[-1]["test_all"]), 4
                    ),
                    "train_rows": train.num_rows,
                    "reference_s_per_iter": 0.39,
                    "total_wall_s": round(time.time() - t0, 1),
                },
            }
        )
    )


def bench_ctr(args):
    import json
    import time

    import numpy as np
    import jax

    from libfm_tpu.data.synth import ctr_like
    from libfm_tpu.learners.mcmc_vector import MCMCVectorLearner
    from libfm_tpu.models.fm import FMConfig
    from libfm_tpu.tasks import TASK_CLASSIFICATION

    n_ex = min(args.ratings, 2_000_000)
    train, test, groups = ctr_like(
        num_fields=13, field_cardinality=5000, num_examples=n_ex, seed=1
    )
    cfg = FMConfig(num_features=train.num_features, num_factors=16)
    learner = MCMCVectorLearner(
        cfg, task=TASK_CLASSIFICATION, num_iter=args.iters + 1, seed=1,
        verbose=True, attr_group=groups,
    )
    t0 = time.time()
    learner.learn(train, test)
    times = [h["time"] for h in learner.history[1:]]
    dt = float(np.median(times))
    ex_s = train.num_rows / dt
    print(
        json.dumps(
            {
                "metric": "mcmc_ctr_k16_classification_examples_per_s_per_chip",
                "value": round(ex_s, 1),
                "unit": "examples/s",
                "vs_baseline": round(ex_s / BASELINE_CTR_EXAMPLES_PER_S, 2),
                "detail": {
                    "median_iter_s": round(dt, 4),
                    "test_acc_mcmc_all": round(
                        float(learner.history[-1]["test_all"]), 4
                    ),
                    "train_rows": train.num_rows,
                    "device": str(jax.devices()[0]),
                    "total_wall_s": round(time.time() - t0, 1),
                },
            }
        )
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ratings", type=int, default=10_000_000)
    ap.add_argument("--factors", type=int, default=64)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--cpu", action="store_true", help="force CPU (debug)")
    ap.add_argument(
        "--workload", default="ml", choices=["ml", "ctr", "bs"],
        help="ml = MCMC regression (headline); ctr = Criteo-style "
        "classification (BASELINE config #4); bs = fat-block relational "
        "(BS vector engine)",
    )
    args = ap.parse_args()

    import jax

    # persistent compile cache: the vector engine's XLA program is large
    # and first-compile over the axon tunnel is minutes; repeat bench runs
    # hit the cache
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from libfm_tpu.data.synth import ctr_like, movielens_like
    from libfm_tpu.learners.mcmc_vector import MCMCVectorLearner
    from libfm_tpu.models.fm import FMConfig
    from libfm_tpu.tasks import TASK_CLASSIFICATION

    if args.workload == "ctr":
        return bench_ctr(args)
    if args.workload == "bs":
        return bench_bs(args)

    # cache the synthetic dataset on disk so repeat bench runs (driver
    # reruns, warm compile cache) skip the ~40 s generation
    import os

    from libfm_tpu.data import streaming as _st

    cache_prefix = f"/tmp/bench_ml_{args.ratings}"
    if os.path.exists(cache_prefix + ".train.indptr.npy"):
        train = _st.load_flat(cache_prefix + ".train", mmap=False)
        test = _st.load_flat(cache_prefix + ".test", mmap=False)
    else:
        train, test = movielens_like(
            num_users=71567, num_items=10681, num_ratings=args.ratings, seed=1
        )
        _st.save_flat(train, cache_prefix + ".train")
        _st.save_flat(test, cache_prefix + ".test")
    n = train.num_features
    cfg = FMConfig(num_features=n, num_factors=args.factors)
    import sys

    learner = MCMCVectorLearner(
        cfg, num_iter=args.iters + 1, seed=1, verbose=True
    )
    print("data ready; starting learn", file=sys.stderr, flush=True)

    # run learn() manually to separate compile (iter 0) from steady state
    learner.num_iter = args.iters + 1
    t_start = time.time()
    learner.learn(train, test)
    times = [h["time"] for h in learner.history[1:]]  # drop compile iter
    dt = float(np.median(times))
    ex_s = train.num_rows / dt
    rmse = learner.history[-1]["test_all"]

    print(
        json.dumps(
            {
                "metric": "mcmc_ml10m_k64_examples_per_s_per_chip",
                "value": round(ex_s, 1),
                "unit": "examples/s",
                "vs_baseline": round(ex_s / BASELINE_EXAMPLES_PER_S, 2),
                "detail": {
                    "median_iter_s": round(dt, 4),
                    "iters_timed": len(times),
                    "test_rmse_mcmc_all": round(float(rmse), 4),
                    "train_rows": train.num_rows,
                    "factors": args.factors,
                    "device": str(jax.devices()[0]),
                    "total_wall_s": round(time.time() - t_start, 1),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
