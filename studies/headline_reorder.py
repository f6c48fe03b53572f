"""Bisect the round-4 headline regression: reorder vs slab mechanism.

Three variants of the ML-10M k=64 headline in ONE process (tunnel-safe):
  off     case_reorder disabled (round-3 behavior)
  noslab  cases reordered, but slab partition forced infeasible
          (slab_cases > nc) so buckets keep absolute ids
  slab    the shipped slab path

Usage: python studies/headline_reorder.py [--iters 17]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=17)
    ap.add_argument("--variants", nargs="*",
                    default=["off", "noslab", "slab"])
    args = ap.parse_args()
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from bench import _cycle_iter_s, _ml_data
    from libfm_tpu.learners.mcmc_vector import MCMCVectorLearner
    from libfm_tpu.models.fm import FMConfig

    class _A:
        ratings = 10_000_000

    train, test = _ml_data(_A)
    cfg = FMConfig(num_features=train.num_features, num_factors=64)
    results = []
    for variant in args.variants:
        l = MCMCVectorLearner(
            cfg, num_iter=args.iters + 1, seed=1, verbose=False
        )
        if variant == "off":
            l.case_reorder = False
        elif variant == "noslab":
            l.slab_cases = train.num_rows + 2  # partition infeasible
        elif variant == "slicestore":
            # WRONG RESULTS, timing only: prices the fat-row GG scatter
            l.case_reorder = False
            l._stats_store = "slice"
        elif variant == "statsskip":
            l.case_reorder = False
            l._skip_phases = frozenset({"stats"})
        t0 = time.time()
        l.learn(train, test)
        dt = _cycle_iter_s(l)
        results.append(dict(
            variant=variant, s_per_iter=round(dt, 4),
            rmse=round(float(l.history[-1]["test_all"]), 4),
            reordered=bool(getattr(l, "_case_reordered", False)),
            wall=round(time.time() - t0, 1),
        ))
        print(results[-1], flush=True)
    with open("studies/results/headline_reorder.json", "w") as fh:
        json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
