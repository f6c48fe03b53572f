"""Config #5 (large-vocab k=128) phase profile.

Runs bench_largevocab once per skip-set and reports cycle-amortized
s/iter so the ~7 s iteration's composition is measured, not guessed.
Phases (learners/mcmc_vector.py): stats (slot-bucket GG pass), dense
(dense d x d Cholesky draws), dual (Woodbury c x c draws incl. their
slot gathers), update (e/Q cache update), residual-after-all-skips =
predict + probit refresh + hyperpriors + eval.

Run via the TPU worker: python studies/lv_profile.py
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def run_one(skips, ratings, iters):
    from bench import bench_largevocab

    class _A:
        pass

    _A.ratings = ratings
    _A.iters = iters

    import libfm_tpu.learners.mcmc_vector as mv

    orig_init = mv.MCMCVectorLearner.__init__

    def patched(self, *a, **k):
        orig_init(self, *a, **k)
        self._skip_phases = frozenset(skips)

    mv.MCMCVectorLearner.__init__ = patched
    try:
        t0 = time.time()
        r = bench_largevocab(_A)
    finally:
        mv.MCMCVectorLearner.__init__ = orig_init
    return r["value"], time.time() - t0


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    ratings, iters = 3_000_000, 5
    results = []
    for skips in ([], ["stats"], ["dense"], ["dual"], ["update"],
                  ["stats", "dense", "dual", "update"]):
        v, wall = run_one(skips, ratings, iters)
        results.append(dict(skip=skips, s_per_iter=v))
        print(f"skip={','.join(skips) or 'none':24s} {v:.4f} s/iter "
              f"(wall {wall:.0f}s)", flush=True)
    full = results[0]["s_per_iter"]
    for r in results[1:]:
        r["delta_ms"] = round((full - r["s_per_iter"]) * 1e3, 1)
    with open("/root/repo/studies/results/lv_profile.json", "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote studies/results/lv_profile.json", flush=True)


if __name__ == "__main__":
    main()
