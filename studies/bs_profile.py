"""BS fat-block phase profile (VERDICT r4 item 3).

Runs the bench_bs probe (1M cases, one 4000x16 gaussian block over 20K
features, k=32) once per skip-set and reports cycle-amortized s/iter,
so the 87 ms iteration's composition is measured, not guessed.
Phase names (learners/mcmc_rel_vector.py): caches (per-block-row cache
build), mom (per-feature moment assembly), draw (blocked Cholesky),
upd (s/dQB updates), resync, refresh, rel (the whole relation sweep).

Usage: python studies/bs_profile.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def run_one(skips):
    import jax

    from bench import bench_bs

    class _A:
        ratings = 1_000_000
        iters = 17

    import libfm_tpu.learners.mcmc_vector as mv

    orig_init = mv.MCMCVectorLearner.__init__

    def patched(self, *a, **k):
        orig_init(self, *a, **k)
        self._skip_phases = frozenset(skips)

    mv.MCMCVectorLearner.__init__ = patched
    try:
        t0 = time.time()
        r = bench_bs(_A)
    finally:
        mv.MCMCVectorLearner.__init__ = orig_init
    return r["value"], time.time() - t0


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    results = []
    for skips in ([], ["caches"], ["mom"], ["draw"], ["upd"],
                  ["resync"], ["refresh"], ["rel"]):
        v, wall = run_one(skips)
        results.append(dict(skip=skips, s_per_iter=v))
        print(f"skip={','.join(skips) or 'none':8s} {v:.4f} s/iter "
              f"(wall {wall:.0f}s)", flush=True)
    full = results[0]["s_per_iter"]
    for r in results[1:]:
        r["delta_ms"] = round((full - r["s_per_iter"]) * 1e3, 2)
        print(f"  {','.join(r['skip']):8s} accounts for "
              f"{r['delta_ms']:.2f} ms", flush=True)
    with open("studies/results/bs_profile_r4.json", "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote studies/results/bs_profile_r4.json")


if __name__ == "__main__":
    main()
