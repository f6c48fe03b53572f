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


DEFAULT_SKIPS = [[], ["caches"], ["mom"], ["draw"], ["upd"],
                 ["resync"], ["refresh"], ["rel"]]
# round-5 base bisection (VERDICT r4 item 2): the non-relational base,
# component by component (chunked dispatch already removed the ~25 ms
# per-iteration tunnel round-trip from it)
R5_SKIPS = [[], ["rel"], ["rel", "pred"], ["rel", "metrics"],
            ["rel", "hyper"], ["rel", "alphaw0"], ["rel", "unobs"],
            ["rel", "trainmetric"], ["rel", "refresh"],
            ["caches"], ["mom"], ["draw"], ["upd"], ["resync"]]


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    out = (sys.argv[1] if len(sys.argv) > 1
           else "studies/results/bs_profile_r4.json")
    skipsets = R5_SKIPS if "r5" in out else DEFAULT_SKIPS
    results = []
    for skips in skipsets:
        v, wall = run_one(skips)
        results.append(dict(skip=skips, s_per_iter=v))
        print(f"skip={','.join(skips) or 'none':20s} {v:.4f} s/iter "
              f"(wall {wall:.0f}s)", flush=True)
    full = results[0]["s_per_iter"]
    for r in results[1:]:
        r["delta_ms"] = round((full - r["s_per_iter"]) * 1e3, 2)
        print(f"  {','.join(r['skip']):20s} accounts for "
              f"{r['delta_ms']:.2f} ms", flush=True)
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
