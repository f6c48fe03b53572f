"""Bound config #5's GG fat-row scatter cost: run with the profiling
override _stats_store='slice' (WRONG results, real timings) and compare
to the 6.24 s/iter default."""
import argparse
import json
import sys

sys.path.insert(0, "/root/repo")
import bench
import libfm_tpu.learners.mcmc_vector as mv

orig_init = mv.MCMCVectorLearner.__init__


def patched(self, *a, **k):
    orig_init(self, *a, **k)
    self._stats_store = "slice"


mv.MCMCVectorLearner.__init__ = patched
args = argparse.Namespace(ratings=3_000_000, iters=5)
r = bench.bench_largevocab(args)
out = {"s_per_iter": r["value"], "note": "stats_store=slice, wrong results"}
print(json.dumps(out), flush=True)
open("/root/repo/studies/results/lv_scatterbound.json", "w").write(
    json.dumps(out, indent=1))
