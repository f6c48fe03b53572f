"""Sweep _slot_budget on config #5 (current 5.70 s/iter at 1<<18):
fewer sequential dual-pass scan steps vs bigger gather temps."""
import argparse
import json
import sys

sys.path.insert(0, "/root/repo")
import bench
import libfm_tpu.learners.mcmc_vector as mv

out = []
for shift in (19, 20):
    orig_init = mv.MCMCVectorLearner.__init__

    def patched(self, *a, _s=1 << shift, **k):
        orig_init(self, *a, **k)
        self._slot_budget = _s

    mv.MCMCVectorLearner.__init__ = patched
    try:
        r = bench.bench_largevocab(
            argparse.Namespace(ratings=3_000_000, iters=5))
    finally:
        mv.MCMCVectorLearner.__init__ = orig_init
    row = {"slot_budget": 1 << shift, "s_iter": r["value"],
           "acc": r["detail"]["test_acc_mcmc_all"]}
    out.append(row)
    print(row, flush=True)
open("/root/repo/studies/results/slotbudget_sweep.json", "w").write(
    json.dumps(out, indent=1))
