"""ALS 0.161 -> 0.2697 regression bisect: run bench_als from three
checkouts (HEAD, pre-latent 8320bd0, pre-whole-feature a44cda0)."""
import argparse
import json
import sys

results = {}
for name, root in (
    ("head", "/root/repo"),
    ("prelatent", "/tmp/wt_prelatent"),
    ("prewhole", "/tmp/wt_prewhole"),
):
    # purge repo modules, then import from this root
    for m in [m for m in sys.modules
              if m.split(".")[0] in ("libfm_tpu", "bench")]:
        del sys.modules[m]
    sys.path.insert(0, root)
    try:
        import bench

        assert bench.__file__.startswith(root), bench.__file__
        args = argparse.Namespace(ratings=10_000_000, iters=5)
        r = bench.bench_als(args)
        results[name] = {"s_per_iter": r["value"], "vs": r["vs_baseline"],
                         "rmse": r["detail"]["test_rmse"]}
        print(name, results[name], flush=True)
    finally:
        sys.path.remove(root)
open("/root/repo/studies/results/als_bisect.json", "w").write(
    json.dumps(results, indent=1))
