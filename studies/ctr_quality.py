"""CTR classification quality study: reference binary vs the MCMC vector
engine, many seeds x long chains (VERDICT round-2 item #3).

Settles "is the accuracy gap chain variance or mixing bias" with
statistics: >=10 seeds x >=100 iterations per side on the same 450K-row
CTR synthetic (13 fields x 5000, ctr_like seed 1 — the round-2 study
dataset), no meta groups on either side. Also records the BASELINE
"Criteo AUC time-to-quality" metric: reference AUC is computed from its
`-out` prediction file (mean of posterior probabilities,
/root/reference/src/libfm/src/fm_learn_mcmc.h:380-404), ours from the
per-iteration `auc_all` history, giving wall-clock-to-equal-AUC.

Phases (run separately so the reference side can run on CPU while the
chip is busy):
    python studies/ctr_quality.py gen
    python studies/ctr_quality.py ref  --seeds 1-10 --iters 100 --jobs 3
    python studies/ctr_quality.py ours --seeds 1-10 --iters 100
    python studies/ctr_quality.py report
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

# runnable as `python studies/ctr_quality.py` from the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORK = "/tmp/ctr_quality"
REF_BIN = "/tmp/refbuild_test/bin/libFM"
N_EXAMPLES = 500_000  # -> 450K train / 50K test
DIM = "1,1,16"


def parse_seeds(s):
    if "-" in s:
        a, b = s.split("-")
        return list(range(int(a), int(b) + 1))
    return [int(x) for x in s.split(",")]


def auc(y_true_pm1, p):
    """ROC AUC via rank statistic (same formula as learners/base.py)."""
    y = np.asarray(y_true_pm1) > 0
    p = np.asarray(p, dtype=np.float64)
    order = np.argsort(p, kind="stable")
    ranks = np.empty(len(p), dtype=np.float64)
    ranks[order] = np.arange(1, len(p) + 1)
    # average ranks over ties
    ps = p[order]
    i = 0
    while i < len(ps):
        j = i
        while j + 1 < len(ps) and ps[j + 1] == ps[i]:
            j += 1
        if j > i:
            ranks[order[i : j + 1]] = 0.5 * (i + 1 + j + 1)
        i = j + 1
    n_pos = int(y.sum())
    n_neg = len(y) - n_pos
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    return float(
        (ranks[y].sum() - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)
    )


def phase_gen():
    from libfm_tpu.data.synth import ctr_like

    os.makedirs(WORK, exist_ok=True)
    train, test, _ = ctr_like(
        num_fields=13, field_cardinality=5000, num_examples=N_EXAMPLES, seed=1
    )
    train.to_libfm_text(f"{WORK}/c.train")
    test.to_libfm_text(f"{WORK}/c.test")
    np.save(f"{WORK}/y_test.npy", np.asarray(test.target))
    print(f"wrote {WORK}/c.train ({train.num_rows} rows), c.test "
          f"({test.num_rows} rows)")


def run_ref_one(seed, iters):
    outp = f"{WORK}/ref_pred_{seed}.txt"
    t0 = time.time()
    out = subprocess.run(
        [REF_BIN, "-task", "c", "-train", f"{WORK}/c.train",
         "-test", f"{WORK}/c.test", "-method", "mcmc", "-dim", DIM,
         "-iter", str(iters), "-seed", str(seed), "-out", outp],
        check=True, capture_output=True, text=True,
    ).stdout
    wall = time.time() - t0
    last = [l for l in out.splitlines() if l.startswith("#Iter")][-1]
    acc = float(last.rsplit("Test=", 1)[1].split()[0])
    ll = float(last.rsplit("Test(ll)=", 1)[1].split()[0])
    y_test = np.load(f"{WORK}/y_test.npy")
    p = np.loadtxt(outp)
    return dict(seed=seed, acc=acc, ll=ll, auc=auc(y_test, p), wall_s=wall)


def phase_ref(seeds, iters, jobs):
    from concurrent.futures import ProcessPoolExecutor

    res = []
    with ProcessPoolExecutor(max_workers=jobs) as ex:
        for r in ex.map(run_ref_one, seeds, [iters] * len(seeds)):
            res.append(r)
            print(json.dumps(r), flush=True)
    with open(f"{WORK}/ref_results.json", "w") as f:
        json.dump(res, f, indent=1)


def phase_ours(seeds, iters):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from libfm_tpu.data.dataset import Dataset
    from libfm_tpu.learners.mcmc_vector import MCMCVectorLearner
    from libfm_tpu.models.fm import FMConfig
    from libfm_tpu.tasks import TASK_CLASSIFICATION

    train = Dataset.from_libfm_text(f"{WORK}/c.train")
    test = Dataset.from_libfm_text(f"{WORK}/c.test")
    nf = max(train.num_features, test.num_features)
    train.num_features = test.num_features = nf
    train.binarize_targets()
    test.binarize_targets()
    res = []
    for seed in seeds:
        cfg = FMConfig(num_features=nf, num_factors=16)
        lr = MCMCVectorLearner(
            cfg, task=TASK_CLASSIFICATION, num_iter=iters, seed=seed,
            verbose=False,
        )
        t0 = time.time()
        lr.learn(train, test)
        wall = time.time() - t0
        h = lr.history
        r = dict(
            seed=seed,
            acc=h[-1]["test_all"],
            ll=h[-1]["test_all_m2"],
            auc=h[-1].get("auc_all"),
            wall_s=wall,
            # trajectory for time-to-quality: (cum wall s, auc_all)
            auc_traj=[
                (round(sum(x["time"] for x in h[: i + 1]), 3),
                 h[i].get("auc_all"))
                for i in range(len(h))
            ],
            acc_traj=[h[i]["test_all"] for i in range(len(h))],
        )
        res.append(r)
        print(json.dumps({k: v for k, v in r.items()
                          if k not in ("auc_traj", "acc_traj")}), flush=True)
    with open(f"{WORK}/ours_results.json", "w") as f:
        json.dump(res, f, indent=1)


def phase_report():
    ref = json.load(open(f"{WORK}/ref_results.json"))
    ours = json.load(open(f"{WORK}/ours_results.json"))

    def band(rs, k):
        v = np.array([r[k] for r in rs], dtype=np.float64)
        return dict(mean=float(v.mean()), min=float(v.min()),
                    max=float(v.max()), std=float(v.std(ddof=1)))

    rep = {
        "n_seeds": {"ref": len(ref), "ours": len(ours)},
        "ref": {k: band(ref, k) for k in ("acc", "ll", "auc")},
        "ours": {k: band(ours, k) for k in ("acc", "ll", "auc")},
    }
    # Welch t-statistic on accuracy
    a = np.array([r["acc"] for r in ref]); b = np.array([r["acc"] for r in ours])
    se = np.sqrt(a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b))
    rep["acc_gap"] = float(a.mean() - b.mean())
    rep["acc_gap_t"] = float((a.mean() - b.mean()) / se) if se > 0 else None
    rep["bands_overlap"] = bool(
        max(a.min(), b.min()) <= min(a.max(), b.max())
    )
    # AUC time-to-quality: our median wall-clock to reach the reference's
    # median final AUC, vs the reference's median total wall-clock
    ref_auc = float(np.median([r["auc"] for r in ref]))
    ttq = []
    for r in ours:
        hit = next((t for t, x in r["auc_traj"] if x is not None and
                    x >= ref_auc), None)
        ttq.append(hit)
    rep["auc_ttq"] = {
        "ref_median_final_auc": ref_auc,
        "ref_median_wall_s": float(np.median([r["wall_s"] for r in ref])),
        "ours_wall_s_to_ref_auc": ttq,
        "ours_median_wall_s_to_ref_auc":
            float(np.median([t for t in ttq if t is not None]))
            if any(t is not None for t in ttq) else None,
    }
    with open(f"{WORK}/report.json", "w") as f:
        json.dump(rep, f, indent=1)
    print(json.dumps(rep, indent=1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("phase", choices=["gen", "ref", "ours", "report"])
    ap.add_argument("--seeds", default="1-10")
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--jobs", type=int, default=3)
    args = ap.parse_args()
    if args.phase == "gen":
        phase_gen()
    elif args.phase == "ref":
        phase_ref(parse_seeds(args.seeds), args.iters, args.jobs)
    elif args.phase == "ours":
        phase_ours(parse_seeds(args.seeds), args.iters)
    else:
        phase_report()


if __name__ == "__main__":
    main()
