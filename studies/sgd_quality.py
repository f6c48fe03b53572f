"""SGD time-to-quality study: reference binary vs our packed-epoch SGD
on the two below-bar bench configs (VERDICT round-4 item #1).

Anchors the config #1 (SGD regression k=8, ML-10M synthetic) and
config #4b (SGD sigmoid classification k=16, CTR synthetic) throughput
numbers to quality: the reference binary runs AT ITS OWN SETTINGS
(-learn_rate 0.003 / 0.01, fm_learn_sgd_element.h:53-77) to
convergence, recording metric-vs-cumulative-wall per iteration from
rlog; our side then records wall_s_to_ref_metric per seed.

Wall accounting (conservative toward us):
  reference: cumulative (time_learn + time_pred) from rlog — this
    UNDERCOUNTS the reference's true wall (train-eval time is not in
    either field), so any win we report is a lower bound.
  ours: history learn seconds per epoch PLUS the measured eval
    overhead, INCLUDING iteration 0's jit compile.

Phases (ref is CPU-only and safe to run while the chip is busy; gen and
ref pin jax to CPU so they never claim the TPU — memory note
'axon-tpu-single-client'):
    python studies/sgd_quality.py gen    --config ml|ctr
    python studies/sgd_quality.py ref    --config ml --seeds 1-6 --iters 300 --jobs 3
    python studies/sgd_quality.py ours   --config ml --seeds 1-6 --iters 150 --lr 0.003 --bs 32768
    python studies/sgd_quality.py sweep  --config ml --iters 80   (one-seed lr/B grid)
    python studies/sgd_quality.py report --config ml
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_BIN = "/tmp/refbuild_test/bin/libFM"

CONFIGS = {
    # config #1: the bench.py `sgd` workload dataset + reference settings
    "ml": dict(
        work="/tmp/sgdq_ml",
        task="r",
        dim="1,1,8",
        lr=0.003,
        regular="0,0,0.01",
        metric="rmse",  # lower is better
        better="lower",
    ),
    # config #4b: the bench.py `sgdc` workload dataset + reference settings
    "ctr": dict(
        work="/tmp/sgdq_ctr",
        task="c",
        dim="1,1,16",
        lr=0.01,
        regular="0,0,0.01",
        metric="accuracy",  # higher is better
        better="higher",
    ),
}


def _pin_cpu():
    import jax

    jax.config.update("jax_platforms", "cpu")


def parse_seeds(s):
    if "-" in s:
        a, b = s.split("-")
        return list(range(int(a), int(b) + 1))
    return [int(x) for x in s.split(",")]


def _datasets(config):
    """The EXACT bench datasets (bench.py:159-177 / :270-274)."""
    from libfm_tpu.data.synth import ctr_like, movielens_like

    if config == "ml":
        train, test = movielens_like(
            num_users=71567, num_items=10681, num_ratings=10_000_000, seed=1
        )
        return train, test
    train, test, _ = ctr_like(
        num_fields=13, field_cardinality=5000, num_examples=2_000_000, seed=1
    )
    train.binarize_targets()
    test.binarize_targets()
    return train, test


def phase_gen(config):
    _pin_cpu()
    c = CONFIGS[config]
    os.makedirs(c["work"], exist_ok=True)
    train, test = _datasets(config)
    # binary .x/.y — the reference auto-detects (Data.h:120-124); SGD
    # needs no transpose (libfm.cpp:147)
    train.to_binary(f"{c['work']}/d.train", with_transpose=False)
    test.to_binary(f"{c['work']}/d.test", with_transpose=False)
    print(f"wrote {c['work']}/d.train(.x/.y) {train.num_rows} rows, "
          f"d.test {test.num_rows} rows")


def run_ref_one(args_tuple):
    config, seed, iters = args_tuple
    c = CONFIGS[config]
    rlog = f"{c['work']}/ref_rlog_{seed}.tsv"
    t0 = time.time()
    subprocess.run(
        [REF_BIN, "-task", c["task"], "-train", f"{c['work']}/d.train",
         "-test", f"{c['work']}/d.test", "-method", "sgd",
         "-dim", c["dim"], "-learn_rate", str(c["lr"]),
         "-regular", c["regular"], "-iter", str(iters),
         "-seed", str(seed), "-rlog", rlog],
        check=True, capture_output=True, text=True,
    )
    wall = time.time() - t0
    rows = np.genfromtxt(rlog, names=True)
    metric = rows[c["metric"] if c["task"] == "c" else "rmse"]
    cum = np.cumsum(rows["time_learn"] + rows["time_pred"])
    traj = [(float(t), float(m)) for t, m in zip(cum, metric)]
    best = (min if c["better"] == "lower" else max)(metric)
    return dict(seed=seed, final=float(metric[-1]), best=float(best),
                wall_s=wall, cum_learn_pred_s=float(cum[-1]), traj=traj)


def phase_ref(config, seeds, iters, jobs):
    from concurrent.futures import ProcessPoolExecutor

    c = CONFIGS[config]
    res = []
    with ProcessPoolExecutor(max_workers=jobs) as ex:
        for r in ex.map(run_ref_one,
                        [(config, s, iters) for s in seeds]):
            res.append(r)
            print(json.dumps({k: v for k, v in r.items() if k != "traj"}),
                  flush=True)
    with open(f"{c['work']}/ref_results.json", "w") as f:
        json.dump(res, f)


def _run_ours_one(config, train, test, seed, iters, lr, bs):
    from libfm_tpu.learners.sgd import SGDLearner
    from libfm_tpu.models.fm import FMConfig
    from libfm_tpu.tasks import TASK_CLASSIFICATION, TASK_REGRESSION

    c = CONFIGS[config]
    k = int(c["dim"].split(",")[2])
    cfg = FMConfig(num_features=train.num_features, num_factors=k, regv=0.01)
    task = TASK_REGRESSION if c["task"] == "r" else TASK_CLASSIFICATION
    learner = SGDLearner(cfg, task=task, num_iter=iters, learn_rate=lr,
                         batch_size=bs, seed=seed, verbose=False)
    t0 = time.time()
    learner.learn(train, test)
    wall = time.time() - t0
    h = learner.history  # (train_metric, test_metric, learn_dt)
    learn_s = [x[2] for x in h]
    # eval overhead (everything learn_dt missed, incl. both evals and
    # host bookkeeping), amortized per iteration; compile sits inside
    # learn_dt[0] so it is charged to the trajectory
    eval_s = max(0.0, wall - sum(learn_s)) / len(h)
    cum = np.cumsum([d + eval_s for d in learn_s])
    metric = [x[1] for x in h]
    best = (min if c["better"] == "lower" else max)(metric)
    return dict(seed=seed, lr=lr, bs=bs, final=float(metric[-1]),
                best=float(best), wall_s=wall,
                traj=[(float(t), float(m)) for t, m in zip(cum, metric)])


def phase_ours(config, seeds, iters, lr, bs):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    c = CONFIGS[config]
    train, test = _datasets(config)
    # merge with prior runs (same settings): single-seed jobs survive
    # tunnel hangs independently
    res = []
    if os.path.exists(f"{c['work']}/ours_results.json"):
        prior = json.load(open(f"{c['work']}/ours_results.json"))
        res = [
            r for r in prior
            if r["lr"] == lr and r["bs"] == bs and r["seed"] not in seeds
        ]
    for seed in seeds:
        r = _run_ours_one(config, train, test, seed, iters, lr, bs)
        res.append(r)
        print(json.dumps({k: v for k, v in r.items() if k != "traj"}),
              flush=True)
        # write after EVERY seed: a wedged TPU tunnel mid-run must not
        # lose the finished seeds (cost one 35-min re-run in round 5)
        with open(f"{c['work']}/ours_results.json", "w") as f:
            json.dump(res, f)


def phase_sweep(config, iters, grid=None):
    """One-seed (lr, B) grid; writes sweep_results.json ranked by
    wall-to-ref-median-final metric (needs ref phase done first)."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    c = CONFIGS[config]
    ref = json.load(open(f"{c['work']}/ref_results.json"))
    target = float(np.median([r["final"] for r in ref]))
    target_best = float(np.median([r["best"] for r in ref]))
    if grid is None:
        grid = ([(0.003, 32768), (0.01, 32768), (0.001, 32768),
                 (0.003, 8192), (0.01, 8192), (0.003, 4096)]
                if config == "ml" else
                [(1e-4, 8192), (3e-4, 8192), (1e-4, 2048), (3e-4, 2048),
                 (1e-3, 2048), (3e-5, 8192)])
    train, test = _datasets(config)
    res = []
    for lr, bs in grid:
        r = _run_ours_one(config, train, test, 1, iters, lr, bs)
        r["wall_to_ref_final"] = _wall_to(r["traj"], target, c["better"])
        r["wall_to_ref_best"] = _wall_to(r["traj"], target_best, c["better"])
        res.append(r)
        print(json.dumps({k: v for k, v in r.items() if k != "traj"}),
              flush=True)
    with open(f"{c['work']}/sweep_results.json", "w") as f:
        json.dump(res, f)
    print("ref targets: final", target, "best", target_best)


def _wall_to(traj, target, better):
    for t, m in traj:
        if (m <= target) if better == "lower" else (m >= target):
            return float(t)
    return None


def phase_report(config):
    c = CONFIGS[config]
    ref = json.load(open(f"{c['work']}/ref_results.json"))
    ours = json.load(open(f"{c['work']}/ours_results.json"))
    ref_wall = float(np.median([r["cum_learn_pred_s"] for r in ref]))
    rep = {
        "config": config,
        "metric": c["metric"] if c["task"] == "c" else "rmse",
        "ref_settings": {"dim": c["dim"], "lr": c["lr"],
                         "regular": c["regular"]},
        "ours_settings": {"lr": ours[0]["lr"], "bs": ours[0]["bs"]},
        "n_seeds": {"ref": len(ref), "ours": len(ours)},
        "ref_final_band": [float(min(r["final"] for r in ref)),
                           float(max(r["final"] for r in ref))],
        "ref_best_band": [float(min(r["best"] for r in ref)),
                          float(max(r["best"] for r in ref))],
        "ours_final_band": [float(min(r["final"] for r in ours)),
                            float(max(r["final"] for r in ours))],
        "ours_best_band": [float(min(r["best"] for r in ours)),
                           float(max(r["best"] for r in ours))],
        "ref_median_cum_learn_pred_s": ref_wall,
        "note": "ref wall = cumulative rlog time_learn+time_pred "
                "(undercounts ref true wall); ours wall includes compile "
                "+ amortized eval",
    }
    # two quality anchors: the reference's median FINAL metric (its
    # converged value at these settings) and its median BEST-ever
    # metric (the early-stopped optimum — the CTR reference SGD peaks
    # then overfits, so best >> final there)
    for name in ("final", "best"):
        target = float(np.median([r[name] for r in ref]))
        ref_ttq = [_wall_to(r["traj"], target, c["better"]) for r in ref]
        ttq = [_wall_to(r["traj"], target, c["better"]) for r in ours]
        hits = [t for t in ttq if t is not None]
        rhits = [t for t in ref_ttq if t is not None]
        rep[f"target_{name}"] = {
            "ref_median_" + name: target,
            "ref_wall_s_to_target": ref_ttq,
            "ref_median_wall_s_to_target":
                float(np.median(rhits)) if rhits else None,
            "ours_wall_s_to_target": ttq,
            "ours_median_wall_s_to_target":
                float(np.median(hits)) if hits else None,
            "hit_rate": f"{len(hits)}/{len(ttq)}",
        }
    out = f"studies/results/sgd_quality_report_r5_{config}.json"
    with open(out, "w") as f:
        json.dump(rep, f, indent=1)
    print(json.dumps(rep, indent=1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("phase", choices=["gen", "ref", "ours", "sweep", "report"])
    ap.add_argument("--config", choices=["ml", "ctr"], required=True)
    ap.add_argument("--seeds", default="1-6")
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--jobs", type=int, default=3)
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument("--bs", type=int, default=None)
    args = ap.parse_args()
    if args.phase == "gen":
        phase_gen(args.config)
    elif args.phase == "ref":
        phase_ref(args.config, parse_seeds(args.seeds), args.iters, args.jobs)
    elif args.phase == "ours":
        c = CONFIGS[args.config]
        lr = args.lr if args.lr is not None else c["lr"]
        bs = args.bs if args.bs is not None else 32768
        phase_ours(args.config, parse_seeds(args.seeds), args.iters, lr, bs)
    elif args.phase == "sweep":
        phase_sweep(args.config, args.iters)
    else:
        phase_report(args.config)


if __name__ == "__main__":
    main()
