"""Config #5 reference baseline: the reference binary on the exact
large-vocab synthetic bench.py uses (26 zipf fields x 40000 -> 1.04M
features, 2.7M train rows, k=128, task=c), one CPU core.

Measured round 3 on this machine (rlog time_learn per-iteration over
5 iterations): [252.7, 259.2, 267.3, 257.9, 258.2] s -> median
258.2 s/iter, recorded as LV_BASELINE_S_PER_ITER in bench.py.

    python studies/lv_baseline.py [--iters 5]

Needs the reference binary (see .claude/skills/verify: rebuild with
`cp -r /root/reference/* /tmp/refbuild/ && cd /tmp/refbuild && make all`).
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_BIN = "/tmp/refbuild_test/bin/libFM"
WORK = "/tmp/lv_baseline"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--ref-bin", default=REF_BIN)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    from libfm_tpu.data.synth import ctr_like

    os.makedirs(WORK, exist_ok=True)
    train_p, test_p = f"{WORK}/lv.train", f"{WORK}/lv.test"
    if not os.path.exists(train_p):
        train, test, _ = ctr_like(
            num_fields=26, field_cardinality=40_000,
            num_examples=3_000_000, seed=1,
        )
        train.to_libfm_text(train_p)
        test.to_libfm_text(test_p)
        print("data written", flush=True)

    rlog = f"{WORK}/lv.rlog"
    t0 = time.time()
    out = subprocess.run(
        [args.ref_bin, "-task", "c", "-train", train_p, "-test", test_p,
         "-method", "mcmc", "-dim", "1,1,128", "-iter", str(args.iters),
         "-seed", "1", "-rlog", rlog],
        capture_output=True, text=True, timeout=14000,
    )
    print("rc", out.returncode, "wall", round(time.time() - t0, 1), flush=True)
    print(out.stdout[-1200:])
    rows = open(rlog).read().splitlines()
    hdr = rows[0].split("\t")
    i, j = hdr.index("time_learn"), hdr.index("time_learn4")
    times = [
        (float(r.split("\t")[i]), float(r.split("\t")[j])) for r in rows[1:]
    ]
    print(json.dumps({"time_learn_user_wall_per_iter": times}))


if __name__ == "__main__":
    main()
