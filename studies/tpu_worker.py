"""Long-lived TPU worker: owns the device claim once and executes queued
job scripts sequentially (the axon tunnel wedges when claims cycle —
see memory note 'axon-tpu-single-client').

Protocol: watches /tmp/tpu_jobs/ for NNN_name.py files (sorted order),
execs each in-process (fresh globals, sys.argv = [path]), writes
NNN_name.done / NNN_name.err when finished, moves on. Poll loop; stop
by creating /tmp/tpu_jobs/STOP.
"""

import io
import os
import sys
import time
import traceback

JOBS = "/tmp/tpu_jobs"
os.makedirs(JOBS, exist_ok=True)

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp  # noqa: E402

t0 = time.time()
print(float(jnp.ones((8, 8)).sum()), "claim ok in",
      round(time.time() - t0, 1), "s", flush=True)

while True:
    if os.path.exists(os.path.join(JOBS, "STOP")):
        print("worker: STOP", flush=True)
        break
    pend = sorted(
        f for f in os.listdir(JOBS)
        if f.endswith(".py")
        and not os.path.exists(os.path.join(JOBS, f + ".done"))
        and not os.path.exists(os.path.join(JOBS, f + ".err"))
    )
    if not pend:
        time.sleep(2)
        continue
    job = pend[0]
    path = os.path.join(JOBS, job)
    print(f"worker: running {job}", flush=True)
    tj = time.time()
    try:
        # purge repo modules so each job sees CURRENT code (the worker
        # process is long-lived; a cached libfm_tpu from an earlier job
        # silently ignores edits — cost one stale 7-minute measurement
        # in round 4)
        for m in [m for m in sys.modules
                  if m.split(".")[0] in ("libfm_tpu", "bench", "sgd_floor")]:
            del sys.modules[m]
        # drop compiled-executable caches + their pinned HBM constants
        # from previous jobs: leftover buffers drove the ML headline
        # from 0.88 to 29.7 s/iter via HBM pressure (round-4 find)
        import gc

        jax.clear_caches()
        gc.collect()
        src = open(path).read()
        g = {"__name__": "__main__", "__file__": path}
        old_argv = sys.argv
        sys.argv = [path]
        try:
            exec(compile(src, path, "exec"), g)
        finally:
            sys.argv = old_argv
        open(path + ".done", "w").write(f"{time.time() - tj:.1f}s\n")
        print(f"worker: {job} done in {time.time() - tj:.1f}s", flush=True)
    except BaseException:
        traceback.print_exc()
        open(path + ".err", "w").write(traceback.format_exc())
        print(f"worker: {job} FAILED", flush=True)
