"""Step timing helpers (reference: /root/reference/src/util/util.h:71-90).

On TPU the interesting timings are host wall-clock around blocked device
work plus optional jax.profiler traces; `StepTimer` provides both.
"""

from __future__ import annotations

import contextlib
import time

import jax


class StepTimer:
    def __init__(self):
        self.last = 0.0
        self.total = 0.0
        self.count = 0

    @contextlib.contextmanager
    def time(self, *arrays_to_block_on):
        t0 = time.perf_counter()
        yield
        for a in arrays_to_block_on:
            jax.block_until_ready(a)
        self.last = time.perf_counter() - t0
        self.total += self.last
        self.count += 1

    @property
    def mean(self) -> float:
        return self.total / max(self.count, 1)


def iter_clocks() -> tuple[float, float, float]:
    """Snapshot of (user-CPU s, process-CPU s, wall s) — the reference's
    getusertime / clock() / getusertime4 triple
    (/root/reference/src/util/util.h:71-90), which feed the rlog
    time_learn / time_learn2 / time_learn4 fields
    (fm_learn_mcmc_simultaneous.h:202-208). Subtract two snapshots."""
    import resource

    return (
        resource.getrusage(resource.RUSAGE_SELF).ru_utime,
        time.process_time(),
        time.perf_counter(),
    )


@contextlib.contextmanager
def profile_trace(logdir: str | None):
    """Wrap a region in a jax.profiler trace when logdir is given."""
    if logdir:
        with jax.profiler.trace(logdir):
            yield
    else:
        yield
