"""Tracing / profiling / memory observability.

The reference's observability is wall/user timers
(/root/reference/src/util/util.h:71-90) and a byte-counting MemoryLog
singleton (/root/reference/src/util/memory.h:31-62). The TPU equivalents:

- `trace(dir)` — context manager around `jax.profiler` producing an
  XPlane/perfetto trace of everything inside (CLI: `-profile DIR`).
- `device_memory_stats()` — live per-device allocation stats from PJRT.

Per-phase wall timing lives in `libfm_tpu.utils.timers` (StepTimer and
the iter_clocks() triple that feeds the rlog time_* fields).
"""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def trace(log_dir: str):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> list[dict]:
    """Per-device memory stats (bytes_in_use etc.) where the backend
    exposes them; empty list otherwise."""
    import jax

    out = []
    for d in jax.devices():
        try:
            s = d.memory_stats()
        except (AttributeError, NotImplementedError):
            s = None
        if s:
            out.append(
                dict(
                    device=str(d),
                    bytes_in_use=s.get("bytes_in_use"),
                    peak_bytes_in_use=s.get("peak_bytes_in_use"),
                    bytes_limit=s.get("bytes_limit"),
                )
            )
    return out
