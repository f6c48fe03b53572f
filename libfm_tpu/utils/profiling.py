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


def peak_memory_report() -> dict:
    """End-of-run memory accounting — the TPU analog of the reference's
    MemoryLog singleton (/root/reference/src/util/memory.h:31-62, called
    from every large allocation e.g. fm_learn_mcmc.h:1169-1177).

    Always carries the host's peak RSS (the byte counter the reference
    tracks lives on the host too); adds per-device PJRT stats where the
    backend exposes them (TPU does; the CPU test backend does not).
    """
    import resource

    ru = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    # ru_maxrss is KiB on Linux, bytes on macOS
    host_peak = int(ru) * (1 if ru > 1 << 34 else 1024)
    return dict(host_peak_rss_bytes=host_peak, devices=device_memory_stats())


def print_peak_memory_report() -> dict:
    """Print the report in the reference MemoryLog's spirit (one line per
    counter; memory.h:53-61 has the prints commented out, but the counter
    is maintained — here it is maintained AND reported)."""
    rep = peak_memory_report()
    print(f"#mem host_peak_rss_bytes={rep['host_peak_rss_bytes']}")
    for d in rep["devices"]:
        print(
            f"#mem device={d['device']} "
            f"peak_bytes_in_use={d['peak_bytes_in_use']} "
            f"bytes_in_use={d['bytes_in_use']}"
        )
    return rep
