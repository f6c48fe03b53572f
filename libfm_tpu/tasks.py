"""Task constants shared across learners.

Mirrors the reference's task encoding (0=regression, 1=classification),
see /root/reference/src/libfm/src/fm_learn.h:46-48.
"""

TASK_REGRESSION = 0
TASK_CLASSIFICATION = 1


def parse_task(s: str) -> int:
    """Parse the CLI task flag: 'r' -> regression, 'c' -> classification.

    Reference: /root/reference/src/libfm/libfm.cpp:298-309.
    """
    if s == "r":
        return TASK_REGRESSION
    if s == "c":
        return TASK_CLASSIFICATION
    raise ValueError(f"unknown task {s!r} (expected 'r' or 'c')")
