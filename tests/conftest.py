"""Test configuration: run everything on a simulated 8-device CPU mesh.

XLA_FLAGS must be in the environment before the CPU backend initialises;
the platform choice must ALSO be forced via jax.config because this box's
site customisation programmatically selects the axon (TPU-tunnel) backend
and ignores the JAX_PLATFORMS env var.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


def pytest_addoption(parser):
    parser.addoption(
        "--slow",
        action="store_true",
        default=False,
        help="also run tests marked slow (multi-minute chains, golden "
        "runs vs the reference binary, multihost subprocess tests). "
        "`make test` runs the fast default; `make test-all` passes "
        "--slow.",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: deselected by default so `pytest tests/` finishes in "
        "minutes; run with --slow (VERDICT r3 weak #5)",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--slow"):
        return
    skip = pytest.mark.skip(reason="slow: run with --slow / make test-all")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def tiny_dataset():
    """A small one-hot user x item dataset (3 users, 4 items)."""
    from libfm_tpu.data.dataset import Dataset

    rows = [
        (5.0, [(0, 1.0), (3, 1.0)]),
        (3.0, [(1, 1.0), (4, 1.0)]),
        (1.0, [(2, 1.0), (5, 1.0)]),
        (4.0, [(0, 1.0), (4, 1.0)]),
        (2.0, [(1, 1.0), (6, 1.0)]),
        (5.0, [(2, 1.0), (3, 1.0)]),
    ]
    indptr = [0]
    cols, vals, ys = [], [], []
    for y, feats in rows:
        ys.append(y)
        for c, v in feats:
            cols.append(c)
            vals.append(v)
        indptr.append(len(cols))
    return Dataset.from_arrays(indptr, cols, vals, ys, num_features=7)
