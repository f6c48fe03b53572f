"""TPU smoke suite configuration (run with `make test-tpu`).

Unlike tests/ (which forces a simulated CPU mesh), this suite runs on
the REAL device jax selects — on this box the axon TPU tunnel. It exists
because CPU-only testing hides f32-on-TPU failure modes: f64 CPU math
masked the samplers' f32 tail issue in round 1, and TPU's default bf16
einsum precision silently diverged the BS engine's chain in round 3
(BENCHNOTES "TPU-only correctness bug") while every CPU test stayed
green. Keep this suite small (minutes, not hours): it is a smoke layer,
not the correctness suite.
"""

import jax
import numpy as np
import pytest


@pytest.fixture(scope="session", autouse=True)
def _require_accelerator():
    dev = jax.devices()[0]
    if dev.platform == "cpu":
        pytest.skip(
            "TPU smoke suite needs an accelerator (got CPU backend)",
            allow_module_level=True,
        )
    # persistent compile cache: repeat smoke runs skip the big compiles
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
