"""Lane-parallel batched Cholesky/solve vs the XLA reference ops."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from libfm_tpu.ops.lane_chol import (
    cho_solve_lanes,
    cholesky_lanes,
    solve_lower_lanes,
    solve_upper_lanes,
)


@pytest.mark.parametrize("C,W", [(7, 5), (64, 32), (16, 128), (3, 1)])
def test_lane_chol_matches_xla(C, W):
    rng = np.random.default_rng(C * 131 + W)
    P = rng.standard_normal((C, W, W))
    M = jnp.asarray(
        P @ np.swapaxes(P, 1, 2) / W + 3.0 * np.eye(W), jnp.float32
    )
    b = jnp.asarray(rng.standard_normal((C, W)), jnp.float32)

    L = cholesky_lanes(M)
    Lref = jnp.linalg.cholesky(M)
    assert float(jnp.abs(L - Lref).max()) < 1e-4

    y = solve_lower_lanes(L, b)
    yref = jax.scipy.linalg.solve_triangular(
        Lref, b[..., None], lower=True
    )[..., 0]
    assert float(jnp.abs(y - yref).max()) < 1e-4

    x = solve_upper_lanes(L, y)
    xref = jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(Lref, -1, -2), yref[..., None], lower=False
    )[..., 0]
    assert float(jnp.abs(x - xref).max()) < 1e-4

    full = cho_solve_lanes(L, b)
    ref = jax.scipy.linalg.cho_solve((Lref, True), b[..., None])[..., 0]
    assert float(jnp.abs(full - ref).max()) < 1e-4


def test_lane_chol_reconstructs():
    rng = np.random.default_rng(5)
    P = rng.standard_normal((9, 24, 24))
    M = jnp.asarray(P @ np.swapaxes(P, 1, 2) + 24 * np.eye(24), jnp.float32)
    L = cholesky_lanes(M)
    # strictly lower+diag only
    assert float(jnp.abs(jnp.triu(L, 1)).max()) == 0.0
    R = jnp.einsum("cij,ckj->cik", L, L)
    assert float(jnp.abs(R - M).max() / jnp.abs(M).max()) < 1e-5
