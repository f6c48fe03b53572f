"""Lane-parallel batched Cholesky and triangular solves for many SMALL
SPD systems.

XLA's `jnp.linalg.cholesky` on TPU runs the batched factorization far
above the VPU op floor for tiny matrices (measured ~3.6 us/system at
W=32, i.e. ~30 ms for a [8192, 32, 32] batch — about 200x the
elementwise floor). The trick here is a layout flip: store the batch
dimension LAST so it lives in the 128-wide vector lanes, and run the
classical right-looking factorization as W sequential steps, each step
one full-width masked elementwise update over all C systems at once.
FLOPs are ~3x the minimal W^3/6 (every step updates the full [W, W]
tile under a mask — static shapes, no gather), but every op is a dense
[W, W, C] VPU instruction, which is the currency that matters here.

Used by the MCMC vector engine for the dual (Woodbury) W x W draws and
the dense [k, k] Schur draws (learners/mcmc_vector.py). Semantics match
jnp.linalg.cholesky / solve_triangular on SPD inputs; no pivoting, no
NaN handling beyond IEEE (the engine's finite_or guard catches blowups
downstream, as it does for the XLA path).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def cholesky_lanes(M: jax.Array) -> jax.Array:
    """Batched lower Cholesky of SPD matrices, batch-in-lanes layout.

    M: [C, W, W] symmetric positive definite.
    Returns L: [C, W, W] lower-triangular with M = L L^T (upper part
    zeroed), numerically equivalent to jnp.linalg.cholesky.
    """
    C, W, _ = M.shape
    A = jnp.moveaxis(M, 0, -1)  # [W, W, C] — batch in lanes
    i = lax.broadcasted_iota(jnp.int32, (W, W), 0)
    j = lax.broadcasted_iota(jnp.int32, (W, W), 1)

    def step(jj, A):
        # pivot column jj: d = sqrt(A[jj, jj]); col = A[:, jj] / d for
        # rows > jj; trailing submatrix -= col col^T
        piv = lax.dynamic_slice(A, (jj, jj, 0), (1, 1, C))[0, 0]  # [C]
        d = jnp.sqrt(piv)
        coln = lax.dynamic_slice(A, (0, jj, 0), (W, 1, C))[:, 0]  # [W, C]
        col = coln / d  # [W, C]
        row_gt = lax.broadcasted_iota(jnp.int32, (W, 1), 0) > jj
        colz = jnp.where(row_gt, col, 0.0)  # rows <= jj zeroed
        # trailing update (masked to i > jj and j > jj)
        upd = colz[:, None, :] * colz[None, :, :]  # [W, W, C]
        mask = (i > jj) & (j > jj)
        A = A - jnp.where(mask[..., None], upd, 0.0)
        # write the finished column jj of L: [d at (jj, jj); col below]
        newcol = jnp.where(row_gt, col, jnp.where(
            lax.broadcasted_iota(jnp.int32, (W, 1), 0) == jj, d, 0.0
        ))
        A = lax.dynamic_update_slice(A, newcol[:, None, :], (0, jj, 0))
        return A

    A = lax.fori_loop(0, W, step, A)
    L = jnp.where((i >= j)[..., None], A, 0.0)
    return jnp.moveaxis(L, -1, 0)


def solve_lower_lanes(L: jax.Array, b: jax.Array) -> jax.Array:
    """Solve L y = b for lower-triangular L, batch-in-lanes.

    L: [C, W, W] lower-triangular, b: [C, W]. Returns y: [C, W].
    """
    C, W, _ = L.shape
    Lt = jnp.moveaxis(L, 0, -1)  # [W, W, C]
    bt = jnp.moveaxis(b, 0, -1)  # [W, C]

    def step(jj, bt):
        piv = lax.dynamic_slice(Lt, (jj, jj, 0), (1, 1, C))[0, 0]
        yj = lax.dynamic_slice(bt, (jj, 0), (1, C))[0] / piv  # [C]
        col = lax.dynamic_slice(Lt, (0, jj, 0), (W, 1, C))[:, 0]  # [W, C]
        row_gt = lax.broadcasted_iota(jnp.int32, (W, 1), 0) > jj
        bt = bt - jnp.where(row_gt, col * yj[None, :], 0.0)
        bt = lax.dynamic_update_slice(bt, yj[None, :], (jj, 0))
        return bt

    yt = lax.fori_loop(0, W, step, bt)
    return jnp.moveaxis(yt, -1, 0)


def solve_upper_lanes(L: jax.Array, y: jax.Array) -> jax.Array:
    """Solve L^T x = y (L lower-triangular, so L^T upper), batch-in-lanes.

    L: [C, W, W] lower-triangular, y: [C, W]. Returns x: [C, W].
    """
    C, W, _ = L.shape
    Lt = jnp.moveaxis(L, 0, -1)  # [W, W, C]
    yt = jnp.moveaxis(y, 0, -1)  # [W, C]

    def step(t, yt):
        jj = W - 1 - t
        piv = lax.dynamic_slice(Lt, (jj, jj, 0), (1, 1, C))[0, 0]
        xj = lax.dynamic_slice(yt, (jj, 0), (1, C))[0] / piv  # [C]
        # L^T row jj = L column jj: subtract L[jj+1:, jj] * xj from
        # y[... those rows map to ROWS < jj of the transposed system]:
        # (L^T x)[r] includes L[jj, r]^T ... use L's column structure:
        # for r < jj: y[r] -= L^T[r, jj] * xj = L[jj, r] * xj
        rowv = lax.dynamic_slice(Lt, (jj, 0, 0), (1, W, C))[0]  # [W, C]
        row_lt = lax.broadcasted_iota(jnp.int32, (W, 1), 0) < jj
        yt = yt - jnp.where(row_lt, rowv * xj[None, :], 0.0)
        yt = lax.dynamic_update_slice(yt, xj[None, :], (jj, 0))
        return yt

    xt = lax.fori_loop(0, W, step, yt)
    return jnp.moveaxis(xt, -1, 0)


def cho_solve_lanes(L: jax.Array, b: jax.Array) -> jax.Array:
    """Solve (L L^T) x = b given the lane Cholesky factor L."""
    return solve_upper_lanes(L, solve_lower_lanes(L, b))
