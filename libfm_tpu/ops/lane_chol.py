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
import numpy as np
from jax import lax


#: panel width for the blocked factorization/solves. 8 keeps the pivot
#: blocks tiny (unrolled scalar steps on [8, 8, C]) while cutting the
#: number of full-tile trailing updates by 8x — the scalar rank-1
#: right-looking loop rewrote the whole [W, W, C] tile W times, which
#: at W=32, C=2048 is ~34 MB x 32 steps of pure HBM traffic per
#: factorization (the dominant cost of the BS relation draws,
#: studies/results/bs_profile_r5.json).
_PANEL = 8


def _chol_block(T, pw):
    """Unrolled scalar Cholesky of one [pw, pw, C] pivot block (python
    loop — pw is a small static panel width)."""
    r = np.arange(pw)[:, None]
    cols = []
    for j in range(pw):
        d = jnp.sqrt(T[j, j])  # [C]
        col = T[:, j] / d  # [pw, C]
        colz = jnp.where(r > j, col, 0.0)
        cols.append(jnp.where(r == j, d, colz))
        # colz is zero at rows <= j, so the rank-1 product already
        # vanishes outside the trailing block — no mask needed
        T = T - colz[:, None, :] * colz[None, :, :]
    return jnp.stack(cols, axis=1)  # [pw, pw, C] lower


def _panel_solve(B, Lp, pw):
    """X with X Lp^T = B: forward substitution over the pw panel
    columns, unrolled. B: [R, pw, C], Lp: [pw, pw, C] lower."""
    xcols = []
    for j in range(pw):
        acc = B[:, j]
        for t in range(j):
            acc = acc - xcols[t] * Lp[j, t][None, :]
        xcols.append(acc / Lp[j, j][None, :])
    return jnp.stack(xcols, axis=1)  # [R, pw, C]


def cholesky_lanes(M: jax.Array) -> jax.Array:
    """Batched lower Cholesky of SPD matrices, batch-in-lanes layout.

    M: [C, W, W] symmetric positive definite.
    Returns L: [C, W, W] lower-triangular with M = L L^T (upper part
    zeroed), numerically equivalent to jnp.linalg.cholesky.

    Blocked right-looking algorithm (panel width _PANEL): each panel
    factors a tiny pivot block with unrolled scalar steps, solves the
    panel with unrolled forward substitution, and applies ONE rank-pw
    trailing update — W/_PANEL full-tile rewrites instead of W
    (measured 4-5x less HBM traffic at W=32; see _PANEL). The
    cross-panel updates accumulate rank-pw at once, so f32 rounding can
    differ from the rank-1 scalar order in the last ulps — same
    contract as any BLAS-blocked factorization."""
    C, W, _ = M.shape
    A = jnp.moveaxis(M, 0, -1)  # [W, W, C] — batch in lanes
    strips = []
    Atr = A  # trailing submatrix [W - p, W - p, C]
    p = 0
    while p < W:
        pw = min(_PANEL, W - p)
        Lp = _chol_block(Atr[:pw, :pw], pw)
        R = W - p - pw
        if R:
            X = _panel_solve(Atr[pw:, :pw], Lp, pw)
            Atr = Atr[pw:, pw:] - jnp.einsum(
                "ipc,jpc->ijc", X, X,
                precision=lax.Precision.HIGHEST,
            )
            strip = jnp.concatenate(
                [jnp.zeros((p, pw, C), M.dtype), Lp, X], axis=0
            )
        else:
            strip = jnp.concatenate(
                [jnp.zeros((p, pw, C), M.dtype), Lp], axis=0
            )
        strips.append(strip)
        p += pw
    L = strips[0] if len(strips) == 1 else jnp.concatenate(strips, axis=1)
    return jnp.moveaxis(L, -1, 0)


def solve_lower_lanes(L: jax.Array, b: jax.Array) -> jax.Array:
    """Solve L y = b for lower-triangular L, batch-in-lanes.

    L: [C, W, W] lower-triangular, b: [C, W]. Returns y: [C, W].
    Blocked forward substitution: unrolled scalar steps inside each
    _PANEL, one rank-pw rhs update between panels (same blocking
    rationale as cholesky_lanes).
    """
    C, W, _ = L.shape
    Lt = jnp.moveaxis(L, 0, -1)  # [W, W, C]
    rest = jnp.moveaxis(b, 0, -1)  # [W, C] — rows not yet solved
    ys = []
    p = 0
    while p < W:
        pw = min(_PANEL, W - p)
        Lp = Lt[p : p + pw, p : p + pw]
        bp = rest[:pw]
        ycols = []
        for j in range(pw):
            acc = bp[j]
            for t in range(j):
                acc = acc - Lp[j, t] * ycols[t]
            ycols.append(acc / Lp[j, j])
        yp = jnp.stack(ycols, axis=0)  # [pw, C]
        ys.append(yp)
        if W - p - pw:
            rest = rest[pw:] - jnp.einsum(
                "rjc,jc->rc", Lt[p + pw :, p : p + pw], yp,
                precision=lax.Precision.HIGHEST,
            )
        else:
            rest = rest[pw:]
        p += pw
    yt = ys[0] if len(ys) == 1 else jnp.concatenate(ys, axis=0)
    return jnp.moveaxis(yt, -1, 0)


def solve_upper_lanes(L: jax.Array, y: jax.Array) -> jax.Array:
    """Solve L^T x = y (L lower-triangular, so L^T upper), batch-in-lanes.

    L: [C, W, W] lower-triangular, y: [C, W]. Returns x: [C, W].
    Blocked back substitution from the last panel upward.
    """
    C, W, _ = L.shape
    Lt = jnp.moveaxis(L, 0, -1)  # [W, W, C]
    rest = jnp.moveaxis(y, 0, -1)  # [W, C]
    xs = []
    p = W
    while p > 0:
        pw = min(_PANEL, p)
        p0 = p - pw
        Lp = Lt[p0:p, p0:p]  # [pw, pw, C] lower
        bp = rest[p0:p]
        xcols: list = [None] * pw
        for j in reversed(range(pw)):
            acc = bp[j]
            for t in range(j + 1, pw):
                acc = acc - Lp[t, j] * xcols[t]  # L^T[j, t] = L[t, j]
            xcols[j] = acc / Lp[j, j]
        xp = jnp.stack(xcols, axis=0)  # [pw, C]
        xs.insert(0, xp)
        if p0:
            # remaining rows r < p0: y[r] -= sum_t L[t, r] * x[t]
            rest = rest[:p0] - jnp.einsum(
                "trc,tc->rc", Lt[p0:p, :p0], xp,
                precision=lax.Precision.HIGHEST,
            )
        p = p0
    xt = xs[0] if len(xs) == 1 else jnp.concatenate(xs, axis=0)
    return jnp.moveaxis(xt, -1, 0)


def cho_solve_lanes(L: jax.Array, b: jax.Array) -> jax.Array:
    """Solve (L L^T) x = b given the lane Cholesky factor L."""
    return solve_upper_lanes(L, solve_lower_lanes(L, b))
