"""Lane-parallel batched Cholesky and triangular solves for many SMALL
SPD systems.

XLA's `jnp.linalg.cholesky` on TPU runs the batched factorization far
above the VPU op floor for tiny matrices (measured ~3.6 us/system at
W=32, i.e. ~30 ms for a [8192, 32, 32] batch — about 200x the
elementwise floor). The trick here is a layout flip: store the batch
dimension LAST so it lives in the 128-wide vector lanes, and run the
factorization with full-width elementwise ops over all C systems at
once.

Round-5 rework: the original rank-1 right-looking loop rewrote the
whole [W, W, C] tile W times (~34 MB x 32 steps at the BS shapes —
the dominant draw cost, studies/results/bs_profile_r5.json). The
blocked form factors an 8-wide pivot panel with unrolled scalar steps
and applies ONE rank-8 trailing update per panel — W/8 full-tile
rewrites instead of W. The panel loop is UNROLLED for W <= 80 (static
slices fuse; the fori form measured ~0.9 s/iter slower on config #5's
W=32 dual pass) and a lax.fori_loop over dynamic-sliced fixed-size
panels above (unrolling d=129 panels ~2.5x'd the LV compile), with W
padded to a multiple of 8 by an IDENTITY diagonal block
(chol(blockdiag(M, I)) = blockdiag(chol(M), I), so the padding is
exact). Panel einsums run at
HIGHEST precision — TPU f32 einsum otherwise lowers to reduced-
precision MXU passes, and factorization updates must not round.

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

#: panel width for the blocked factorization/solves (see module doc)
_PANEL = 8


def _chol_block(T, pw):
    """Unrolled scalar Cholesky of one [pw, pw, C] pivot block (python
    loop — pw is the small static panel width)."""
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


def _pad_identity(M):
    """Pad [C, W, W] SPD systems to W' = ceil(W/8)*8 with an identity
    diagonal block (exact for factorization and solves)."""
    C, W, _ = M.shape
    Wp = -(-W // _PANEL) * _PANEL
    if Wp == W:
        return M, W
    Mp = jnp.zeros((C, Wp, Wp), M.dtype)
    Mp = Mp.at[:, :W, :W].set(M)
    idx = jnp.arange(W, Wp)
    Mp = Mp.at[:, idx, idx].set(1.0)
    return Mp, W


def cholesky_lanes(M: jax.Array) -> jax.Array:
    """Batched lower Cholesky of SPD matrices, batch-in-lanes layout.

    M: [C, W, W] symmetric positive definite.
    Returns L: [C, W, W] lower-triangular with M = L L^T (upper part
    zeroed), numerically equivalent to jnp.linalg.cholesky.
    """
    C, W0, _ = M.shape
    Mp, _ = _pad_identity(M)
    W = Mp.shape[1]
    A = jnp.moveaxis(Mp, 0, -1)  # [W, W, C] — batch in lanes
    P = _PANEL
    row = lax.broadcasted_iota(jnp.int32, (W, 1), 0)

    def panel_step(pi, A):
        p = pi * P
        T = lax.dynamic_slice(A, (p, p, 0), (P, P, C))
        Lp = _chol_block(T, P)
        # full-height panel at columns [p, p+P): rows above/inside the
        # pivot block are overwritten below; rows below solve X Lp^T = B
        B = lax.dynamic_slice(A, (0, p, 0), (W, P, C))
        X = _panel_solve(B, Lp, P)  # [W, P, C] (garbage above p+P)
        below = row >= p + P  # [W, 1]
        Xz = jnp.where(below[..., None], X, 0.0)
        # column strip: zeros above p, Lp in the pivot rows, X below
        strip = jnp.where(below[..., None], X, 0.0)
        strip = lax.dynamic_update_slice(strip, Lp, (p, 0, 0))
        A = lax.dynamic_update_slice(A, strip, (0, p, 0))
        # trailing update — Xz is zero outside the below-rows, so the
        # rank-P product vanishes outside the trailing block
        A = A - jnp.einsum(
            "ipc,jpc->ijc", Xz, Xz, precision=lax.Precision.HIGHEST
        )
        return A

    # W <= 80: unroll the panel loop (static slices fuse; measured
    # ~0.9 s/iter runtime cost of the fori form on config #5's dual
    # pass and ~45 ms on the ML-10M dense draws). Larger W keeps the
    # fori form — unrolling d=129 panels ~2.5x'd the LV compile.
    if W <= 80:
        for pi in range(W // P):
            A = panel_step(pi, A)
    else:
        A = lax.fori_loop(0, W // P, panel_step, A)
    i = lax.broadcasted_iota(jnp.int32, (W, W), 0)
    j = lax.broadcasted_iota(jnp.int32, (W, W), 1)
    L = jnp.where((i >= j)[..., None], A, 0.0)
    return jnp.moveaxis(L, -1, 0)[:, :W0, :W0]


def solve_lower_lanes(L: jax.Array, b: jax.Array) -> jax.Array:
    """Solve L y = b for lower-triangular L, batch-in-lanes.

    L: [C, W, W] lower-triangular, b: [C, W]. Returns y: [C, W].
    Blocked forward substitution: unrolled scalar steps inside each
    panel, one rank-P rhs update between panels.
    """
    C, W0, _ = L.shape
    Lp_, _ = _pad_identity(L)  # identity diag keeps solves exact
    W = Lp_.shape[1]
    Lt = jnp.moveaxis(Lp_, 0, -1)  # [W, W, C]
    bt = jnp.moveaxis(b, 0, -1)  # [W0, C]
    if W != W0:
        bt = jnp.concatenate(
            [bt, jnp.zeros((W - W0, C), b.dtype)], axis=0
        )
    P = _PANEL
    row = lax.broadcasted_iota(jnp.int32, (W, 1), 0)

    def panel_step(pi, bt):
        p = pi * P
        Lpp = lax.dynamic_slice(Lt, (p, p, 0), (P, P, C))
        bp = lax.dynamic_slice(bt, (p, 0), (P, C))
        ycols = []
        for j in range(P):
            acc = bp[j]
            for t in range(j):
                acc = acc - Lpp[j, t] * ycols[t]
            ycols.append(acc / Lpp[j, j])
        yp = jnp.stack(ycols, axis=0)  # [P, C]
        # rank-P update of every row below the panel
        Lcol = lax.dynamic_slice(Lt, (0, p, 0), (W, P, C))
        upd = jnp.einsum(
            "rjc,jc->rc", Lcol, yp, precision=lax.Precision.HIGHEST
        )
        bt = jnp.where(row > p + P - 1, bt - upd, bt)
        bt = lax.dynamic_update_slice(bt, yp, (p, 0))
        return bt

    if W <= 80:  # see cholesky_lanes: unroll small W for fusion
        yt = bt
        for pi in range(W // P):
            yt = panel_step(pi, yt)
    else:
        yt = lax.fori_loop(0, W // P, panel_step, bt)
    return jnp.moveaxis(yt[:W0], -1, 0)


def solve_upper_lanes(L: jax.Array, y: jax.Array) -> jax.Array:
    """Solve L^T x = y (L lower-triangular, so L^T upper), batch-in-lanes.

    L: [C, W, W] lower-triangular, y: [C, W]. Returns x: [C, W].
    Blocked back substitution from the last panel upward.
    """
    C, W0, _ = L.shape
    Lp_, _ = _pad_identity(L)
    W = Lp_.shape[1]
    Lt = jnp.moveaxis(Lp_, 0, -1)  # [W, W, C]
    yt = jnp.moveaxis(y, 0, -1)  # [W0, C]
    if W != W0:
        yt = jnp.concatenate(
            [yt, jnp.zeros((W - W0, C), y.dtype)], axis=0
        )
    P = _PANEL
    row = lax.broadcasted_iota(jnp.int32, (W, 1), 0)

    def panel_step(t_, yt):
        p = W - (t_ + 1) * P  # panel start, from the bottom
        Lpp = lax.dynamic_slice(Lt, (p, p, 0), (P, P, C))
        bp = lax.dynamic_slice(yt, (p, 0), (P, C))
        xcols: list = [None] * P
        for j in reversed(range(P)):
            acc = bp[j]
            for t in range(j + 1, P):
                acc = acc - Lpp[t, j] * xcols[t]  # L^T[j, t] = L[t, j]
            xcols[j] = acc / Lpp[j, j]
        xp = jnp.stack(xcols, axis=0)  # [P, C]
        # update rows above the panel: y[r] -= sum_t L[p+t, r] * x[t]
        Lrow = lax.dynamic_slice(Lt, (p, 0, 0), (P, W, C))  # [P, W, C]
        upd = jnp.einsum(
            "trc,tc->rc", Lrow, xp, precision=lax.Precision.HIGHEST
        )
        yt = jnp.where(row < p, yt - upd, yt)
        yt = lax.dynamic_update_slice(yt, xp, (p, 0))
        return yt

    if W <= 80:  # see cholesky_lanes: unroll small W for fusion
        xt = yt
        for t_ in range(W // P):
            xt = panel_step(t_, xt)
    else:
        xt = lax.fori_loop(0, W // P, panel_step, yt)
    return jnp.moveaxis(xt[:W0], -1, 0)


def cho_solve_lanes(L: jax.Array, b: jax.Array) -> jax.Array:
    """Solve (L L^T) x = b given the lane Cholesky factor L."""
    return solve_upper_lanes(L, solve_lower_lanes(L, b))
