"""Distribution samplers and links for the Bayesian learners.

TPU-native (threefry counter-based, fully vectorised, jit-safe) versions
of the reference's rejection samplers
(/root/reference/src/util/random.h:29-183):

- gaussian                  <- jax.random.normal (ref: Leva ratio-of-uniforms)
- gamma(alpha)/beta         <- jax.random.gamma  (ref: Marsaglia-Tsang)
- left/right trunc. normal  <- jax.random.truncated_normal
                               (ref: Robert's exponential rejection)
- probit link Phi           <- jax.scipy erf (ref: A&S 7.1.26 polynomial)

The reference's guard "stdev==0 or NaN -> return mean"
(/root/reference/src/util/random.h:164-170) is reproduced in
`gaussian_or_mean`, and every posterior draw site applies the NaN/Inf
keep-old-value rule (/root/reference/src/libfm/src/fm_learn_mcmc.h:700-724)
via `finite_or`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

INF = jnp.inf


def gaussian(key, mean, stdev):
    """mean + stdev * N(0,1), elementwise over broadcast shapes."""
    shape = jnp.broadcast_shapes(jnp.shape(mean), jnp.shape(stdev))
    z = jax.random.normal(key, shape, dtype=jnp.result_type(float))
    return mean + stdev * z


def gaussian_or_mean(key, mean, stdev):
    """Like the reference ran_gaussian(mean, stdev): returns mean where
    stdev is 0 or NaN (/root/reference/src/util/random.h:164-170)."""
    draw = gaussian(key, mean, stdev)
    ok = jnp.isfinite(stdev) & (stdev != 0.0)
    return jnp.where(ok, draw, mean)


def gamma(key, alpha, beta):
    """Gamma(shape=alpha, rate=beta) — the reference's ran_gamma(alpha,
    beta) = ran_gamma(alpha)/beta (/root/reference/src/util/random.h:144).

    alpha is broadcast against beta BEFORE sampling: jax.random.gamma
    takes its sample shape from alpha alone, so a [G,1] alpha with a
    [G,k] rate would silently reuse ONE standard-gamma variate across
    all k columns (perfectly correlated draws — not a draw from the
    joint conditional)."""
    shape = jnp.broadcast_shapes(jnp.shape(alpha), jnp.shape(beta))
    return jax.random.gamma(key, jnp.broadcast_to(alpha, shape)) / beta


def left_truncated_gaussian(key, left, mean, stdev):
    """Sample N(mean, stdev) conditioned on x >= left.

    Reference: ran_left_tgaussian (/root/reference/src/util/random.h:70-104).
    """
    shape = jnp.broadcast_shapes(
        jnp.shape(left), jnp.shape(mean), jnp.shape(stdev)
    )
    lo = jnp.broadcast_to((left - mean) / stdev, shape)
    z = jax.random.truncated_normal(key, lo, jnp.full_like(lo, INF))
    return mean + stdev * z


def right_truncated_gaussian(key, right, mean, stdev):
    """Sample N(mean, stdev) conditioned on x <= right.

    Reference: ran_right_tgaussian (/root/reference/src/util/random.h:106-112).
    """
    shape = jnp.broadcast_shapes(
        jnp.shape(right), jnp.shape(mean), jnp.shape(stdev)
    )
    hi = jnp.broadcast_to((right - mean) / stdev, shape)
    z = jax.random.truncated_normal(key, jnp.full_like(hi, -INF), hi)
    return mean + stdev * z


def cdf_gaussian(x):
    """Standard normal CDF Phi(x). Reference uses a polynomial erf
    approximation (/root/reference/src/util/random.h:45-67); we use the
    exact erf — differences are <1e-6 absolute."""
    return 0.5 * (1.0 + jax.scipy.special.erf(x * (1.0 / jnp.sqrt(2.0))))


def normal_pdf(x):
    return jnp.exp(-0.5 * x * x) / jnp.sqrt(2.0 * jnp.pi)


def _normal_hazard(a):
    """phi(a) / (1 - Phi(a)), stable for every a.

    The naive 1 - cdf_gaussian(-a) cancels catastrophically once
    a >~ 5.3 in float32 — the clamped denominator then produces a HUGE
    but finite expectation that slips past the finite_or rejection rule
    and destroys the residual cache (the reference's double math only
    fails at |a| > 8.2 and produces inf, which its guard catches).
    erfc keeps the tail exact to ~a = 10; beyond that the asymptotic
    expansion takes over (error < 1e-3 at the switch, shrinking fast)."""
    direct = normal_pdf(a) / jnp.maximum(
        0.5 * jax.scipy.special.erfc(a * (1.0 / jnp.sqrt(2.0))), 1e-38
    )
    a_safe = jnp.where(a > 6.0, a, 6.0)
    asym = a_safe + 1.0 / a_safe - 2.0 / a_safe**3 + 10.0 / a_safe**5
    return jnp.where(a > 6.0, asym, direct)


def left_tn_expectation(mu):
    """E[z | z ~ N(mu, 1), z >= 0] = mu + hazard(-mu) — the ALS
    (no-sampling) latent-target expectation, matching
    /root/reference/src/libfm/src/fm_learn_mcmc_simultaneous.h:177-182
    (which uses 3.141 for pi and the polynomial Phi; we use exact
    constants and a tail-stable hazard)."""
    return mu + _normal_hazard(-mu)


def right_tn_expectation(mu):
    """E[z | z ~ N(mu, 1), z <= 0] = mu - hazard(mu), matching reference
    lines 186-192."""
    return mu - _normal_hazard(mu)


# f32 runaway bound for PARAMETER draws (w0/w/V), scaled by the target
# magnitude at each learn(). In f64 (the reference) a rare huge-but-finite
# draw from an ill-conditioned posterior is harmless — the next sweep's
# conditional pulls it back. In f32 it overflows sum(e^2) (and then the
# per-feature statistics) within a couple of iterations, locking the
# chain into a permanent all-rejected state (observed on-chip: CTR probit
# chain dead at iteration ~65 with alpha == 0.0; BENCHNOTES "f32 runaway
# cascade"). Rejecting |draw| > bound (keep old, count it) is the f32
# analog of the reference's NaN/Inf rule: it never binds on a healthy
# chain (parameters are O(10), the default bound is 1e6 x target scale)
# and keeps every downstream statistic representable so the chain heals.
DRAW_BOUND = 1e6


def finite_or(new, old, bound=None):
    """Keep the old value wherever the new draw is NaN/Inf — the
    reference's per-draw rejection rule
    (/root/reference/src/libfm/src/fm_learn_mcmc.h:700-724) — or, with
    `bound`, wherever |new| exceeds it (the f32 runaway analog, see
    DRAW_BOUND). Returns (value, num_rejected)."""
    ok = jnp.isfinite(new)
    if bound is not None:
        ok = ok & (jnp.abs(new) <= bound)
    return jnp.where(ok, new, old), jnp.sum(~ok)
