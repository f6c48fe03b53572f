"""Statistical tests for the device samplers (ops/samplers.py) against
closed-form moments — the TPU-native replacements for the reference's
rejection samplers (/root/reference/src/util/random.h)."""

import numpy as np
import pytest
from scipy import stats as sps

import jax
import jax.numpy as jnp

from libfm_tpu.ops import samplers

N = 200_000
KEY = jax.random.PRNGKey(42)


def test_gaussian_moments():
    x = np.asarray(samplers.gaussian(KEY, 2.0, jnp.full((N,), 3.0)))
    assert abs(x.mean() - 2.0) < 0.05
    assert abs(x.std() - 3.0) < 0.05


def test_gaussian_or_mean_degenerate():
    x = samplers.gaussian_or_mean(KEY, 5.0, jnp.zeros(4))
    assert np.allclose(np.asarray(x), 5.0)
    x = samplers.gaussian_or_mean(KEY, 5.0, jnp.full(4, jnp.nan))
    assert np.allclose(np.asarray(x), 5.0)


@pytest.mark.parametrize("alpha,beta", [(0.5, 1.0), (2.0, 3.0), (10.0, 0.5)])
def test_gamma_moments(alpha, beta):
    x = np.asarray(samplers.gamma(KEY, jnp.full((N,), alpha), beta))
    assert abs(x.mean() - alpha / beta) < 0.05 * max(1.0, alpha / beta)
    assert abs(x.var() - alpha / beta**2) < 0.1 * max(1.0, alpha / beta**2)


@pytest.mark.parametrize("mu", [-2.0, 0.0, 1.5])
def test_left_truncated_gaussian(mu):
    """E[z | z>=0, z~N(mu,1)] = mu + phi(mu)/Phi(mu)."""
    x = np.asarray(
        samplers.left_truncated_gaussian(KEY, 0.0, jnp.full((N,), mu), 1.0)
    )
    assert (x >= 0).all()
    want = mu + sps.norm.pdf(mu) / sps.norm.cdf(mu)
    assert abs(x.mean() - want) < 0.02, (x.mean(), want)
    # expectation helper agrees with the closed form
    got = float(samplers.left_tn_expectation(jnp.asarray(mu)))
    assert abs(got - want) < 1e-4


@pytest.mark.parametrize("mu", [-1.5, 0.0, 2.0])
def test_right_truncated_gaussian(mu):
    x = np.asarray(
        samplers.right_truncated_gaussian(KEY, 0.0, jnp.full((N,), mu), 1.0)
    )
    assert (x <= 0).all()
    want = mu - sps.norm.pdf(mu) / sps.norm.cdf(-mu)
    assert abs(x.mean() - want) < 0.02, (x.mean(), want)
    got = float(samplers.right_tn_expectation(jnp.asarray(mu)))
    assert abs(got - want) < 1e-4


def test_cdf_gaussian_matches_scipy():
    xs = jnp.linspace(-4, 4, 101)
    got = np.asarray(samplers.cdf_gaussian(xs))
    want = sps.norm.cdf(np.asarray(xs))
    assert np.abs(got - want).max() < 1e-6


def test_finite_or_counts():
    new = jnp.asarray([1.0, jnp.nan, 3.0, jnp.inf])
    old = jnp.asarray([9.0, 9.0, 9.0, 9.0])
    out, n = samplers.finite_or(new, old)
    assert np.allclose(np.asarray(out), [1.0, 9.0, 3.0, 9.0])
    assert int(n) == 2


def test_gamma_broadcasts_alpha_against_rate():
    """A [G,1] shape with a [G,k] rate must draw k INDEPENDENT variates
    per group — jax.random.gamma takes its sample shape from alpha, so
    without broadcasting all k columns would share one variate (the
    v_lambda hyperprior draw pattern)."""
    import jax

    key = jax.random.PRNGKey(0)
    alpha = jnp.full((3, 1), 5.0)
    beta = jnp.full((3, 4), 2.0)
    draws = samplers.gamma(key, alpha, beta)
    assert draws.shape == (3, 4)
    # constant rate: identical columns would mean a shared variate
    assert float(jnp.std(draws[0])) > 0.0
    assert float(jnp.std(draws[1])) > 0.0


def test_tn_expectations_stable_in_the_tail():
    """E[z | z>=0, N(mu,1)] must stay finite and sane for deep-tail mu —
    the naive 1-Phi(-mu) form produced ~1e23 'finite garbage' beyond
    mu < -5.4 in f32, slipping past the NaN/Inf rejection rule."""
    mus = jnp.asarray([-50.0, -10.0, -6.0, -5.0, 0.0, 5.0, 10.0, 50.0])
    left = samplers.left_tn_expectation(mus)
    right = samplers.right_tn_expectation(-mus)
    assert bool(jnp.isfinite(left).all())
    # E[z | z >= 0] is positive, below mu + 1, and ~1/|mu| deep left
    assert bool((left > 0.0).all())
    assert float(left[0]) < 0.05  # mu=-50: hazard ~ 1/50
    assert abs(float(left[4]) - 0.7978845) < 1e-4  # mu=0: sqrt(2/pi)
    assert abs(float(left[-1]) - 50.0) < 1e-3  # mu=50: ~mu
    # symmetry: E[z|z<=0, mu] = -E[z|z>=0, -mu]
    assert bool(jnp.allclose(right, -left, atol=1e-4))


def test_finite_or_bound_rejects_runaway():
    """|new| > bound is the f32 analog of NaN (samplers.DRAW_BOUND): an
    astronomically large but finite draw starts an overflow cascade that
    f64 (the reference) never sees."""
    new = jnp.asarray([1.0, 2e6, -3e6, 5.0])
    old = jnp.asarray([9.0, 9.0, 9.0, 9.0])
    out, n = samplers.finite_or(new, old, bound=1e6)
    assert np.allclose(np.asarray(out), [1.0, 9.0, 9.0, 5.0])
    assert int(n) == 2
    # without a bound the huge values pass (backward compatible)
    out, n = samplers.finite_or(new, old)
    assert int(n) == 0


def test_draw_alpha_survives_runaway_residuals():
    """sum(e^2) overflowing f32 (or containing inf) must yield a TINY
    positive alpha, not 0.0 or a rejected-forever state — observed
    on-chip: a CTR probit chain died at iteration ~65 with alpha == 0.0
    when a runaway residual made gamma_n infinite (the f32 failure mode
    of fm_learn_mcmc.h:911-939, whose f64 never overflows)."""
    from libfm_tpu.learners.mcmc import draw_alpha

    key = jax.random.PRNGKey(0)
    for e in (
        jnp.full((1000,), 1e20, jnp.float32),          # e^2 == inf per case
        jnp.asarray([jnp.inf, 1.0, -jnp.inf] * 10),    # literal infs
        jnp.asarray([jnp.nan] * 10),                   # NaN residuals
    ):
        alpha, n_rej = draw_alpha(
            key, e, e.shape[0], jnp.asarray(0.7), 1.0, 1.0,
            do_multilevel=True, do_sample=True,
        )
        a = float(alpha)
        assert np.isfinite(a) and a > 0.0, (a, float(e[0]))

    # healthy residuals: the clamp never binds and the draw is the plain
    # conjugate gamma draw (bitwise path identical to the unclamped one)
    e = jax.random.normal(key, (1000,), jnp.float32)
    alpha, n_rej = draw_alpha(
        key, e, 1000, jnp.asarray(0.7), 1.0, 1.0, True, True
    )
    assert 0.2 < float(alpha) < 5.0 and int(n_rej) == 0


def test_blocked_theta_draw_bound_rejects():
    """A finite-but-runaway joint draw keeps the old theta when bound is
    set (and passes when it is not)."""
    from libfm_tpu.learners.mcmc_rel_vector import blocked_theta_draw

    k = 2
    F = 1
    # stats engineered for a huge posterior mean: tiny precision, big b
    GG = np.zeros((F, k * k + 2 * k + 2), np.float32)
    GG[:, 0] = 1e-8   # Qq[0,0]
    GG[:, 3] = 1e-8   # Qq[1,1]
    GG[:, k * k + k] = -1e4      # qe[0] -> b huge
    GG[:, k * k + 2 * k] = 1e-8  # aa
    th = jnp.zeros((F, 1 + k), jnp.float32)
    lam = jnp.full((F, 1 + k), 1e-8, jnp.float32)
    mu = jnp.zeros((F, 1 + k), jnp.float32)
    z = jnp.zeros((F, 1 + k), jnp.float32)
    new_unbounded, _ = blocked_theta_draw(
        jnp.asarray(GG), th, lam, mu, z, jnp.asarray(1.0), k, False
    )
    assert np.abs(np.asarray(new_unbounded)).max() > 1e6  # genuinely huge
    new_bounded, n_rej = blocked_theta_draw(
        jnp.asarray(GG), th, lam, mu, z, jnp.asarray(1.0), k, False,
        bound=1e6,
    )
    assert np.allclose(np.asarray(new_bounded), 0.0)
    assert int(n_rej) == 1
