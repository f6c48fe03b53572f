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
