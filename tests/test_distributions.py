"""Distribution + bijector unit tests (reference: `src/distributions.jl`,
`test/unit/distributions.jl`)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from octofitter_tpu import distributions as d


ALL_DISTS = [
    d.Normal(1.0, 2.0),
    d.Uniform(-2.0, 5.0),
    d.LogNormal(0.5, 0.8),
    d.LogUniform(0.1, 100.0),
    d.Exponential(2.0),
    d.Beta(2.0, 3.0),
    d.Gamma(2.5, 1.5),
    d.TruncatedNormal(1.0, 2.0, 0.0, 4.0),
    d.Sine(),
]


@pytest.mark.parametrize("dist", ALL_DISTS, ids=lambda x: type(x).__name__)
def test_logpdf_normalizes(dist):
    # numerically integrate pdf over support
    lo, hi = dist.support
    lo = max(lo, -50.0) + 1e-9
    hi = min(hi, 200.0) - 1e-9
    x = jnp.linspace(lo, hi, 200001)
    p = jnp.exp(dist.logpdf(x))
    integral = float(jnp.trapezoid(p, x))
    assert abs(integral - 1.0) < 1e-3, f"{dist} integral={integral}"


@pytest.mark.parametrize("dist", ALL_DISTS, ids=lambda x: type(x).__name__)
def test_sample_matches_density(dist):
    key = jax.random.PRNGKey(0)
    xs = np.asarray(dist.sample(key, (200_000,)))
    lo, hi = dist.support
    assert np.all(xs > lo) and np.all(xs < hi)
    # moment check against numerical moments of the density
    glo = max(lo, np.percentile(xs, 0.001) - 5 * xs.std()) + 1e-9
    ghi = min(hi, np.percentile(xs, 99.999) + 5 * xs.std()) - 1e-9
    x = jnp.linspace(glo, ghi, 100001)
    p = np.exp(np.asarray(dist.logpdf(x)))
    mean_num = np.trapezoid(p * np.asarray(x), np.asarray(x))
    assert abs(xs.mean() - mean_num) < 0.05 * (1 + abs(mean_num))


@pytest.mark.parametrize("dist", ALL_DISTS, ids=lambda x: type(x).__name__)
def test_bijector_roundtrip_and_density(dist):
    bij = dist.bijector()
    key = jax.random.PRNGKey(1)
    x = dist.sample(key, (100,))
    y = bij.forward(x)
    x2 = bij.inverse(y)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x2), rtol=1e-10)
    assert bool(jnp.all(jnp.isfinite(y)))
    # transformed density integrates to 1 over y-space
    yy = jnp.linspace(-40.0, 40.0, 400001)
    lp = dist.logpdf(bij.inverse(yy)) + bij.logabsdet_inverse(yy)
    integral = float(jnp.trapezoid(jnp.exp(lp), yy))
    assert abs(integral - 1.0) < 2e-3


def test_sine_quantile():
    s = d.Sine()
    # quantile(p) = acos(1-2p): median is pi/2
    key = jax.random.PRNGKey(2)
    xs = np.asarray(s.sample(key, (100_000,)))
    assert abs(np.median(xs) - math.pi / 2) < 0.01


def test_kde_dist():
    rng = np.random.default_rng(0)
    data = rng.normal(3.0, 0.5, size=5000)
    k = d.KDEDist(data)
    key = jax.random.PRNGKey(3)
    xs = np.asarray(k.sample(key, (50_000,)))
    assert abs(xs.mean() - 3.0) < 0.05
    assert abs(xs.std() - 0.5) < 0.1
    # logpdf is finite inside, -inf outside
    assert np.isfinite(float(k.logpdf(3.0)))
    assert float(k.logpdf(k.lower - 1.0)) == -np.inf
    # differentiable
    g = jax.grad(lambda x: k.logpdf(x))(3.2)
    assert np.isfinite(float(g))


def test_truncated_factory():
    t = d.truncated(d.Normal(5.0, 2.0), lower=4.0, upper=8.0)
    assert isinstance(t, d.TruncatedNormal)
    assert t.support == (4.0, 8.0)


def test_uniform_improper():
    u = d.UniformImproper()
    assert float(u.logpdf(123.0)) == 0.0
    assert u.support == (-math.inf, math.inf)
