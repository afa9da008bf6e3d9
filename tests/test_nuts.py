"""NUTS sampler correctness tests.

Strategy per SURVEY.md section 4: statistical gates with documented
tolerances — exact-moment checks on tractable targets, then the
end-to-end integration test lives in test_integration_sampling.py.
"""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from octofitter_tpu.chains import ess_rhat
from octofitter_tpu.samplers.nuts import run_nuts


pytestmark = pytest.mark.integration

def _run_on(logdensity, D, n_chains=8, n_warmup=500, n_samples=1000, seed=0,
            metric="dense"):
    vg = jax.value_and_grad(logdensity)
    key = jax.random.PRNGKey(seed)
    k0, krun = jax.random.split(key)
    theta0 = jax.random.normal(k0, (n_chains, D)) * 0.5
    samples, lps, stats, info = run_nuts(
        vg, theta0, krun, n_warmup=n_warmup, n_samples=n_samples,
        max_depth=10, metric=metric,
    )
    return np.asarray(samples), stats, info


def test_standard_gaussian_moments():
    D = 5

    def lp(x):
        return -0.5 * jnp.sum(x * x)

    samples, stats, info = _run_on(lp, D)
    flat = samples.reshape(-1, D)
    assert np.abs(flat.mean(axis=0)).max() < 0.05
    assert np.abs(flat.std(axis=0) - 1.0).max() < 0.05
    assert float(np.asarray(stats.is_divergent).mean()) < 0.01


def test_correlated_gaussian():
    # anisotropic scales force the metric adaptation to work
    D = 4
    scales = jnp.asarray([0.01, 0.1, 1.0, 10.0])

    def lp(x):
        return -0.5 * jnp.sum((x / scales) ** 2)

    samples, stats, info = _run_on(lp, D, n_warmup=1000, metric="diag")
    flat = samples.reshape(-1, D)
    ratio = flat.std(axis=0) / np.asarray(scales)
    assert np.abs(ratio - 1).max() < 0.1
    # adapted metric should be close to the true variances
    sigma = np.asarray(info["sigma"])
    med = np.median(sigma, axis=0)
    assert np.all(med / np.asarray(scales) ** 2 > 0.2)
    assert np.all(med / np.asarray(scales) ** 2 < 5.0)


def test_banana_no_nan_and_mixing():
    # Rosenbrock-like banana: hard geometry; just check finiteness,
    # reasonable acceptance and R-hat
    def lp(x):
        return -0.5 * (x[0] ** 2 / 4 + (x[1] - x[0] ** 2) ** 2)

    samples, stats, info = _run_on(lp, 2, n_chains=8, n_warmup=1000, n_samples=2000)
    assert np.all(np.isfinite(samples))
    ess, rhat = ess_rhat(samples[:, :, 0])
    assert rhat < 1.05
    assert ess > 100


def test_ess_rhat_sanity():
    rng = np.random.default_rng(0)
    iid = rng.standard_normal((4, 1000))
    ess, rhat = ess_rhat(iid)
    assert 2000 < ess < 6000
    assert abs(rhat - 1.0) < 0.01
    # stuck chain -> bad rhat
    stuck = iid.copy()
    stuck[0] += 10.0
    _, rhat2 = ess_rhat(stuck)
    assert rhat2 > 1.2


def test_ess_rhat_rank_normalized():
    """Rank normalization: heavy tails don't inflate/deflate diagnostics,
    and scale-only mis-mixing is caught by the folded component."""
    from octofitter_tpu.chains import ess_tail

    rng = np.random.default_rng(1)
    cauchy = rng.standard_cauchy((8, 1000))
    ess, rhat = ess_rhat(cauchy)
    assert 4000 < ess < 12000  # iid cauchy: near-nominal after ranks
    assert rhat < 1.01
    assert ess_tail(cauchy) > 1000
    # same location, different scales across chains -> folded rhat flags
    scales = np.ones((8, 1))
    scales[:4] = 5.0
    x = rng.standard_normal((8, 1000)) * scales
    _, rhat_sc = ess_rhat(x)
    assert rhat_sc > 1.1
    # constant column -> nan, not crash
    e, r = ess_rhat(np.ones((4, 100)))
    assert np.isnan(e) and np.isnan(r)


def test_hmc_sampler_moments():
    """Jittered-HMC path (the compile-light TPU sampler)."""
    D = 4

    def lp(x):
        return -0.5 * jnp.sum(x * x)

    vg = jax.value_and_grad(lp)
    theta0 = jax.random.normal(jax.random.PRNGKey(0), (8, D)) * 0.5
    samples, _, stats, _ = run_nuts(
        vg, theta0, jax.random.PRNGKey(1), n_warmup=500, n_samples=1000,
        metric="dense", sampler="hmc",
    )
    flat = np.asarray(samples).reshape(-1, D)
    assert np.abs(flat.mean(axis=0)).max() < 0.06
    assert np.abs(flat.std(axis=0) - 1.0).max() < 0.06
    assert float(np.asarray(stats.acceptance_rate).mean()) > 0.6
