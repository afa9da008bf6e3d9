"""Rejection sampler validation (`octofit_rejection`).

Reference behavior: `/root/reference/src/sampling.jl:168-279` — IID
prior draws accepted with probability exp(ll - max_ll) against the
global maximum likelihood. Validated two ways:

1. Exactly, against the closed-form posterior of a conjugate
   Normal-Normal model (KS test on the analytic CDF).
2. Statistically, against the ChEES posterior on a small version of
   the quickstart astrometry model (quantile agreement).
"""

import pytest
import math

import jax
import jax.numpy as jnp
import numpy as np
from scipy import stats as sps

import octofitter_tpu as oc
from octofitter_tpu import distributions as dist
from octofitter_tpu.model.variables import UserLikelihood
from octofitter_tpu.samplers.driver import octofit, octofit_rejection


pytestmark = pytest.mark.integration

def _conjugate_model(mu0=0.0, s0=1.0, y=1.0, sy=0.5):
    obs = UserLikelihood(dist.Normal(y, sy), "x", name="obs1")
    system = oc.System(
        name="conjugate_rej",
        variables=dict(x=dist.Normal(mu0, s0)),
        observations=[obs],
    )
    return oc.LogDensityModel(system, verbosity=0)


def test_rejection_matches_analytic_posterior():
    model = _conjugate_model()
    chain = octofit_rejection(
        model,
        key=jax.random.PRNGKey(0),
        num_samples=4000,
        batch_size=20_000,
        verbosity=0,
    )
    x = chain.flat("x")
    assert len(x) == 4000
    # analytic posterior: precision 1 + 4 = 5 -> N(0.8, 1/sqrt(5))
    post_mean, post_sd = 0.8, math.sqrt(0.2)
    assert abs(x.mean() - post_mean) < 4 * post_sd / math.sqrt(len(x))
    assert abs(x.std() - post_sd) < 0.03
    # full-distribution agreement: KS against the analytic CDF.
    # Samples are IID (a rejection sampler's defining property), so the
    # KS p-value is exact.
    ks = sps.kstest(x, lambda q: sps.norm.cdf(q, post_mean, post_sd))
    assert ks.pvalue > 1e-3, ks
    # internals contract (reference records loglike + logpost)
    assert "loglike" in chain.internals and "logpost" in chain.internals
    assert chain.info["acceptance_fraction"] > 0.01


def test_rejection_agrees_with_chees_on_ofti_model():
    """The OFTI workflow model (examples/09_ofti_rejection.py, porting
    the reference's `examples/ofti_rejection_sampling.jl`): 5 nonlinear
    parameters with the Thiele-Innes constants marginalized, so prior
    rejection keeps a workable acceptance rate (~1%) and thousands of
    IID posterior draws are cheap."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "ex09",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "examples", "09_ofti_rejection.py"),
    )
    ex09 = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ex09)
    model, _ = ex09.build_model()

    chain_rej = octofit_rejection(
        model,
        key=jax.random.PRNGKey(1),
        num_samples=4000,
        batch_size=200_000,
        max_batches=30,
        verbosity=0,
    )
    assert chain_rej.info["acceptance_fraction"] > 1e-3
    assert len(chain_rej.flat("e")) == 4000

    model.initialize(jax.random.PRNGKey(0), verbosity=0)
    chain_hmc = octofit(
        model,
        key=jax.random.PRNGKey(2),
        chains=64,
        adaptation=600,
        iterations=600,
        verbosity=0,
    )
    # quantile agreement on the physical parameters between the two
    # independent samplers, scaled by the posterior spread
    for name in ["e", "a", "M", "plx", "tau"]:
        r = chain_rej.flat(name)
        h = chain_hmc.flat(name)
        spread = np.std(h) + 1e-12
        for q in (0.25, 0.5, 0.75):
            dq = abs(np.quantile(r, q) - np.quantile(h, q))
            assert dq < 0.25 * spread, (name, q, dq, spread)
