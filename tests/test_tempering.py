"""Parallel tempering tests.

The analytic-evidence check uses a conjugate Normal-Normal model where
log Z is known in closed form — validating the DEO swaps, schedule
adaptation and stepping-stone estimator end to end.
"""

import math

import jax
import numpy as np

import octofitter_tpu as oc
from octofitter_tpu import distributions as dist
from octofitter_tpu.model.variables import UserLikelihood
from octofitter_tpu.samplers.tempering import octofit_pigeons


def conjugate_model(mu0=0.0, s0=1.0, y=1.0, sy=0.5):
    # prior x ~ N(mu0, s0); likelihood y ~ N(x, sy)
    obs = UserLikelihood(dist.Normal(y, sy), "x", name="obs1")
    system = oc.System(
        name="conjugate",
        variables=dict(x=dist.Normal(mu0, s0)),
        observations=[obs],
    )
    return oc.LogDensityModel(system, verbosity=0)


def test_pt_conjugate_posterior_and_evidence():
    model = conjugate_model()
    chain, info = octofit_pigeons(
        model,
        key=jax.random.PRNGKey(0),
        n_rounds=9,
        n_chains=8,
        n_walkers=32,
        verbosity=0,
    )
    x = chain.flat("x")
    # analytic posterior: precision 1/1 + 1/0.25 = 5, mean = (0 + 4*1)/5
    post_mean, post_var = 0.8, 0.2
    assert abs(x.mean() - post_mean) < 0.05
    assert abs(x.var() - post_var) < 0.05
    # analytic evidence: N(y | mu0, sqrt(s0^2 + sy^2))
    logz_true = float(
        -0.5 * ((1.0 - 0.0) ** 2 / (1 + 0.25))
        - 0.5 * math.log(2 * math.pi * 1.25)
    )
    assert abs(info["logevidence"] - logz_true) < 0.2, (
        info["logevidence"],
        logz_true,
    )
    assert info["n_round_trips"] > 10


def test_pt_astrometry_smoke():
    import sys

    sys.path.insert(0, "tests")
    from test_model import quickstart_model, TRUE

    model = quickstart_model()
    chain, info = octofit_pigeons(
        model,
        key=jax.random.PRNGKey(0),
        n_rounds=6,
        n_chains=8,
        n_walkers=8,
        verbosity=0,
    )
    assert np.isfinite(info["logevidence"])
    assert info["n_round_trips"] >= 1
    # the target-chain samples should concentrate near the truth for e
    e = chain.flat("b_e")
    assert abs(np.median(e) - TRUE["e"]) < 0.25


def test_nested_sampling_conjugate():
    """Batched nested sampling: posterior + evidence on the conjugate
    Normal-Normal model (replaces the Dynesty extension)."""
    import math

    from octofitter_tpu.samplers.nested import octofit_nested

    model = conjugate_model()
    chain, info = octofit_nested(
        model, key=jax.random.PRNGKey(0), n_live=500, verbosity=0
    )
    logz_true = -0.5 * (1.0 / 1.25) - 0.5 * math.log(2 * math.pi * 1.25)
    assert abs(info["logz"] - logz_true) < 0.15
    x = chain.flat("x")
    assert abs(x.mean() - 0.8) < 0.05
    assert abs(x.var() - 0.2) < 0.05
