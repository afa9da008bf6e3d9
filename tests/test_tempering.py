"""Parallel tempering tests.

The analytic-evidence check uses a conjugate Normal-Normal model where
log Z is known in closed form — validating the DEO swaps, schedule
adaptation and stepping-stone estimator end to end.
"""

import pytest
import math

import jax
import jax.numpy as jnp
import numpy as np

import octofitter_tpu as oc
from octofitter_tpu import distributions as dist
from octofitter_tpu.model.variables import UserLikelihood
from octofitter_tpu.samplers.tempering import octofit_pigeons


pytestmark = pytest.mark.integration

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


def test_pt_partial_arc_ridge():
    """Short-arc astrometry posteriors are continuous (a,e,tp)
    degeneracy ridges where single-temperature samplers stall
    (CLAUDE.md round-2 lessons); parallel tempering must traverse the
    ridge: completed round trips, full ridge coverage, and better
    mixing than the single-temperature rhat ~ 1.3-1.5 regime."""
    from octofitter_tpu.chains import ess_rhat
    from octofitter_tpu.orbits import VisualOrbit, orbitsolve, raoff, decoff

    true = dict(a=7.0, e=0.2, i=0.6, omega=1.0, Omega=2.0, tp=57000.0,
                M=1.2, plx=50.0)
    n = 12
    rng = np.random.default_rng(0)
    epochs = np.linspace(56800.0, 57400.0, n)  # 600 d arc of a 4400 d orbit
    sol = orbitsolve(VisualOrbit.from_params(**true), jnp.asarray(epochs))
    astrom = oc.PlanetRelAstromObs(
        dict(
            epoch=epochs,
            ra=np.asarray(raoff(sol)) + rng.standard_normal(n) * 2.0,
            dec=np.asarray(decoff(sol)) + rng.standard_normal(n) * 2.0,
            σ_ra=np.full(n, 2.0), σ_dec=np.full(n, 2.0),
        ),
        name="simdata",
    )
    b = oc.Planet(
        name="b", basis="Visual{KepOrbit}",
        variables=dict(
            a=dist.Uniform(0.001, 100.0), e=dist.Uniform(0.0, 0.99),
            i=dist.Sine(), omega=oc.UniformCircular(),
            Omega=oc.UniformCircular(), theta=oc.UniformCircular(),
            tp=lambda s, p: oc.theta_at_epoch_to_tperi(
                p.theta, 57000.0, M=s.M, e=p.e, a=p.a, i=p.i,
                omega=p.omega, Omega=p.Omega),
        ),
        observations=[astrom],
    )
    system = oc.System(
        name="partialarc",
        variables=dict(
            M=dist.truncated(dist.Normal(1.2, 0.1), lower=0.1),
            plx=dist.truncated(dist.Normal(50.0, 0.02), lower=0.1),
        ),
        companions=[b],
    )
    model = oc.LogDensityModel(system, verbosity=0)
    chain, info = octofit_pigeons(
        model, n_chains=8, n_walkers=12, n_rounds=8, verbosity=0,
        key=jax.random.PRNGKey(0),
    )
    assert info["n_round_trips"] >= 1
    a = chain["b_a"]
    q5, q95 = np.quantile(a.reshape(-1), [0.05, 0.95])
    # the ridge spans small tight orbits to wide slow ones
    assert q5 < 12.0 and q95 > 25.0, (q5, q95)
    _, rhat = ess_rhat(a)
    assert rhat < 1.35
    assert np.isfinite(info["logevidence"])


def test_pt_chees_explorer_conjugate():
    """Per-temperature shared-trajectory ChEES explorer: correct
    posterior + evidence on the conjugate model (the compile-light
    axon-backend explorer option)."""
    model = conjugate_model()
    chain, info = octofit_pigeons(
        model,
        key=jax.random.PRNGKey(0),
        n_rounds=8,
        n_chains=8,
        n_walkers=32,
        explorer="chees",
        verbosity=0,
    )
    x = chain.flat("x")
    assert abs(x.mean() - 0.8) < 0.05
    assert abs(x.var() - 0.2) < 0.05
    logz_true = float(
        -0.5 * (1.0 / 1.25) - 0.5 * math.log(2 * math.pi * 1.25)
    )
    assert abs(info["logevidence"] - logz_true) < 0.25
    assert info["n_round_trips"] > 10
    # per-rung trajectory lengths were adapted (positive, distinct)
    T = info["trajectory_length"]
    assert np.all(T > 0)


def test_pt_variational_leg():
    """Stabilized variational PT (GaussianReference equivalent,
    `OctofitterPigeonsExt.jl:83`): extended ladder with a moment-matched
    Gaussian reference; the variational leg's communication barrier
    collapses once tuned, and posterior + evidence stay correct."""
    model = conjugate_model()
    chain, info = octofit_pigeons(
        model,
        key=jax.random.PRNGKey(0),
        n_rounds=8,
        n_chains=8,
        n_chains_variational=8,
        n_walkers=16,
        verbosity=0,
    )
    x = chain.flat("x")
    assert abs(x.mean() - 0.8) < 0.06
    assert abs(x.var() - 0.2) < 0.05
    logz_true = float(
        -0.5 * (1.0 / 1.25) - 0.5 * math.log(2 * math.pi * 1.25)
    )
    assert abs(info["logevidence"] - logz_true) < 0.25
    # the tuned Gaussian reference matches the posterior moments
    assert abs(info["variational_mean"][0] - 0.8) < 0.1
    assert abs(info["variational_std"][0] - math.sqrt(0.2)) < 0.1
    # and its leg's barrier is far below the prior leg's
    assert info["global_barrier_variational"] < 0.2
    assert info["global_barrier_variational"] < info["global_barrier"]


def test_pt_partial_arc_production_recipe():
    """The production configuration for ridge posteriors: initialized
    starts + ChEES per-temperature explorer + variational leg. Measured
    in round 2: rhat 1.04-1.08 where plain prior-start PT sits at
    1.1-1.3 and single-temperature chains at >1.3 (CLAUDE.md)."""
    import sys

    sys.path.insert(0, "tests")
    from octofitter_tpu.chains import ess_rhat
    from octofitter_tpu.orbits import VisualOrbit, orbitsolve, raoff, decoff

    true = dict(a=7.0, e=0.2, i=0.6, omega=1.0, Omega=2.0, tp=57000.0,
                M=1.2, plx=50.0)
    n = 12
    rng = np.random.default_rng(0)
    epochs = np.linspace(56800.0, 57400.0, n)
    sol = orbitsolve(VisualOrbit.from_params(**true), jnp.asarray(epochs))
    astrom = oc.PlanetRelAstromObs(
        dict(
            epoch=epochs,
            ra=np.asarray(raoff(sol)) + rng.standard_normal(n) * 2.0,
            dec=np.asarray(decoff(sol)) + rng.standard_normal(n) * 2.0,
            σ_ra=np.full(n, 2.0), σ_dec=np.full(n, 2.0),
        ),
        name="simdata",
    )
    b = oc.Planet(
        name="b", basis="Visual{KepOrbit}",
        variables=dict(
            a=dist.Uniform(0.001, 100.0), e=dist.Uniform(0.0, 0.99),
            i=dist.Sine(), omega=oc.UniformCircular(),
            Omega=oc.UniformCircular(), theta=oc.UniformCircular(),
            tp=lambda s, p: oc.theta_at_epoch_to_tperi(
                p.theta, 57000.0, M=s.M, e=p.e, a=p.a, i=p.i,
                omega=p.omega, Omega=p.Omega),
        ),
        observations=[astrom],
    )
    system = oc.System(
        name="partialarc_prod",
        variables=dict(
            M=dist.truncated(dist.Normal(1.2, 0.1), lower=0.1),
            plx=dist.truncated(dist.Normal(50.0, 0.02), lower=0.1),
        ),
        companions=[b],
    )
    model = oc.LogDensityModel(system, verbosity=0)
    # light init config (same trick as example 05) keeps CI fast
    model.initialize(
        jax.random.PRNGKey(0), verbosity=0,
        n_prior_samples=20_000, n_multistart=128, n_opt_steps=400,
        n_draws=256,
    )
    chain, info = octofit_pigeons(
        model, n_chains=8, n_chains_variational=8, n_walkers=16,
        n_rounds=7, explorer="chees", explorer_n_leapfrog=512,
        verbosity=0, key=jax.random.PRNGKey(0),
    )
    a = chain["b_a"]
    q5, q95 = np.quantile(a.reshape(-1), [0.05, 0.95])
    assert q5 < 12.0 and q95 > 25.0, (q5, q95)  # full ridge covered
    _, rhat = ess_rhat(a)
    assert rhat < 1.2, rhat
    # the variational leg engaged and its barrier is finite
    assert np.isfinite(info["global_barrier_variational"])
    assert np.isfinite(info["logevidence"])
