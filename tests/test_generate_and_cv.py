"""Tests for generate_from_params, cross-validation, PSIS-LOO, and SBC."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import octofitter_tpu as oc
from octofitter_tpu import distributions as dist
from octofitter_tpu.analysis import (
    generate_kfold_systems,
    generate_system_per_epoch,
    pointwise_like,
    prior_only_model,
    psis_loo,
    sbc_trial,
)
from octofitter_tpu.model.generate import generate_from_params
from octofitter_tpu.model.logdensity import LogDensityModel

from test_model import make_synthetic_astrom, TRUE


def plain_model(n=6):
    """Quickstart-like model WITHOUT UniformCircular, so ln_like has no
    pseudo-likelihood terms and equals the pointwise sum exactly."""
    astrom = oc.PlanetRelAstromObs(make_synthetic_astrom(n), name="simdata")
    b = oc.Planet(
        name="b",
        basis="Visual{KepOrbit}",
        variables=dict(
            a=dist.Uniform(0.001, 100.0),
            e=dist.Uniform(0.0, 0.99),
            i=dist.Sine(),
            omega=dist.Uniform(0.0, 2 * np.pi),
            Omega=dist.Uniform(0.0, 2 * np.pi),
            tp=dist.Uniform(56000.0, 58000.0),
        ),
        observations=[astrom],
    )
    return oc.LogDensityModel(
        oc.System(
            name="plain",
            variables=dict(
                M=dist.truncated(dist.Normal(1.2, 0.1), lower=0.1),
                plx=dist.truncated(dist.Normal(50.0, 0.02), lower=0.1),
            ),
            companions=[b],
        ),
        verbosity=0,
    )


def test_generate_from_params_no_noise_is_exact():
    model = plain_model()
    key = jax.random.PRNGKey(0)
    theta = model.sample_priors(key)
    nt = model.arr2nt(theta)
    newsys = generate_from_params(model, nt, add_noise=False)
    newmodel = LogDensityModel(newsys, verbosity=0)
    # at the generating parameters the residuals are exactly zero, so
    # ln_like equals the Gaussian normalization maximum
    ll = float(newmodel.ln_like_nt(newmodel.arr2nt(theta)))
    n = model.n_epochs
    sigma = 2.0
    expected = n * (-np.log(2 * np.pi) - np.log(sigma**2))
    np.testing.assert_allclose(ll, expected, rtol=1e-8)


def test_generate_with_noise_changes_data():
    model = plain_model()
    nt = model.arr2nt(model.sample_priors(jax.random.PRNGKey(1)))
    s1 = generate_from_params(model, nt, rng=np.random.default_rng(0), add_noise=True)
    s2 = generate_from_params(model, nt, rng=np.random.default_rng(1), add_noise=True)
    t1 = s1.planets[0].observations[0].table
    t2 = s2.planets[0].observations[0].table
    assert not np.allclose(t1["ra"], t2["ra"])


def test_pointwise_like_sums_to_loglike():
    model = plain_model()
    chain = oc.octofit(
        model,
        key=jax.random.PRNGKey(0),
        chains=2,
        adaptation=150,
        iterations=50,
        max_depth=8,
        verbosity=0,
    )
    LL, epochs = pointwise_like(model, chain)
    assert LL.shape == (2 * 50, model.n_epochs)
    np.testing.assert_allclose(
        LL.sum(axis=1),
        chain.internals["loglike"].reshape(-1),
        rtol=1e-8,
    )
    assert len(epochs) == model.n_epochs


def test_psis_loo_runs():
    model = plain_model()
    chain = oc.octofit(
        model,
        key=jax.random.PRNGKey(0),
        chains=2,
        adaptation=150,
        iterations=100,
        max_depth=8,
        verbosity=0,
    )
    LL, _ = pointwise_like(model, chain)
    out = psis_loo(LL)
    assert np.isfinite(out["elpd_loo"])
    assert out["elpd_pointwise"].shape == (model.n_epochs,)


def test_prior_only_model_same_dimension():
    model = plain_model()
    stripped = prior_only_model(model)
    m2 = LogDensityModel(stripped, verbosity=0)
    assert m2.D == model.D
    # log-likelihood of the stripped model is exactly 0
    theta = m2.sample_priors(jax.random.PRNGKey(0))
    assert float(m2.ln_like_nt(m2.arr2nt(theta))) == 0.0


def test_kfold_and_per_epoch_generators():
    model = plain_model()
    folds = generate_kfold_systems(model.system)
    assert len(folds) == 1  # one likelihood object
    systems, epochs = generate_system_per_epoch(model.system)
    assert len(systems) == model.n_epochs
    m_one = LogDensityModel(systems[0], verbosity=0)
    assert m_one.n_epochs == 1
    assert m_one.D == model.D


def test_sbc_trial_runs():
    model = plain_model()
    out = sbc_trial(
        model,
        jax.random.PRNGKey(7),
        sampler_kwargs=dict(chains=2, adaptation=150, iterations=100, max_depth=8),
        init_at_truth=True,
    )
    assert set(out["ranks"]) == set(model.parameter_names)
    for v in out["ranks"].values():
        assert 0.0 <= v <= 1.0


def test_sbc_rank_uniformity_calibration():
    """SBC calibration gate (reference `sbc.jl:35-117`): over repeated
    prior-draw -> generate -> refit trials, the rank of each true
    parameter in its marginal posterior must be uniform. This gates the
    whole inference stack (generator + likelihood + sampler)."""
    from octofitter_tpu.analysis.sbc import calibrate
    from scipy.stats import kstest

    # small, fast, well-identified model: 2 free parameters
    def small_model():
        astrom = oc.PlanetRelAstromObs(make_synthetic_astrom(6), name="simdata")
        b = oc.Planet(
            name="b", basis="Visual{KepOrbit}",
            variables=dict(
                a=dist.Uniform(8.0, 12.0),
                e=dist.Uniform(0.0, 0.3),
                i=0.6, omega=1.0, Omega=2.0, tp=57000.0,
            ),
            observations=[astrom],
        )
        return LogDensityModel(
            oc.System(
                name="sbc", variables=dict(M=1.2, plx=50.0), companions=[b]
            ),
            verbosity=0,
        )

    model = small_model()
    n_trials = 20
    res = calibrate(
        model, n_trials=n_trials, seed=3,
        sampler_kwargs=dict(
            sampler="chees", chains=8, adaptation=300, iterations=200,
        ),
        init_at_truth=True,
        verbosity=0,
    )
    assert set(res) == {"b_a", "b_e"}
    for name, r in res.items():
        ranks = r["ranks"]
        assert len(ranks) == n_trials
        # KS test against uniform; alpha=0.005 with a documented flake
        # budget (the reference documents its divergence flake rate the
        # same way, `test/integration/sampling.jl:10-24`)
        p = kstest(ranks, "uniform").pvalue
        assert p > 0.005, f"{name}: SBC ranks not uniform (p={p:.4f}, ranks={ranks})"
        assert 0.25 < np.mean(ranks) < 0.75

    # calibration plots on the real trial output (reference
    # `calibrationplots`, sbc.jl:215-250)
    import matplotlib.pyplot as plt

    from octofitter_tpu.plots import calibrationplots, sbc_corner

    fig = calibrationplots(res)
    assert len([a for a in fig.axes if a.get_visible()]) >= 2
    plt.close(fig)
    fig = sbc_corner(res)
    plt.close(fig)


def test_calibrationplots_synthetic_ranks(tmp_path):
    """Plot functions standalone: uniform + miscalibrated rank sets,
    file output, n_bins control."""
    import matplotlib.pyplot as plt

    from octofitter_tpu.plots import calibrationplots, sbc_corner

    rng = np.random.default_rng(0)
    results = {
        "good": rng.uniform(0, 1, 100),
        "biased": {"ranks": rng.beta(4, 1, 100), "ks_distance": 0.4},
    }
    f1 = str(tmp_path / "sbc_hist.png")
    fig = calibrationplots(results, n_bins=10, fname=f1)
    assert (tmp_path / "sbc_hist.png").exists()
    # the biased panel's title carries its KS distance
    titles = [a.get_title() for a in fig.axes if a.get_visible()]
    assert any("KS 0.40" in t for t in titles)
    plt.close(fig)
    f2 = str(tmp_path / "sbc_corner.png")
    fig = sbc_corner(results, fname=f2)
    assert (tmp_path / "sbc_corner.png").exists()
    plt.close(fig)
