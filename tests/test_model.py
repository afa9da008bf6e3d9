"""Model-construction & log-density tests (reference:
`test/unit/constructors.jl`, `test/unit/priors.jl`, quick-start docs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import octofitter_tpu as oc
from octofitter_tpu import distributions as dist
from octofitter_tpu.orbits import VisualOrbit, orbitsolve, raoff, decoff


TRUE = dict(a=10.0, e=0.2, i=0.6, omega=1.0, Omega=2.0, tp=57000.0, M=1.2, plx=50.0)


def make_synthetic_astrom(n=8, sigma=2.0, seed=0):
    rng = np.random.default_rng(seed)
    epochs = np.linspace(56000.0, 58000.0, n)
    orbit = VisualOrbit.from_params(**TRUE)
    sol = orbitsolve(orbit, jnp.asarray(epochs))
    ra = np.asarray(raoff(sol)) + rng.standard_normal(n) * sigma
    dec = np.asarray(decoff(sol)) + rng.standard_normal(n) * sigma
    return dict(
        epoch=epochs,
        ra=ra,
        dec=dec,
        σ_ra=np.full(n, sigma),
        σ_dec=np.full(n, sigma),
    )


def quickstart_model(n=8):
    astrom = oc.PlanetRelAstromObs(make_synthetic_astrom(n), name="simdata")
    b = oc.Planet(
        name="b",
        basis="Visual{KepOrbit}",
        variables=dict(
            a=dist.Uniform(0.001, 100.0),
            e=dist.Uniform(0.0, 0.99),
            i=dist.Sine(),
            omega=oc.UniformCircular(),
            Omega=oc.UniformCircular(),
            theta=oc.UniformCircular(),
            tp=lambda sys, pl: oc.theta_at_epoch_to_tperi(
                pl.theta,
                57000.0,
                M=sys.M,
                e=pl.e,
                a=pl.a,
                i=pl.i,
                omega=pl.omega,
                Omega=pl.Omega,
            ),
        ),
        observations=[astrom],
    )
    system = oc.System(
        name="Tutoria",
        variables=dict(
            M=dist.truncated(dist.Normal(1.2, 0.1), lower=0.1),
            plx=dist.truncated(dist.Normal(50.0, 0.02), lower=0.1),
        ),
        companions=[b],
    )
    return oc.LogDensityModel(system, verbosity=0)


@pytest.fixture(scope="module")
def model():
    return quickstart_model()


def test_dimensionality(model):
    # M, plx + a, e, i, omega(x,y), Omega(x,y), theta(x,y) = 2 + 9 = 11
    # matches the reference integration test D == 11
    # (`test/integration/sampling.jl`)
    assert model.D == 11
    assert model.n_epochs == 8


def test_parameter_names(model):
    assert model.parameter_names[:2] == ["M", "plx"]
    assert "b_a" in model.parameter_names
    assert "b_omegax" in model.parameter_names


def test_ln_post_finite_and_differentiable(model):
    key = jax.random.PRNGKey(0)
    theta = model.sample_priors(key)
    theta_t = model.link(theta)
    lp = float(model.ln_post(theta_t))
    assert np.isfinite(lp)
    val, grad = model.ln_post_and_grad(theta_t)
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(np.asarray(grad)))


def test_link_invlink_roundtrip(model):
    key = jax.random.PRNGKey(1)
    theta = model.sample_priors(key)
    theta2 = model.invlink(model.link(theta))
    np.testing.assert_allclose(np.asarray(theta), np.asarray(theta2), rtol=1e-10)


def test_nonfinite_input_gated(model):
    theta_t = np.zeros(model.D)
    theta_t[0] = np.nan
    assert float(model.ln_post(jnp.asarray(theta_t))) == -np.inf


def test_arr2nt_structure(model):
    key = jax.random.PRNGKey(2)
    nt = model.arr2nt(model.sample_priors(key))
    assert "M" in nt and "plx" in nt
    b = nt.planets.b
    for k in ("a", "e", "i", "omega", "Omega", "theta", "tp"):
        assert k in b, k
    # derived angle is consistent with its x/y parts
    np.testing.assert_allclose(
        float(b.omega),
        float(jnp.arctan2(b.omegay, b.omegax)),
        rtol=1e-10,
    )


def test_vmap_chains(model):
    key = jax.random.PRNGKey(3)
    thetas = model.sample_priors(key, 64)
    thetas_t = jax.vmap(model.link)(thetas)
    lps = jax.jit(jax.vmap(model._ln_post_py))(thetas_t)
    assert lps.shape == (64,)
    assert np.all(np.isfinite(np.asarray(lps)))


def test_prior_search(model):
    pts, lps = model.prior_search(jax.random.PRNGKey(4), 2000, 50)
    assert pts.shape == (50, model.D)
    assert np.all(np.isfinite(np.asarray(lps)))
    # best prior draws should beat a random one most of the time
    rand_lp = float(model.ln_post(model.link(model.sample_priors(jax.random.PRNGKey(5)))))
    assert float(lps[0]) >= rand_lp


def test_posterior_peaks_near_truth(model):
    # ln_post at the generating parameters should beat random prior draws
    # need to express truth in the model's parameterization
    import math

    from octofitter_tpu.orbits import posangle

    orbit = VisualOrbit.from_params(**TRUE)
    sol = orbitsolve(orbit, jnp.asarray(57000.0))
    theta_angle = float(posangle(sol))

    def angle_xy(angle):
        return math.cos(angle), math.sin(angle)

    wx, wy = angle_xy(TRUE["omega"])
    Ox, Oy = angle_xy(TRUE["Omega"])
    tx, ty = angle_xy(theta_angle)
    flat = jnp.asarray(
        [
            TRUE["M"],
            TRUE["plx"],
            TRUE["a"],
            TRUE["e"],
            TRUE["i"],
            wx,
            wy,
            Ox,
            Oy,
            tx,
            ty,
        ]
    )
    nt = model.arr2nt(flat)
    # check the derived tp reproduces the true orbit phase
    P = float(oc.orbits.period(orbit))
    tp_model = float(nt.planets.b.tp)
    assert abs((tp_model - TRUE["tp"]) % P) < 1e-6 or abs(
        ((tp_model - TRUE["tp"]) % P) - P
    ) < 1e-6

    lp_true = float(model.ln_post(model.link(flat)))
    assert np.isfinite(lp_true)
    draws_t = jax.vmap(model.link)(model.sample_priors(jax.random.PRNGKey(6), 500))
    lps = jax.jit(jax.vmap(model._ln_post_py))(draws_t)
    assert lp_true > float(jnp.max(jnp.where(jnp.isnan(lps), -jnp.inf, lps)))


def test_photometry_and_user_likelihood():
    phot = oc.PhotometryObs(
        dict(phot=[14.2], σ_phot=[0.1]),
        variables=dict(flux=dist.Uniform(10.0, 20.0)),
        name="Keck",
    )
    b = oc.Planet(
        name="b",
        basis="Visual{KepOrbit}",
        variables=dict(
            a=dist.Uniform(1, 50),
            e=0.1,
            i=0.5,
            omega=0.0,
            Omega=0.0,
            tp=57000.0,
        ),
        observations=[phot],
    )
    system = oc.System(
        name="photsys",
        variables=dict(M=dist.Normal(1.0, 0.1), plx=dist.Normal(30.0, 0.1)),
        companions=[b],
    )
    model = oc.LogDensityModel(system, verbosity=0)
    # priors: M, plx, a, flux
    assert model.D == 4
    assert "b_Keck_flux" in model.parameter_names
    theta_t = model.link(model.sample_priors(jax.random.PRNGKey(0)))
    assert np.isfinite(float(model.ln_post(theta_t)))


def test_initialize_function_form_returns_init_chain(model):
    """`oc.initialize(model)` (the reference `initialize!` function form,
    initialization.jl:184) returns an init chain of the Laplace starting
    points with derived quantities resolved, usable with octoplot."""
    init_chain = oc.initialize(
        model, jax.random.PRNGKey(7), verbosity=0,
        n_prior_samples=2000, n_multistart=32, n_opt_steps=100, n_draws=32,
    )
    assert init_chain.n_chains == 1
    assert init_chain.n_draws == len(model.starting_points)
    # free, derived, and constant-resolved columns all present
    for col in ("M", "plx", "b_a", "b_e", "b_tp"):
        assert col in init_chain.data, col
        assert np.all(np.isfinite(init_chain[col]))
    assert np.all(np.isfinite(init_chain["logpost"]))
    # draws concentrate near the mode: much better than raw prior draws
    assert float(np.median(init_chain["logpost"])) > -1e3
    # octoplot accepts the init chain (smoke)
    import matplotlib
    matplotlib.use("Agg")
    oc.octoplot(model, init_chain, fname="/tmp/init_chain_plot.png")
