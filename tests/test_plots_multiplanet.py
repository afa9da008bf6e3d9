"""Plot smoke tests + multi-planet integration (reference
`test/integration/multi_planet.jl`, `integration/plotting.jl`)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import octofitter_tpu as oc
from octofitter_tpu import distributions as dist
from octofitter_tpu.plots import astromplot, octocorner, octoplot
from octofitter_tpu.orbits import VisualOrbit, orbitsolve, raoff, decoff

from test_model import quickstart_model


@pytest.fixture(scope="module")
def fitted():
    model = quickstart_model()
    chain = oc.octofit(
        model, key=jax.random.PRNGKey(0), chains=2, adaptation=200,
        iterations=100, max_depth=8, verbosity=0,
    )
    return model, chain


def test_octoplot_runs(fitted, tmp_path):
    model, chain = fitted
    fig = octoplot(model, chain, fname=os.path.join(tmp_path, "octoplot.png"),
                   n_draws=10)
    assert os.path.exists(os.path.join(tmp_path, "octoplot.png"))


def test_octocorner_runs(fitted, tmp_path):
    model, chain = fitted
    fig = octocorner(model, chain, small=True,
                     fname=os.path.join(tmp_path, "corner.png"))
    assert os.path.exists(os.path.join(tmp_path, "corner.png"))


def test_astromplot_runs(fitted):
    model, chain = fitted
    ax = astromplot(model, chain, n_draws=5)
    assert ax is not None


# ---------------------------------------------------------------------------
def test_multi_planet_model():
    """Two-planet system with inner-planet perturbation: model builds,
    densities are finite, and the perturbation changes the outer
    planet's astrometry model."""
    TRUE_B = dict(a=10.0, e=0.1, i=0.5, omega=1.0, Omega=2.0, tp=57000.0)
    TRUE_C = dict(a=3.0, e=0.05, i=0.5, omega=0.3, Omega=2.0, tp=56800.0)
    M, plx = 1.2, 50.0
    epochs = np.linspace(56000.0, 58000.0, 6)

    sol_b = orbitsolve(VisualOrbit.from_params(**TRUE_B, M=M, plx=plx), jnp.asarray(epochs))
    rng = np.random.default_rng(0)
    astrom_b = oc.PlanetRelAstromObs(
        dict(
            epoch=epochs,
            ra=np.asarray(raoff(sol_b)) + rng.standard_normal(6),
            dec=np.asarray(decoff(sol_b)) + rng.standard_normal(6),
            σ_ra=np.ones(6),
            σ_dec=np.ones(6),
        ),
        name="astrom_b",
    )

    def planet(name, true, with_mass):
        vars = dict(
            a=dist.Uniform(0.1, 50.0),
            e=true["e"], i=true["i"], omega=true["omega"],
            Omega=true["Omega"], tp=true["tp"],
        )
        if with_mass:
            vars["mass"] = dist.Uniform(0.0, 50.0)
        return vars

    b = oc.Planet(name="b", basis="Visual{KepOrbit}",
                  variables=planet("b", TRUE_B, True), observations=[astrom_b])
    c = oc.Planet(name="c", basis="Visual{KepOrbit}",
                  variables=planet("c", TRUE_C, True))
    system = oc.System(
        name="multi",
        variables=dict(M=M, plx=plx),
        companions=[b, c],
        observations=[oc.PlanetOrderPrior("c", "b")],
    )
    model = oc.LogDensityModel(system, verbosity=0)
    assert model.D == 4  # b_a, b_mass, c_a, c_mass

    names = model.parameter_names
    base = {"b_a": 10.0, "b_mass": 5.0, "c_a": 3.0, "c_mass": 0.1}
    ll0 = float(model.ln_like_nt(model.arr2nt(jnp.asarray([base[n] for n in names]))))
    # give the inner planet mass: the host photocentre wobbles, changing
    # the outer planet's relative astrometry model
    base2 = dict(base, c_mass=30.0)
    ll1 = float(model.ln_like_nt(model.arr2nt(jnp.asarray([base2[n] for n in names]))))
    assert ll0 != ll1

    # planet order prior: swapping so c (inner) is outside b -> -inf
    base3 = dict(base, c_a=20.0)
    ll2 = float(model.ln_like_nt(model.arr2nt(jnp.asarray([base3[n] for n in names]))))
    assert ll2 == -np.inf

    val, grad = model.ln_post_and_grad(
        model.link(jnp.asarray([base[n] for n in names]))
    )
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(np.asarray(grad)))
