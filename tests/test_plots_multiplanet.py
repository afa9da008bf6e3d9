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


# ---------------------------------------------------------------------------
# Per-datatype panel smoke tests (reference `ext/OctofitterMakieExt/`)
# ---------------------------------------------------------------------------

from octofitter_tpu.plots import (  # noqa: E402
    absastromplot,
    astromtimeplot,
    completenessplot,
    dotplot,
    gaiatimeplot,
    hgcaplot,
    hipparcosplot,
    masspostplot,
    physorbitplot,
    skytrackplot,
)


def test_astromtimeplot_physorbit_skytrack_dotplot(fitted):
    model, chain = fitted
    axs = astromtimeplot(model, chain, n_draws=5)
    assert len(axs) == 2
    assert physorbitplot(model, chain, n_draws=5) is not None
    assert skytrackplot(model, chain) is not None
    assert dotplot(model, chain, n_draws=200) is not None


@pytest.fixture(scope="module")
def g23h_fitted(tmp_path_factory):
    import sys as _sys
    sys_path = os.path.dirname(os.path.abspath(__file__))
    if sys_path not in _sys.path:
        _sys.path.insert(0, sys_path)
    from test_g23h import g23h_model_marg

    tmp = str(tmp_path_factory.mktemp("g23hplots"))
    model, g23h = g23h_model_marg(tmp, freeze=True)
    chain = oc.octofit(
        model, chains=4, adaptation=200, iterations=100,
        sampler="chees", verbosity=0,
    )
    return model, chain


def test_g23h_panels(g23h_fitted, tmp_path):
    model, chain = g23h_fitted
    axs = hgcaplot(model, chain, n_draws=5)
    assert len(axs) == 2
    assert hipparcosplot(model, chain, n_draws=4) is not None
    assert absastromplot(model, chain, n_draws=4) is not None
    assert masspostplot(model, chain) is not None
    # full adaptive composite renders and saves
    fname = os.path.join(tmp_path, "g23h-grid.png")
    octoplot(model, chain, fname=fname, n_draws=5)
    assert os.path.exists(fname)


def test_gaiatimeplot(tmp_path):
    from octofitter_tpu.astrom import GaiaDR4AstromObs

    rng = np.random.default_rng(0)
    n = 30
    epochs = np.sort(rng.uniform(57000, 58500, n))
    obs = GaiaDR4AstromObs(
        dict(
            epoch=epochs,
            centroid_pos_al=rng.standard_normal(n) * 0.05,
            centroid_pos_error_al=np.full(n, 0.05),
            scan_pos_angle=rng.uniform(0, 2 * np.pi, n),
            parallax_factor_al=rng.uniform(-0.7, 0.7, n),
        ),
        gaia_sol=dict(ra=68.0, dec=-51.0),
        variables=dict(astrometric_jitter=dist.LogUniform(1e-4, 1.0)),
    )
    b = oc.Planet(
        name="b", basis="Visual{KepOrbit}",
        variables=dict(a=2.0, e=0.1, i=0.5, omega=1.0, Omega=2.0,
                       tp=57000.0, mass=dist.Uniform(0.0, 50.0)),
    )
    system = oc.System(
        name="dr4plot", variables=dict(M=1.0, plx=50.0, pmra=0.0, pmdec=0.0),
        companions=[b], observations=[obs],
    )
    model = oc.LogDensityModel(system, verbosity=0)
    chain = oc.octofit(model, chains=2, adaptation=150, iterations=80,
                       sampler="chees", verbosity=0)
    assert gaiatimeplot(model, chain, n_draws=4) is not None
    from octofitter_tpu.plots import gaiastarplot
    assert gaiastarplot(model, chain) is not None


def test_completenessplot():
    from octofitter_tpu.analysis.completeness import CompletenessMap

    masses = np.linspace(1, 50, 6)
    seps = np.linspace(1, 30, 5)
    M, S = np.meshgrid(masses, seps, indexing="ij")
    comp = np.clip((M / 50.0) * (S / 30.0) * 2, 0, 1)
    cmap = CompletenessMap(
        masses=masses, separations=seps, completeness=comp,
        n_detected=(comp * 10).astype(int), n_total=np.full_like(comp, 10, int),
    )
    assert completenessplot(cmap) is not None
