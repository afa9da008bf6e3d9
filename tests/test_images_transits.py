"""Tests for direct-imaging and transit likelihoods."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import octofitter_tpu as oc
from octofitter_tpu import distributions as dist
from octofitter_tpu.images import ImageObs, LogLikelihoodMapObs
from octofitter_tpu.transits import (
    LightCurveObs,
    NonlinearLimbDark,
    QuadLimbDark,
    transit_depth,
)
from octofitter_tpu.constants import IAU_AU_M
from octofitter_tpu.orbits import VisualOrbit, orbitsolve, raoff, decoff


# ---------------------------------------------------------------------------
# transits
def _depth_numeric(u1, u2, b, r, n=1500):
    """Brute-force 2D numerical occultation depth for validation."""
    x = np.linspace(-1, 1, n)
    X, Y = np.meshgrid(x, x)
    rho2 = X**2 + Y**2
    star = rho2 <= 1
    mu = np.sqrt(np.clip(1 - rho2, 0, 1))
    I = np.where(star, 1 - u1 * (1 - mu) - u2 * (1 - mu) ** 2, 0.0)
    occ = (X - b) ** 2 + Y**2 <= r**2
    return (I * occ * star).sum() / (I * star).sum()


@pytest.mark.parametrize(
    "u1,u2,b,r",
    [
        (0.0, 0.0, 0.0, 0.1),
        (0.0, 0.0, 0.5, 0.1),
        (0.4, 0.3, 0.0, 0.1),
        (0.4, 0.3, 0.7, 0.15),
        (0.4, 0.3, 1.02, 0.1),   # grazing
        (0.2, 0.1, 2.0, 0.1),    # no transit
    ],
)
def test_transit_depth_vs_numeric(u1, u2, b, r):
    ld = QuadLimbDark(u1, u2)
    got = 1.0 - float(
        transit_depth(ld, jnp.asarray([b]), jnp.asarray(r), jnp.asarray([True]))[0]
    )
    want = _depth_numeric(u1, u2, b, r)
    assert abs(got - want) < 5e-4, (got, want)


def test_transit_uniform_small_planet():
    ld = QuadLimbDark(0.0, 0.0)
    f = transit_depth(ld, jnp.asarray([0.3]), jnp.asarray(0.05), jnp.asarray([True]))
    np.testing.assert_allclose(1 - float(f[0]), 0.05**2, rtol=1e-3)
    # behind the star: no occultation
    f2 = transit_depth(ld, jnp.asarray([0.3]), jnp.asarray(0.05), jnp.asarray([False]))
    assert float(f2[0]) == 1.0


def test_transit_model_gradient():
    # edge-on orbit, transit in light curve
    R_sun_m = 6.957e8
    lc_epochs = np.linspace(57000.0 - 0.2, 57000.0 + 0.2, 41)
    lc = LightCurveObs(
        dict(epoch=lc_epochs, phot=np.ones(41), σ_phot=np.full(41, 1e-3)),
    )
    b = oc.Planet(
        name="b",
        basis="Visual{KepOrbit}",
        variables=dict(
            a=0.05, e=0.0, i=np.pi / 2, omega=0.0, Omega=0.0,
            tp=dist.Uniform(56999.0, 57001.0),
            r=dist.Uniform(0.0, 0.3),
        ),
    )
    system = oc.System(
        name="transit",
        variables=dict(
            M=1.0, plx=100.0, R=R_sun_m,
            u1=dist.Uniform(0.0, 1.0), u2=dist.Uniform(-0.5, 0.5),
        ),
        companions=[b],
        observations=[lc],
    )
    model = oc.LogDensityModel(system, verbosity=0)
    theta_t = model.link(model.sample_priors(jax.random.PRNGKey(0)))
    val, grad = model.ln_post_and_grad(theta_t)
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(np.asarray(grad)))


# ---------------------------------------------------------------------------
# images
TRUE_IMG = dict(a=10.0, e=0.1, i=0.5, omega=1.0, Omega=2.0, tp=57000.0, M=1.2, plx=50.0)
TRUE_FLUX = 20.0


def make_image_with_planet(epoch, noise_sigma=1.0, seed=0):
    rng = np.random.default_rng(seed)
    n = 101
    ps = 10.0  # mas/px
    img = rng.standard_normal((n, n)) * noise_sigma
    sol = orbitsolve(VisualOrbit.from_params(**TRUE_IMG), jnp.asarray(epoch))
    x = -float(raoff(sol)) / ps + (n - 1) / 2
    y = float(decoff(sol)) / ps + (n - 1) / 2
    yy, xx = np.mgrid[0:n, 0:n]
    psf = TRUE_FLUX * np.exp(-0.5 * ((xx - x) ** 2 + (yy - y) ** 2) / 1.5**2)
    return dict(image=img + psf, epoch=epoch, platescale=ps)


def image_model():
    imgs = ImageObs(
        [make_image_with_planet(57000.0, seed=1), make_image_with_planet(57400.0, seed=2)],
        variables=dict(flux=dist.Uniform(0.0, 100.0)),
        name="SPHERE",
    )
    b = oc.Planet(
        name="b",
        basis="Visual{KepOrbit}",
        variables=dict(
            a=dist.Uniform(5.0, 15.0),
            e=TRUE_IMG["e"], i=TRUE_IMG["i"], omega=TRUE_IMG["omega"],
            Omega=TRUE_IMG["Omega"], tp=TRUE_IMG["tp"],
        ),
        observations=[imgs],
    )
    system = oc.System(
        name="imgsys",
        variables=dict(M=TRUE_IMG["M"], plx=TRUE_IMG["plx"]),
        companions=[b],
    )
    return oc.LogDensityModel(system, verbosity=0)


def test_image_likelihood_peaks_at_true_sma_and_flux():
    model = image_model()
    # names: b_a, b_SPHERE_flux
    names = model.parameter_names
    grid_a = np.linspace(6, 14, 41)
    lls = []
    for a in grid_a:
        flat = np.zeros(model.D)
        flat[names.index("b_a")] = a
        flat[names.index("b_SPHERE_flux")] = TRUE_FLUX
        lls.append(float(model.ln_like_nt(model.arr2nt(jnp.asarray(flat)))))
    best_a = grid_a[int(np.argmax(lls))]
    assert abs(best_a - TRUE_IMG["a"]) < 0.5, best_a

    # flux gradient finite & informative at the truth
    flat = np.zeros(model.D)
    flat[names.index("b_a")] = TRUE_IMG["a"]
    flat[names.index("b_SPHERE_flux")] = TRUE_FLUX
    theta_t = model.link(jnp.asarray(flat))
    val, grad = model.ln_post_and_grad(theta_t)
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(np.asarray(grad)))


def test_llmap_obs():
    n = 51
    ps = 25.0  # wide enough field to contain the orbit (sep up to ~550 mas)
    ll_map = np.zeros((n, n))
    sol = orbitsolve(VisualOrbit.from_params(**TRUE_IMG), jnp.asarray(57000.0))
    x = int(round(-float(raoff(sol)) / ps + (n - 1) / 2))
    y = int(round(float(decoff(sol)) / ps + (n - 1) / 2))
    ll_map[y, x] = 50.0
    maps = LogLikelihoodMapObs(
        [dict(map=ll_map, epoch=57000.0, platescale=ps)], name="llmap"
    )
    b = oc.Planet(
        name="b",
        basis="Visual{KepOrbit}",
        variables=dict(
            a=dist.Uniform(5.0, 15.0), e=TRUE_IMG["e"], i=TRUE_IMG["i"],
            omega=TRUE_IMG["omega"], Omega=TRUE_IMG["Omega"], tp=TRUE_IMG["tp"],
        ),
        observations=[maps],
    )
    model = oc.LogDensityModel(
        oc.System(name="llm", variables=dict(M=TRUE_IMG["M"], plx=TRUE_IMG["plx"]), companions=[b]),
        verbosity=0,
    )
    names = model.parameter_names
    flat_true = np.asarray([TRUE_IMG["a"]])
    ll_true = float(model.ln_like_nt(model.arr2nt(jnp.asarray(flat_true))))
    ll_off = float(model.ln_like_nt(model.arr2nt(jnp.asarray([7.0]))))
    assert ll_true > ll_off
