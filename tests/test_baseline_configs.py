"""End-to-end runs of the two BASELINE.md benchmark configs not already
covered by bench.py or another test:

- multi-planet astrometry+RV in the Thiele-Innes basis sampled with
  mesh-sharded parallel tempering (BASELINE.md "Benchmark configs");
- a joint direct-image + interferometry fit of the same companion
  (reference behavior: OctofitterImages/src/images.jl:154-256 +
  OctofitterInterferometry/src/OctofitterInterferometry.jl:13-449 in
  one System).

These are deliberately small (CPU CI); bench.py measures throughput.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

import octofitter_tpu as oc
from octofitter_tpu import distributions as dist
from octofitter_tpu.orbits import (
    VisualOrbit, orbitsolve, raoff, decoff, radvel,
)


pytestmark = pytest.mark.integration

def _simulate_astrom(true, epochs, sigma, rng, name):
    sol = orbitsolve(VisualOrbit.from_params(**true), jnp.asarray(epochs))
    n = len(epochs)
    return oc.PlanetRelAstromObs(
        dict(
            epoch=np.asarray(epochs),
            ra=np.asarray(raoff(sol)) + rng.standard_normal(n) * sigma,
            dec=np.asarray(decoff(sol)) + rng.standard_normal(n) * sigma,
            σ_ra=np.full(n, sigma),
            σ_dec=np.full(n, sigma),
        ),
        name=name,
    )


def _ti_planet(name, astrom, ref_epoch, amp):
    return oc.Planet(
        name=name,
        basis="ThieleInnesOrbit",
        variables=dict(
            e=dist.Uniform(0.0, 0.7),
            A=dist.Normal(0.0, amp),
            B=dist.Normal(0.0, amp),
            F=dist.Normal(0.0, amp),
            G=dist.Normal(0.0, amp),
            mass=dist.LogUniform(0.1, 100.0),
            theta=oc.UniformCircular(),
            tp=lambda sys, pl, _t=ref_epoch: oc.theta_at_epoch_to_tperi(
                pl.theta, _t, M=sys.M, e=pl.e,
                A=pl.A, B=pl.B, F=pl.F, G=pl.G, plx=sys.plx,
            ),
        ),
        observations=[astrom],
    )


def test_multiplanet_ti_rv_mesh_pt():
    """BASELINE.md benchmark config: 2-planet astrometry+RV fit in the
    Thiele-Innes basis, sampled with octofit_pigeons over a
    (walkers, rungs) device mesh."""
    from octofitter_tpu.constants import MJUP2MSOL
    from octofitter_tpu.rv import MarginalizedStarAbsoluteRVObs
    from octofitter_tpu.samplers.tempering import octofit_pigeons

    rng = np.random.default_rng(3)
    true_b = dict(a=6.0, e=0.15, i=0.6, omega=1.0, Omega=2.0,
                  tp=57000.0, M=1.2, plx=40.0)
    true_c = dict(a=12.0, e=0.05, i=0.6, omega=0.3, Omega=2.0,
                  tp=56000.0, M=1.2, plx=40.0)
    ep_b = np.linspace(55000.0, 58800.0, 12)
    ep_c = np.linspace(55000.0, 58800.0, 9)
    astrom_b = _simulate_astrom(true_b, ep_b, 1.0, rng, "astrom_b")
    astrom_c = _simulate_astrom(true_c, ep_c, 1.0, rng, "astrom_c")

    # star reflex RV from both companions
    m_b, m_c = 8.0 * MJUP2MSOL, 4.0 * MJUP2MSOL
    rv_epochs = np.sort(rng.uniform(55500.0, 58500.0, 30))
    s_b = orbitsolve(VisualOrbit.from_params(**true_b), jnp.asarray(rv_epochs))
    s_c = orbitsolve(VisualOrbit.from_params(**true_c), jnp.asarray(rv_epochs))
    rv_star = np.asarray(radvel(s_b, m_b)) + np.asarray(radvel(s_c, m_c))
    rvobs = MarginalizedStarAbsoluteRVObs(
        dict(epoch=rv_epochs,
             rv=rv_star + 12.0 + rng.standard_normal(30) * 4.0,
             σ_rv=np.full(30, 4.0)),
        dict(jitter=dist.LogUniform(0.01, 30.0)),
        name="rvs",
    )

    system = oc.System(
        name="ti2p",
        variables=dict(
            M=dist.truncated(dist.Normal(1.2, 0.1), lower=0.1),
            plx=dist.truncated(dist.Normal(40.0, 0.02), lower=0.1),
        ),
        companions=[
            _ti_planet("b", astrom_b, 57000.0, 400.0),
            _ti_planet("c", astrom_c, 57000.0, 600.0),
        ],
        observations=[rvobs],
    )
    model = oc.LogDensityModel(system, verbosity=0)

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    mesh = Mesh(np.array(devs).reshape(4, 2), axis_names=("walkers", "rungs"))
    chain, info = octofit_pigeons(
        model, n_rounds=2, n_chains=4, n_walkers=8,
        explorer="hmc", explorer_n_leapfrog=8, verbosity=0,
        key=jax.random.PRNGKey(0), mesh=mesh,
    )

    # both planets' Thiele-Innes elements and masses are sampled, the
    # RV nuisance is present, and everything recorded is finite
    for name in ("b_A", "b_G", "c_A", "c_G", "b_mass", "c_mass",
                 "rvs_jitter", "M", "plx"):
        vals = chain.flat(name)
        assert np.all(np.isfinite(vals)), name
    assert np.isfinite(info["logevidence"])
    # the (tight) parallax prior must dominate the plx margin
    assert abs(chain.flat("plx").mean() - 40.0) < 0.1


def test_image_plus_interferometry_joint_fit():
    """BASELINE.md benchmark config: one System fitting a direct image
    AND interferometric closure phases of the same companion."""
    from octofitter_tpu.images import ImageObs
    from octofitter_tpu.interferometry import (
        InterferometryObs, closure_phases_deg, cvis_point_sources,
    )

    rng = np.random.default_rng(0)
    true = dict(a=12.0, e=0.1, i=0.5, omega=1.0, Omega=2.0, tp=57000.0,
                M=1.2, plx=30.0)

    # image epoch: point source on a noise map
    epoch_img = 57400.0
    sol = orbitsolve(VisualOrbit.from_params(**true), jnp.asarray([epoch_img]))
    ra_t, dec_t = float(raoff(sol)[0]), float(decoff(sol)[0])
    platescale, npix = 10.0, 101
    img = rng.standard_normal((npix, npix)) * 0.1
    # image convention: column = -RA/platescale (RA increases left)
    ix = int(round(dec_t / platescale)) + npix // 2
    iy = int(round(-ra_t / platescale)) + npix // 2
    img[ix - 1: ix + 2, iy - 1: iy + 2] += 3.0
    images = ImageObs(
        [dict(image=img, epoch=epoch_img, platescale=platescale)],
        variables=dict(flux=dist.Uniform(0.0, 10.0)),
        name="nircam",
    )

    # interferometry epoch: closure phases of the same orbit
    epoch_if = 57500.0
    sol_if = orbitsolve(VisualOrbit.from_params(**true), jnp.asarray([epoch_if]))
    dra, ddec = float(raoff(sol_if)[0]), float(decoff(sol_if)[0])
    eff_wave = np.linspace(2.0e-6, 2.4e-6, 5)
    u = np.array([40.0, -25.0, 65.0])[:, None] / eff_wave[None, :]
    v = np.array([15.0, 80.0, -35.0])[:, None] / eff_wave[None, :]
    cvis = cvis_point_sources(jnp.asarray(u), jnp.asarray(v),
                              [jnp.asarray(dra)], [jnp.asarray(ddec)],
                              [jnp.asarray(0.02)])
    cp = np.asarray(closure_phases_deg(cvis, [0], [2], [1]))
    vlti = InterferometryObs(
        [dict(epoch=epoch_if, u=u, v=v,
              cps_data=cp + rng.standard_normal(cp.shape) * 0.5,
              dcps=np.full(cp.shape, 0.5),
              index_cps1=np.array([0]), index_cps2=np.array([2]),
              index_cps3=np.array([1]), use_vis2=False)],
        variables=dict(f=dist.LogUniform(1e-3, 1e-1),
                       flux=lambda s, p, o: jnp.asarray([o["f"]])),
        name="gravity",
    )

    b = oc.Planet(
        name="b", basis="Visual{KepOrbit}",
        variables=dict(a=dist.Uniform(5.0, 20.0), e=0.1, i=0.5,
                       omega=1.0, Omega=2.0, tp=57000.0),
        observations=[images, vlti],
    )
    model = oc.LogDensityModel(
        oc.System(name="imgif", variables=dict(M=1.2, plx=30.0),
                  companions=[b]),
        verbosity=0,
    )
    chain = oc.octofit(model, chains=16, adaptation=250, iterations=150,
                       max_depth=8, verbosity=0)
    a_post = chain.flat("b_a")
    # both datasets constrain the same separation; the joint posterior
    # must land on the injected semi-major axis
    assert abs(a_post.mean() - true["a"]) < 1.0
    assert np.all(np.isfinite(chain.flat("b_gravity_f")))
