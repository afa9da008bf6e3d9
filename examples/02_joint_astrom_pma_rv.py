"""Joint fit: relative astrometry + HGCA proper-motion anomaly + RVs.

Mirrors the reference tutorial `docs/src/astrom-pma-rv.md` — the
benchmark configuration from BASELINE.md. Synthetic data for a
beta-Pic-like massive companion.

Run: python examples/02_joint_astrom_pma_rv.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import octofitter_tpu as oc
from octofitter_tpu import distributions as dist
from octofitter_tpu.constants import J2000_MJD, JULIAN_YEAR_DAYS, MJUP2MSOL
from octofitter_tpu.likelihoods.hgca import HGCAInstantaneousObs, gaia_plx
from octofitter_tpu.orbits import (
    VisualOrbit, orbitsolve, raoff, decoff, pmra, pmdec, radvel,
)
from octofitter_tpu.rv import MarginalizedStarAbsoluteRVObs


def build_model(seed=0):
    true = dict(a=9.0, e=0.1, i=0.6, omega=1.0, Omega=2.0, tp=56500.0, M=1.6, plx=51.0)
    true_mass = 12.0  # Mjup
    true_pm = dict(pmra=4.6, pmdec=83.0)
    rng = np.random.default_rng(seed)
    orbit = VisualOrbit.from_params(**true)
    m = true_mass * MJUP2MSOL

    # astrometry
    epochs = np.linspace(55000.0, 58500.0, 10)
    s = orbitsolve(orbit, jnp.asarray(epochs))
    astrom = oc.PlanetRelAstromObs(
        dict(epoch=epochs,
             ra=np.asarray(raoff(s)) + rng.standard_normal(10) * 3.0,
             dec=np.asarray(decoff(s)) + rng.standard_normal(10) * 3.0,
             σ_ra=np.full(10, 3.0), σ_dec=np.full(10, 3.0)),
        name="astrom",
    )

    # HGCA row consistent with the injected companion
    t_hip = (1991.25 - 2000.0) * JULIAN_YEAR_DAYS + J2000_MJD
    t_gaia = (2016.0 - 2000.0) * JULIAN_YEAR_DAYS + J2000_MJD
    s_h = orbitsolve(orbit, jnp.asarray(t_hip))
    s_g = orbitsolve(orbit, jnp.asarray(t_gaia))
    hgca_row = dict(
        pmra_hip=true_pm["pmra"] + float(pmra(s_h, m)) + rng.standard_normal() * 0.4,
        pmdec_hip=true_pm["pmdec"] + float(pmdec(s_h, m)) + rng.standard_normal() * 0.4,
        pmra_hip_error=0.4, pmdec_hip_error=0.4, pmra_pmdec_hip=0.1,
        pmra_gaia=true_pm["pmra"] + float(pmra(s_g, m)) + rng.standard_normal() * 0.03,
        pmdec_gaia=true_pm["pmdec"] + float(pmdec(s_g, m)) + rng.standard_normal() * 0.03,
        pmra_gaia_error=0.03, pmdec_gaia_error=0.03, pmra_pmdec_gaia=-0.2,
        pmra_hg=true_pm["pmra"]
        + (float(raoff(s_g, m)) - float(raoff(s_h, m))) / (t_gaia - t_hip) * JULIAN_YEAR_DAYS,
        pmdec_hg=true_pm["pmdec"]
        + (float(decoff(s_g, m)) - float(decoff(s_h, m))) / (t_gaia - t_hip) * JULIAN_YEAR_DAYS,
        pmra_hg_error=0.03, pmdec_hg_error=0.03, pmra_pmdec_hg=0.0,
        epoch_ra_hip=1991.25, epoch_dec_hip=1991.25,
        epoch_ra_gaia=2016.0, epoch_dec_gaia=2016.0,
        parallax_gaia=true["plx"], parallax_gaia_error=0.1,
        nonlinear_dpmra=0.0, nonlinear_dpmdec=0.0,
    )
    hgca = HGCAInstantaneousObs(hgca=hgca_row, N_ave=5)

    # RVs of the star
    rv_epochs = np.sort(rng.uniform(56500.0, 58500.0, 40))
    s_rv = orbitsolve(orbit, jnp.asarray(rv_epochs))
    rv_star = np.asarray(radvel(s_rv, m))
    rvobs = MarginalizedStarAbsoluteRVObs(
        dict(epoch=rv_epochs,
             rv=rv_star + 30.0 + rng.standard_normal(40) * 5.0,
             σ_rv=np.full(40, 5.0)),
        dict(jitter=dist.LogUniform(0.01, 30.0)),
        name="rvs",
    )

    b = oc.Planet(
        name="b",
        basis="Visual{KepOrbit}",
        variables=dict(
            a=dist.Uniform(1.0, 50.0),
            e=dist.Uniform(0.0, 0.9),
            i=dist.Sine(),
            omega=oc.UniformCircular(),
            Omega=oc.UniformCircular(),
            theta=oc.UniformCircular(),
            mass=dist.LogUniform(0.1, 100.0),
            tp=lambda sys, pl: oc.theta_at_epoch_to_tperi(
                pl.theta, 57000.0, M=sys.M, e=pl.e, a=pl.a,
                i=pl.i, omega=pl.omega, Omega=pl.Omega,
            ),
        ),
        observations=[astrom],
    )
    system = oc.System(
        name="betapic-like",
        variables=dict(
            M=dist.truncated(dist.Normal(1.6, 0.05), lower=0.1),
            plx=gaia_plx(hgca_row=hgca_row),
            pmra=dist.Normal(0.0, 200.0),
            pmdec=dist.Normal(0.0, 200.0),
        ),
        companions=[b],
        observations=[hgca, rvobs],
    )
    return oc.LogDensityModel(system), true, true_mass


if __name__ == "__main__":
    model, true, true_mass = build_model()
    chain = oc.octofit(model, chains=16, adaptation=700, iterations=700)
    print(chain)
    mass = chain.flat("b_mass")
    print(f"injected mass {true_mass} Mjup; "
          f"recovered {mass.mean():.2f} +/- {mass.std():.2f} Mjup")
    oc.octoplot(model, chain, fname="joint_fit.png")
