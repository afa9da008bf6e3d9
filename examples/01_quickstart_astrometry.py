"""Quick start: fit relative astrometry of a directly-imaged companion.

Mirrors the reference tutorial `docs/src/quick-start.md`. Generates
synthetic astrometry, fits with vectorized NUTS, prints a summary and
saves plots.

Run: python examples/01_quickstart_astrometry.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import octofitter_tpu as oc
from octofitter_tpu import distributions as dist
from octofitter_tpu.orbits import VisualOrbit, orbitsolve, raoff, decoff

# --- synthetic data ------------------------------------------------------
true = dict(a=10.0, e=0.2, i=0.6, omega=1.0, Omega=2.0, tp=57000.0, M=1.2, plx=50.0)
epochs = np.linspace(56000.0, 58000.0, 8)
sol = orbitsolve(VisualOrbit.from_params(**true), jnp.asarray(epochs))
rng = np.random.default_rng(0)
astrom = oc.PlanetRelAstromObs(
    dict(
        epoch=epochs,
        ra=np.asarray(raoff(sol)) + rng.standard_normal(8) * 2.0,
        dec=np.asarray(decoff(sol)) + rng.standard_normal(8) * 2.0,
        σ_ra=np.full(8, 2.0),
        σ_dec=np.full(8, 2.0),
    ),
    name="simdata",
)

# --- model ---------------------------------------------------------------
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
            pl.theta, 57000.0, M=sys.M, e=pl.e, a=pl.a,
            i=pl.i, omega=pl.omega, Omega=pl.Omega,
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
model = oc.LogDensityModel(system)

# --- sample --------------------------------------------------------------
chain = oc.octofit(model, chains=16, adaptation=500, iterations=500)
print(chain)

oc.octoplot(model, chain, fname="quickstart_orbits.png")
oc.octocorner(model, chain, small=True, fname="quickstart_corner.png")
print("wrote quickstart_orbits.png, quickstart_corner.png")
