"""RV fit with Gaussian-process stellar-activity noise.

Mirrors the reference tutorials `docs/src/rv.md` and `rv-gp.md`: a
single planet in RVs with a quasi-periodic activity signal modelled by
the O(N) differentiable celerite SHO kernel.

Run: python examples/03_rv_gp.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

import octofitter_tpu as oc
from octofitter_tpu import distributions as dist
from octofitter_tpu.constants import MJUP2MSOL
from octofitter_tpu.orbits import RadialVelocityOrbit, orbitsolve, period, radvel
from octofitter_tpu.rv import SHOTerm, StarAbsoluteRVObs

# --- synthetic data: planet + correlated activity ------------------------
true = dict(a=0.25, e=0.15, omega=0.8, tp=57000.0, M=1.0)
true_mass = 1.2  # Mjup
rng = np.random.default_rng(0)
orbit = RadialVelocityOrbit.from_params(**true)
P = float(period(orbit))
epochs = np.sort(rng.uniform(57000.0, 57000.0 + 4 * P, 80))
rv_planet = np.asarray(radvel(orbitsolve(orbit, jnp.asarray(epochs)), true_mass * MJUP2MSOL))
# activity: smooth correlated wiggle
activity = 4.0 * np.sin(2 * np.pi * epochs / 23.0) * np.exp(
    0.2 * np.sin(2 * np.pi * epochs / 290.0)
)
rv = rv_planet + activity + 12.0 + rng.standard_normal(80) * 1.5

rvobs = StarAbsoluteRVObs(
    dict(epoch=epochs, rv=rv, σ_rv=np.full(80, 1.5)),
    dict(
        offset=dist.Normal(0.0, 50.0),
        jitter=dist.LogUniform(0.01, 20.0),
        gp_S0=dist.LogUniform(0.1, 100.0),
        gp_w0=dist.LogUniform(0.01, 2.0),
    ),
    name="HARPS",
    gaussian_process=lambda obs: SHOTerm(S0=obs.gp_S0, w0=obs.gp_w0, Q=3.0),
)

b = oc.Planet(
    name="b",
    basis="RadialVelocityOrbit",
    variables=dict(
        a=dist.Uniform(0.05, 1.0),
        e=dist.Uniform(0.0, 0.7),
        omega=oc.UniformCircular(),
        tp=dist.Uniform(56980.0, 57020.0),
        mass=dist.Uniform(0.0, 20.0),
    ),
)
system = oc.System(
    name="rv-gp",
    variables=dict(M=dist.truncated(dist.Normal(1.0, 0.05), lower=0.1)),
    companions=[b],
    observations=[rvobs],
)
model = oc.LogDensityModel(system)

if __name__ == "__main__":
    chain = oc.octofit(model, chains=8, adaptation=600, iterations=600)
    print(chain)
    mass = chain.flat("b_mass")
    print(f"injected {true_mass} Mjup; recovered {mass.mean():.2f} +/- {mass.std():.2f}")
