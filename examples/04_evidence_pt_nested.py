"""Bayesian evidence: parallel tempering vs nested sampling.

Mirrors the reference tutorials `docs/src/bayesian-evidence.md` and
`eccentric-or-circular.md`: compare two models (free eccentricity vs
circular) by log-evidence, computed two independent ways.

Run: python examples/04_evidence_pt_nested.py
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
from octofitter_tpu.samplers import octofit_nested, octofit_pigeons


def make_model(eccentric: bool):
    true = dict(a=10.0, e=0.25, i=0.6, omega=1.0, Omega=2.0, tp=57000.0, M=1.2, plx=50.0)
    epochs = np.linspace(56000.0, 58000.0, 12)
    sol = orbitsolve(VisualOrbit.from_params(**true), jnp.asarray(epochs))
    rng = np.random.default_rng(1)
    astrom = oc.PlanetRelAstromObs(
        dict(epoch=epochs,
             ra=np.asarray(raoff(sol)) + rng.standard_normal(12) * 1.0,
             dec=np.asarray(decoff(sol)) + rng.standard_normal(12) * 1.0,
             σ_ra=np.full(12, 1.0), σ_dec=np.full(12, 1.0)),
        name="astrom",
    )
    e_var = dist.Uniform(0.0, 0.9) if eccentric else 1e-4
    b = oc.Planet(
        name="b", basis="Visual{KepOrbit}",
        variables=dict(
            a=dist.Uniform(0.001, 100.0), e=e_var, i=dist.Sine(),
            omega=oc.UniformCircular(), Omega=oc.UniformCircular(),
            theta=oc.UniformCircular(),
            tp=lambda sys, pl: oc.theta_at_epoch_to_tperi(
                pl.theta, 57000.0, M=sys.M, e=pl.e, a=pl.a,
                i=pl.i, omega=pl.omega, Omega=pl.Omega),
        ),
        observations=[astrom],
    )
    system = oc.System(
        name="ecc" if eccentric else "circ",
        variables=dict(
            M=dist.truncated(dist.Normal(1.2, 0.1), lower=0.1),
            plx=dist.truncated(dist.Normal(50.0, 0.02), lower=0.1),
        ),
        companions=[b],
    )
    return oc.LogDensityModel(system)


if __name__ == "__main__":
    for eccentric in (True, False):
        model = make_model(eccentric)
        label = "eccentric" if eccentric else "circular"
        _, pt_info = octofit_pigeons(
            model, n_rounds=8, n_chains=12, n_walkers=16, verbosity=0
        )
        _, ns_info = octofit_nested(model, n_live=600, verbosity=0)
        print(
            f"{label}: logZ(PT stepping stone) = {pt_info['logevidence']:.2f}, "
            f"logZ(nested) = {ns_info['logz']:.2f}"
        )
