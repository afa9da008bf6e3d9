"""Simulation-based calibration with rank plots.

Multi-trial SBC fan-out (reference `sbc.jl` `calibrationhmc` +
`calibrationplots`): draw truths from the priors, generate synthetic
observations, refit, and check that the rank of each truth within its
marginal posterior is uniform. Each trial is an independent fit — the
batch fans out across devices on a pod; here they run sequentially on
one chip.

Run: python examples/10_sbc_calibration.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

import octofitter_tpu as oc
from octofitter_tpu import distributions as dist
from octofitter_tpu.analysis import calibrate
from octofitter_tpu.orbits import VisualOrbit, orbitsolve, raoff, decoff
from octofitter_tpu.plots import calibrationplots, sbc_corner


def build_model():
    true = dict(a=10.0, e=0.15, i=0.6, omega=1.0, Omega=2.0, tp=57000.0,
                M=1.2, plx=50.0)
    epochs = np.linspace(56000.0, 58000.0, 6)
    sol = orbitsolve(VisualOrbit.from_params(**true), jnp.asarray(epochs))
    rng = np.random.default_rng(0)
    astrom = oc.PlanetRelAstromObs(
        dict(
            epoch=epochs,
            ra=np.asarray(raoff(sol)) + rng.standard_normal(6) * 2.0,
            dec=np.asarray(decoff(sol)) + rng.standard_normal(6) * 2.0,
            σ_ra=np.full(6, 2.0),
            σ_dec=np.full(6, 2.0),
        ),
        name="simdata",
    )
    b = oc.Planet(
        name="b",
        basis="Visual{KepOrbit}",
        variables=dict(
            a=dist.Uniform(8.0, 12.0),
            e=dist.Uniform(0.0, 0.3),
            i=0.6, omega=1.0, Omega=2.0, tp=57000.0,
        ),
        observations=[astrom],
    )
    return oc.LogDensityModel(
        oc.System(name="sbc_demo", variables=dict(M=1.2, plx=50.0),
                  companions=[b]),
        verbosity=0,
    )


def main():
    model = build_model()
    n_trials = 24
    res = calibrate(
        model, n_trials=n_trials, seed=1,
        sampler_kwargs=dict(sampler="chees", chains=8, adaptation=300,
                            iterations=200),
        init_at_truth=True,
        verbosity=1,
    )
    for name, r in res.items():
        print(f"{name}: KS distance {r['ks_distance']:.3f} "
              f"(mean rank {np.mean(r['ranks']):.2f})")
    calibrationplots(res, fname="sbc_ranks.png")
    sbc_corner(res, fname="sbc_rank_corner.png")
    print("wrote sbc_ranks.png, sbc_rank_corner.png")


if __name__ == "__main__":
    main()
