"""OFTI-style semi-linear orbit fitting with rejection sampling.

Port of the reference's `examples/ofti_rejection_sampling.jl`: for fixed
nonlinear parameters (e, a, tp, M, plx) the sky-plane positions are
LINEAR in the Thiele-Innes constants (A, B, F, G), so
`ofti_linear_solve` marginalizes them analytically and the model drops
from ~11 to 5 free dimensions. Two samplers on the same model:

  1. `octofit_rejection` — IID prior draws accepted against the
     marginal likelihood (`sampling.jl:168-279`): no tuning, zero
     autocorrelation; practical because the dimension is low.
  2. `octofit` (ChEES-HMC) — gradient-based, more sample-efficient.

Run: python examples/09_ofti_rejection.py
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
from octofitter_tpu.constants import KEPLER_YEAR_DAYS
from octofitter_tpu.model.parameterizations import ofti_linear_solve
from octofitter_tpu.model.variables import DirectLL
from octofitter_tpu.orbits import VisualOrbit, orbitsolve, raoff, decoff

TRUE = dict(a=10.0, e=0.3, i=1.0, omega=0.5, Omega=2.0, tp=50000.0,
            M=1.2, plx=50.0)


def build_model(seed=42, n_epochs=8, sigma=10.0):
    """5-parameter OFTI model over synthetic astrometry; returns
    (model, data dict)."""
    epochs = np.linspace(50000.0, 50840.0, n_epochs)
    sol = orbitsolve(VisualOrbit.from_params(**TRUE), jnp.asarray(epochs))
    rng = np.random.default_rng(seed)
    ra_obs = np.asarray(raoff(sol)) + rng.standard_normal(n_epochs) * sigma
    dec_obs = np.asarray(decoff(sol)) + rng.standard_normal(n_epochs) * sigma
    s_ra = np.full(n_epochs, sigma)
    s_dec = np.full(n_epochs, sigma)
    cor = np.zeros(n_epochs)

    def ofti(s):
        tp = epochs[0] + s.tau * jnp.sqrt(s.a**3 / s.M) * KEPLER_YEAR_DAYS
        return ofti_linear_solve(
            epochs, ra_obs, dec_obs, s_ra, s_dec, cor,
            1000.0,  # sigma_ABFG: prior width on Thiele-Innes constants
            s.e, s.a, tp, s.M, s.plx,
        )

    system = oc.System(
        name="OFTI_Demo",
        variables=dict(
            M=dist.truncated(dist.Normal(1.2, 0.1), lower=0.1),
            plx=dist.truncated(dist.Normal(50.0, 0.5), lower=0.1),
            e=dist.Uniform(0.0, 0.99),
            a=dist.LogUniform(1.0, 100.0),
            tau=dist.Uniform(0.0, 1.0),
            # inject the marginal likelihood (the reference's `LL +=`)
            ll=lambda s: ofti(s)["log_marginal_likelihood"],
            # derived epoch of periastron for post-processing
            tp=lambda s: epochs[0]
            + s.tau * jnp.sqrt(s.a**3 / s.M) * KEPLER_YEAR_DAYS,
        ),
        observations=[DirectLL("ll")],
    )
    data = dict(epochs=epochs, ra=ra_obs, dec=dec_obs, s_ra=s_ra,
                s_dec=s_dec, cor=cor)
    return oc.LogDensityModel(system, verbosity=0), data


def recover_thiele_innes(model, chain, data):
    """Best-fit (A, B, F, G) at the posterior-median nonlinear params
    (the reference stores them as derived variables)."""
    med = {k: float(np.median(chain.flat(k)))
           for k in ("e", "a", "tau", "M", "plx", "tp")}
    res = ofti_linear_solve(
        data["epochs"], data["ra"], data["dec"], data["s_ra"],
        data["s_dec"], data["cor"], 1000.0,
        med["e"], med["a"], med["tp"], med["M"], med["plx"],
    )
    return {k: float(res[k]) for k in ("A", "B", "F", "G")}


def main():
    from octofitter_tpu.samplers.driver import octofit, octofit_rejection

    model, data = build_model()
    print(f"OFTI model: {model.D} free parameters "
          f"(A,B,F,G marginalized analytically)")

    print("\n=== Approach 1: rejection sampling ===")
    chain_rej = octofit_rejection(
        model, key=jax.random.PRNGKey(0),
        num_samples=20_000, batch_size=500_000, max_batches=20,
    )
    print(f"accepted fraction {chain_rej.info['acceptance_fraction']:.2e}")
    for k, tr in [("e", TRUE["e"]), ("a", TRUE["a"]), ("M", TRUE["M"]),
                  ("plx", TRUE["plx"])]:
        print(f"  {k}: median={np.median(chain_rej.flat(k)):.3g}  true={tr}")

    print("\n=== Approach 2: ChEES-HMC ===")
    model.initialize(jax.random.PRNGKey(1), verbosity=0)
    chain_hmc = octofit(model, key=jax.random.PRNGKey(2), chains=64,
                        adaptation=600, iterations=600, verbosity=0)
    for k, tr in [("e", TRUE["e"]), ("a", TRUE["a"]), ("M", TRUE["M"]),
                  ("plx", TRUE["plx"])]:
        print(f"  {k}: median={np.median(chain_hmc.flat(k)):.3g}  true={tr}")

    ti = recover_thiele_innes(model, chain_rej, data)
    print(f"\nThiele-Innes at rejection median: {ti}")

    # posterior plot over (a, e, tp)
    from octofitter_tpu.plots import octocorner

    octocorner(chain_rej, variables=["a", "e", "tp"],
               fname="ofti_rejection_corner.png")
    print("saved ofti_rejection_corner.png")


if __name__ == "__main__":
    main()
