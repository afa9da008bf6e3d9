"""On-chip experiment: partial-arc variational-PT walker scaling.

Measures the bench secondary (_run_partial_arc_pt) at n_walkers=512
vs the shipped 256: sweeps are vectorized over walkers, so doubling
walkers should ~double ESS at similar wall time until compute-bound.
"""
import json
import sys
import time

import jax
import numpy as np

import bench as B
from octofitter_tpu.samplers.tempering import octofit_pigeons


def run(n_walkers, n_rounds=9):
    model = B._build_partial_arc_model()
    kwargs = dict(B._PA_KWARGS)
    kwargs["n_walkers"] = n_walkers
    # 1-round warmup fills the compile cache (shape-identical sweeps)
    octofit_pigeons(model, n_rounds=1, key=jax.random.PRNGKey(1), **kwargs)
    t0 = time.perf_counter()
    chain, info = octofit_pigeons(
        model, n_rounds=n_rounds, key=jax.random.PRNGKey(1), **kwargs
    )
    dt = time.perf_counter() - t0
    ess, rhat = B._chain_ess_rhat(chain)
    out = dict(
        walkers=n_walkers, rounds=n_rounds, ess=ess, rhat=rhat,
        seconds=dt, ess_per_sec=ess / dt,
    )
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    for w in [int(a) for a in sys.argv[1:]] or [512]:
        run(w)
