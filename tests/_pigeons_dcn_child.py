"""Child process for the cross-process production-PT test
(test_parallel.py::test_pigeons_across_process_boundary).

Joins a 2-process jax.distributed runtime (2 local CPU devices each),
builds the 4-device global mesh, and runs the PRODUCTION
`octofit_pigeons` sweep with the walker axis sharded across the process
boundary — the full replacement for the reference's one-replica-per-MPI-
rank Pigeons path (`OctofitterPigeonsExt.jl:88-96`,
`docs/src/parallel-sampling.md:60-120`). Prints the recorded target-rung
draws at full precision so the parent can assert bit-identity with a
single-process run over the same 4-device mesh shape.
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from octofitter_tpu.parallel import (  # noqa: E402
    global_mesh,
    initialize_distributed,
)


def build_model():
    import octofitter_tpu as oc
    from octofitter_tpu import distributions as dist
    from octofitter_tpu.model.variables import UserLikelihood

    obs = UserLikelihood(dist.Normal(1.0, 0.5), "x", name="obs1")
    system = oc.System(
        name="conj_dcn",
        variables=dict(x=dist.Normal(0.0, 1.0)),
        observations=[obs],
    )
    return oc.LogDensityModel(system, verbosity=0)


PT_KWARGS = dict(
    n_rounds=2, n_chains=4, n_walkers=8,
    explorer="hmc", explorer_n_leapfrog=8, verbosity=0,
)


def main():
    import numpy as np

    from octofitter_tpu.samplers.tempering import octofit_pigeons

    ok = initialize_distributed()
    assert ok, "distributed config not picked up from env"
    assert jax.process_count() == 2
    mesh = global_mesh(("walkers",))
    assert mesh.devices.size == 4

    chain, info = octofit_pigeons(
        build_model(), key=jax.random.PRNGKey(0), mesh=mesh, **PT_KWARGS
    )
    x = np.asarray(chain.flat("x"))
    pid = jax.process_index()
    print(f"proc{pid} x " + " ".join(f"{v:.17e}" for v in x), flush=True)
    print(f"proc{pid} trips {info['n_round_trips']}", flush=True)
    print(
        f"proc{pid} rej "
        + " ".join(f"{v:.17e}" for v in np.asarray(info["swap_rejection"])),
        flush=True,
    )
    print(f"proc{pid} logz {info['logevidence']:.17e}", flush=True)
    print(f"proc{pid} OK", flush=True)


if __name__ == "__main__":
    main()
