"""Multi-host (DCN) runtime wiring.

TPU-native replacement for the reference's MPI path (Pigeons
`MPIProcesses` + Slurm launchers, `docs/src/parallel-sampling.md:60-120`):
the SAME jitted program runs on every host; `jax.distributed.initialize`
joins the hosts into one runtime, device meshes span all processes, and
XLA routes collectives over ICI within a slice and DCN across slices.

Usage on each host (or via a scheduler that sets the env vars):

    import octofitter_tpu as oc
    oc.parallel.initialize_distributed()          # env-driven
    mesh = oc.parallel.global_mesh(("chains",))
    chain = oc.parallel.octofit_sharded(model, mesh=mesh, ...)

Environment variables (standard JAX names, read by
`resolve_distributed_config`): JAX_COORDINATOR_ADDRESS,
JAX_NUM_PROCESSES, JAX_PROCESS_ID (with OCTOFITTER_* overrides and
SLURM_* fallbacks so Slurm job arrays work without wrappers, matching
the reference's Slurm workflow).
"""

from __future__ import annotations

import os

import numpy as np

import jax
from jax.sharding import Mesh


def resolve_distributed_config(env=None) -> dict | None:
    """Resolve (coordinator_address, num_processes, process_id) from the
    environment. Returns None when no multi-host configuration is
    present (single-host run; nothing to initialize)."""
    env = os.environ if env is None else env

    def pick(*names):
        for n in names:
            v = env.get(n)
            if v not in (None, ""):
                return v
        return None

    addr = pick("OCTOFITTER_COORDINATOR", "JAX_COORDINATOR_ADDRESS")
    nproc = pick("OCTOFITTER_NUM_PROCESSES", "JAX_NUM_PROCESSES",
                 "SLURM_NTASKS")
    pid = pick("OCTOFITTER_PROCESS_ID", "JAX_PROCESS_ID", "SLURM_PROCID")
    if addr is None and nproc is None:
        return None
    if addr is None and "SLURM_JOB_NODELIST" in env:
        # first node of the allocation on a default port — the same
        # convention the reference's generated Slurm scripts use for the
        # MPI bootstrap
        first = env["SLURM_JOB_NODELIST"].split(",")[0].split("[")[0]
        addr = f"{first}:8476"
    if addr is None or nproc is None or pid is None:
        raise ValueError(
            "incomplete multi-host configuration: need coordinator "
            "address, process count, and process id "
            f"(got addr={addr!r}, num={nproc!r}, id={pid!r})"
        )
    return dict(
        coordinator_address=addr,
        num_processes=int(nproc),
        process_id=int(pid),
    )


def initialize_distributed(config: dict | None = None) -> bool:
    """Join this process into a multi-host JAX runtime over DCN.

    config: explicit dict(coordinator_address, num_processes,
    process_id), else resolved from the environment. Returns True if
    the distributed runtime was initialized, False for single-host runs
    (no-op). Call before any other JAX operation.
    """
    if config is None:
        config = resolve_distributed_config()
    if config is None or config["num_processes"] <= 1:
        return False
    jax.distributed.initialize(**config)
    return True


def global_mesh(axis_names=("chains",), axis_sizes=None) -> Mesh:
    """A device mesh spanning every process's devices.

    With one axis, all global devices form one row (pure data-parallel
    chains axis: no communication during trajectories, psum/ppermute
    only for diagnostics and PT swaps). axis_sizes reshapes the global
    device list for multi-axis layouts — put the fastest-varying axis
    last so it lands on ICI within a host/slice and only the leading
    axis crosses DCN.
    """
    devs = np.asarray(jax.devices())
    if axis_sizes is None:
        if len(axis_names) != 1:
            raise ValueError("axis_sizes required for multi-axis meshes")
        shape = (len(devs),)
    else:
        shape = tuple(axis_sizes)
        if int(np.prod(shape)) != len(devs):
            raise ValueError(
                f"axis_sizes {shape} != device count {len(devs)}"
            )
    return Mesh(devs.reshape(shape), axis_names=axis_names)
