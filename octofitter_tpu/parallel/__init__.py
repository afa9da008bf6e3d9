"""Device-mesh parallelism."""

from .mesh import (
    chain_mesh,
    octofit_sharded,
    sharded_pt_swap_step,
)

__all__ = ["chain_mesh", "octofit_sharded", "sharded_pt_swap_step"]
