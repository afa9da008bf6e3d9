"""Chain <-> model round-trip helpers.

Equivalents of the reference's `construct_elements` (`sampling.jl:98-113`:
build orbit objects from chain rows) and `mcmcchain2result`
(`sampling.jl:649-900`: resolve a chain back into structured parameter
sets).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def chain_to_flat(model, chain):
    """(n_samples, D) natural-space parameter matrix from a Chains."""
    return np.stack(
        [np.asarray(chain[n]).reshape(-1) for n in model.parameter_names],
        axis=-1,
    )


def mcmcchain2result(model, chain, idx=None):
    """Resolve chain draws into structured Params
    (`mcmcchain2result`, `sampling.jl:649-900`).

    idx: optional indices into the flattened (chain, draw) axis.
    Returns a batched Params pytree (leading axis = draws).
    """
    flat = chain_to_flat(model, chain)
    if idx is not None:
        flat = flat[np.atleast_1d(idx)]
    return jax.vmap(model.arr2nt)(jnp.asarray(flat))


def construct_elements(model, chain, planet_name, idx):
    """Build orbit-element objects for draws `idx` of planet
    `planet_name` (`construct_elements`, `sampling.jl:98-113`).

    Returns a batched orbit pytree (leading axis = len(idx)).
    """
    idx = np.atleast_1d(idx)
    flat = chain_to_flat(model, chain)[idx]
    i_planet = [p.name for p in model.system.planets].index(planet_name)

    def one(row):
        nt = model.arr2nt(row)
        return model.construct_orbits(nt)[i_planet]

    return jax.vmap(one)(jnp.asarray(flat))
