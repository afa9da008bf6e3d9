"""Mesh-sharded sampling (SURVEY.md section 2.6).

The framework's parallel axes are (chains, tempering replicas, epochs,
trials). This module maps them onto a `jax.sharding.Mesh`:

  - `octofit_sharded`: the chain axis is pure data parallelism — shard
    it with a NamedSharding and the whole warmup+sampling program runs
    SPMD with zero collectives during trajectories (the TPU replacement
    for the reference's one-chain-per-thread/MPI-rank model,
    `ext/OctofitterPigeonsExt/OctofitterPigeonsExt.jl:88-96`).
  - `sharded_pt_swap_step`: the temperature ladder sharded across
    devices; the deterministic-even/odd (DEO) replica exchange
    communicates only the neighbor's log-likelihood via
    `jax.lax.ppermute` over ICI — the TPU-native analogue of Pigeons'
    MPI swap of (beta, logdensity) pairs.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def chain_mesh(n_devices=None, axis_name="chains"):
    """1-D device mesh over the available devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), axis_names=(axis_name,))


def octofit_sharded(model, *, mesh=None, chains=None, **kwargs):
    """`octofit` with the chain axis sharded over a device mesh.

    Chains defaults to 256 x n_devices. All inputs with a chain axis are
    placed with NamedSharding(mesh, P('chains')); XLA partitions the
    entire NUTS program SPMD with no cross-device communication.
    """
    from ..samplers.driver import octofit

    if mesh is None:
        mesh = chain_mesh()
    n_dev = len(mesh.devices.reshape(-1))
    if chains is None:
        chains = 256 * n_dev
    if chains % n_dev != 0:
        chains = (chains // n_dev + 1) * n_dev

    sharding = NamedSharding(mesh, P("chains"))

    # run the standard driver but with sharded starting points: once the
    # inputs are sharded, jit propagates the sharding through warmup and
    # sampling.
    key = kwargs.pop("key", jax.random.PRNGKey(0))
    starting_points = kwargs.pop("starting_points", None)
    if starting_points is None:
        if model.starting_points is None:
            model.initialize(key, verbosity=kwargs.get("verbosity", 1))
        pts = np.asarray(model.starting_points)
        idx = np.resize(np.arange(len(pts)), chains)
        starting_points = pts[idx]
    starting_points = jax.device_put(jnp.asarray(starting_points), sharding)
    return octofit(
        model, key=key, chains=chains, starting_points=starting_points, **kwargs
    )


def sharded_pt_swap_step(axis_name="temps"):
    """Return a function performing one DEO swap pass with the
    temperature axis sharded one-replica-per-device.

    The returned function must be called inside `shard_map` (or an
    equivalently sharded jit) with per-device scalars:
       theta (D,), ll (), beta (), even (bool), key
    It exchanges log-likelihoods with both neighbors via ppermute,
    computes the swap acceptance log alpha = (beta_hi - beta_lo) *
    (ll_lo - ll_hi) redundantly on both partners, and returns the
    (possibly swapped) theta and ll.
    """

    def swap(theta, ll, beta, even, key):
        n = jax.lax.axis_size(axis_name)
        i = jax.lax.axis_index(axis_name)

        # neighbor values (right = i+1, left = i-1), ring-shifted
        def shift(x, offset):
            perm = [(j, (j + offset) % n) for j in range(n)]
            return jax.lax.ppermute(x, axis_name, perm)

        ll_from_left = shift(ll, 1)       # value of i-1 arrives at i
        ll_from_right = shift(ll, -1)     # value of i+1 arrives at i
        beta_from_left = shift(beta, 1)
        beta_from_right = shift(beta, -1)
        theta_from_left = shift(theta, 1)
        theta_from_right = shift(theta, -1)
        key_from_left = shift(key, 1)

        # pair with the right neighbor when (i even) == even sweep
        lower_of_pair = (i % 2) == jnp.where(even, 0, 1)
        has_right = i < n - 1
        has_left = i > 0

        # swap decision for the pair (i, i+1), computed identically on
        # both partners from the lower partner's key
        log_alpha_right = (beta_from_right - beta) * (ll - ll_from_right)
        u_right = jax.random.uniform(key)
        accept_as_lower = (
            lower_of_pair & has_right & (jnp.log(u_right) < log_alpha_right)
        )

        log_alpha_left = (beta - beta_from_left) * (ll_from_left - ll)
        u_left = jax.random.uniform(key_from_left)
        accept_as_upper = (
            (~lower_of_pair) & has_left & (jnp.log(u_left) < log_alpha_left)
        )

        take_right = accept_as_lower
        take_left = accept_as_upper
        theta_new = jnp.where(
            take_right, theta_from_right,
            jnp.where(take_left, theta_from_left, theta),
        )
        ll_new = jnp.where(
            take_right, ll_from_right, jnp.where(take_left, ll_from_left, ll)
        )
        return theta_new, ll_new, take_right | take_left

    return swap
