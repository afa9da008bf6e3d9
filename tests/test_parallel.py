"""Multi-device tests on the forced 8-device CPU mesh
(SURVEY.md section 4: fake-mesh test for the PT swap collective)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from octofitter_tpu.parallel import chain_mesh, sharded_pt_swap_step


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_pt_swap_collective():
    """DEO swap over ppermute: partners agree, states are permuted (no
    loss/duplication beyond pair swaps), and acceptance matches the
    serial computation."""
    n = 8
    D = 3
    mesh = chain_mesh(axis_name="temps")
    rng = np.random.default_rng(0)
    theta = jnp.asarray(rng.standard_normal((n, D)))
    ll = jnp.asarray(rng.standard_normal(n) * 5)
    betas = jnp.linspace(0.0, 1.0, n)
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    key_data = jax.random.key_data(keys)

    swap = sharded_pt_swap_step("temps")

    def per_device(theta, ll, beta, key_data, even):
        key = jax.random.wrap_key_data(key_data[0])
        th, l, swapped = swap(theta[0], ll[0], beta[0], even, key)
        return th[None], l[None], swapped[None]

    f = shard_map(
        lambda th, l, b, k: per_device(th, l, b, k, jnp.asarray(True)),
        mesh=mesh,
        in_specs=(P("temps"), P("temps"), P("temps"), P("temps")),
        out_specs=(P("temps"), P("temps"), P("temps")),
    )
    th_new, ll_new, swapped = jax.jit(f)(theta, ll, betas, key_data)
    th_new = np.asarray(th_new)
    ll_new = np.asarray(ll_new)
    swapped = np.asarray(swapped)

    # serial reference for the even pass: pairs (0,1), (2,4), ...
    th_ref = np.asarray(theta).copy()
    ll_ref = np.asarray(ll).copy()
    for i in range(0, n - 1, 2):
        log_alpha = float((betas[i + 1] - betas[i]) * (ll[i] - ll[i + 1]))
        u = float(jax.random.uniform(keys[i]))
        if np.log(u) < log_alpha:
            th_ref[[i, i + 1]] = th_ref[[i + 1, i]]
            ll_ref[[i, i + 1]] = ll_ref[[i + 1, i]]
    np.testing.assert_allclose(th_new, th_ref, rtol=1e-12)
    np.testing.assert_allclose(ll_new, ll_ref, rtol=1e-12)
    # pair consistency: both partners swapped or neither
    for i in range(0, n - 1, 2):
        assert swapped[i] == swapped[i + 1]


def test_octofit_sharded_runs():
    import sys

    sys.path.insert(0, "tests")
    from test_model import quickstart_model

    from octofitter_tpu.parallel import octofit_sharded

    model = quickstart_model()
    # cheap: tiny chain counts, starting points from prior search
    pts, _ = model.prior_search(jax.random.PRNGKey(0), 5000, 64)
    model.starting_points = np.asarray(pts)
    chain = octofit_sharded(
        model,
        chains=16,
        adaptation=100,
        iterations=50,
        max_depth=6,
        verbosity=0,
    )
    assert chain.n_chains == 16
    assert np.all(np.isfinite(chain.internals["logpost"]))
