"""Jittered-trajectory HMC transition.

A compile-light alternative to the NUTS transition: a fixed (randomly
jittered) number of leapfrog steps with a Metropolis correction. The
program is a single `fori_loop` — it compiles orders of magnitude
faster than the nested-while NUTS tree on backends with slow
compilation pipelines, while the trajectory jitter recovers most of
NUTS's robustness to resonances (Neal 2011). Shares the Metric /
dual-averaging / Welford machinery with the NUTS module, so
`run_nuts(..., sampler="hmc")` swaps it in transparently.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .nuts import (
    Metric,
    NutsStats,
    _kinetic,
    _leapfrog,
    _sample_momentum,
)


def hmc_step(
    value_and_grad,
    theta,
    lp,
    grad,
    key,
    eps,
    metric: Metric,
    n_leapfrog: int = 32,
):
    """One jittered-HMC transition; same signature/stats as nuts_step."""
    D = theta.shape[0]
    k_mom, k_len, k_acc = jax.random.split(key, 3)
    r0 = _sample_momentum(metric, k_mom, D, theta.dtype)
    H0 = -lp + _kinetic(metric, r0)

    # jitter the trajectory length uniformly in [1, n_leapfrog]
    L = jax.random.randint(k_len, (), 1, n_leapfrog + 1)

    def body(i, carry):
        theta, r, lp, grad = carry
        do = i < L
        theta2, r2, lp2, grad2 = _leapfrog(value_and_grad, theta, r, grad, eps, metric)
        return (
            jnp.where(do, theta2, theta),
            jnp.where(do, r2, r),
            jnp.where(do, lp2, lp),
            jnp.where(do, grad2, grad),
        )

    theta1, r1, lp1, grad1 = jax.lax.fori_loop(
        0, n_leapfrog, body, (theta, r0, lp, grad)
    )
    H1 = -lp1 + _kinetic(metric, r1)
    delta = H1 - H0
    delta = jnp.where(jnp.isnan(delta), jnp.inf, delta)
    alpha = jnp.minimum(1.0, jnp.exp(-delta))
    accept = jax.random.uniform(k_acc) < alpha
    divergent = delta > 1000.0

    theta_new = jnp.where(accept, theta1, theta)
    lp_new = jnp.where(accept, lp1, lp)
    grad_new = jnp.where(accept, grad1, grad)
    stats = NutsStats(
        acceptance_rate=alpha,
        is_divergent=divergent,
        tree_depth=jnp.asarray(0, jnp.int32),
        n_steps=L,
        energy=H0,
        step_size=eps,
    )
    return theta_new, lp_new, grad_new, stats
