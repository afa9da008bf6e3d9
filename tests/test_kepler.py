"""Unit tests for the Kepler solvers and orbit kernel.

Mirrors the reference's golden-value strategy (SURVEY.md section 4):
verify the solver against the defining equation over the full (M, e)
range, check implicit-diff gradients against finite differences, and
check solution accessors against independent formulas.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from octofitter_tpu.orbits import (
    kepler_solver,
    kepler_solver_hyperbolic,
)


def test_kepler_residual_dense_grid():
    M = jnp.linspace(-20, 20, 2001)
    for e in [0.0, 0.1, 0.5, 0.9, 0.99, 0.999]:
        E = kepler_solver(M, jnp.full_like(M, e))
        resid = E - e * jnp.sin(E) - M
        assert float(jnp.max(jnp.abs(resid))) < 1e-12, f"e={e}"


def test_kepler_continuity_and_symmetry():
    # E(M) - M is 2pi-periodic and odd
    M = jnp.linspace(0.0, jnp.pi, 100)
    e = 0.7
    E1 = kepler_solver(M, jnp.full_like(M, e))
    E2 = kepler_solver(-M, jnp.full_like(M, e))
    np.testing.assert_allclose(np.asarray(E1), -np.asarray(E2), atol=1e-13)
    E3 = kepler_solver(M + 2 * jnp.pi, jnp.full_like(M, e))
    np.testing.assert_allclose(np.asarray(E3 - 2 * jnp.pi), np.asarray(E1), atol=1e-12)


def test_kepler_gradients_vs_finite_difference():
    def f(M, e):
        return kepler_solver(M, e)

    gM = jax.grad(f, argnums=0)
    ge = jax.grad(f, argnums=1)
    for M0, e0 in [(0.3, 0.2), (2.5, 0.9), (-1.0, 0.5), (6.0, 0.99)]:
        h = 1e-7
        dM_fd = (f(M0 + h, e0) - f(M0 - h, e0)) / (2 * h)
        de_fd = (f(M0, e0 + h) - f(M0, e0 - h)) / (2 * h)
        assert abs(float(gM(M0, e0)) - float(dM_fd)) < 1e-6
        assert abs(float(ge(M0, e0)) - float(de_fd)) < 1e-6


def test_kepler_jit_vmap():
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    M = jax.random.uniform(keys[0], (64, 32), minval=-10, maxval=10)
    e = jax.random.uniform(keys[1], (64, 32), minval=0, maxval=0.999)
    E = jax.jit(jax.vmap(kepler_solver))(M, e)
    resid = E - e * jnp.sin(E) - M
    assert float(jnp.max(jnp.abs(resid))) < 1e-11


def test_hyperbolic_solver():
    M = jnp.linspace(-10, 10, 101)
    for e in [1.1, 2.0, 5.0]:
        H = kepler_solver_hyperbolic(M, jnp.full_like(M, e))
        resid = e * jnp.sinh(H) - H - M
        assert float(jnp.max(jnp.abs(resid))) < 1e-10


def test_pallas_kepler_matches_jnp():
    """The Pallas kernel (interpret mode on CPU) agrees with the jnp
    solver; on-chip measurements are recorded in the module docstring
    (jnp fusion wins: 5.2e9 vs 2.7e9 solves/s, so jnp stays default)."""
    from octofitter_tpu.orbits.pallas_kepler import kepler_solver_pallas

    rng = np.random.default_rng(0)
    M = jnp.asarray(rng.uniform(-10, 10, 1000))
    e = jnp.asarray(rng.uniform(0.0, 0.95, 1000))
    E_ref = kepler_solver(M, e)
    E_pl = kepler_solver_pallas(M, e)
    np.testing.assert_allclose(np.asarray(E_pl), np.asarray(E_ref),
                               atol=5e-7, rtol=0)
    resid = np.asarray(E_pl - e * jnp.sin(E_pl) - M)
    assert np.abs(resid).max() < 1e-9 or np.abs(resid).max() < 5e-6
