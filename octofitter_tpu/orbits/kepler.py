"""Kepler-equation solvers.

TPU-native replacement for the reference's hot kernel: the Markley (1995)
non-iterative elliptic solver used by PlanetOrbits.jl
(`/root/reference/docs/src/kepler.md:15-22`) plus a Newton solver for
hyperbolic orbits. The reference solves ~47 ns/call scalar on CPU; here
the solver is a pure branch-free jnp function that vmaps over
(chains x planets x epochs) and fuses into the surrounding likelihood
under XLA, with gradients supplied by *implicit differentiation* via
``jax.custom_jvp`` instead of differentiating through the solver body.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_PI = math.pi
_PI2 = math.pi * math.pi


def _markley(M, e):
    """Markley (1995) starter + 5th-order refinement for M in [0, pi]."""
    one = jnp.ones_like(M)
    alpha = (3 * _PI2 + 1.6 * _PI * (_PI - M) / (1 + e)) / (_PI2 - 6)
    d = 3 * (1 - e) + alpha * e
    q = 2 * alpha * d * (1 - e) - M * M
    r = 3 * alpha * d * (d - 1 + e) * M + M * M * M
    w = jnp.cbrt(jnp.abs(r) + jnp.sqrt(q * q * q + r * r)) ** 2
    E1 = (2 * r * w / (w * w + w * q + q * q) + M) / d

    sE = jnp.sin(E1)
    cE = jnp.cos(E1)
    f0 = E1 - e * sE - M
    f1 = 1 - e * cE
    f2 = e * sE
    f3 = e * cE
    f4 = -f2
    d3 = -f0 / (f1 - f0 * f2 / (2 * f1))
    d4 = -f0 / (f1 + d3 * f2 / 2 + d3 * d3 * f3 / 6)
    d5 = -f0 / (f1 + d4 * f2 / 2 + d4 * d4 * f3 / 6 + d4 * d4 * d4 * f4 / 24)
    E = E1 + d5
    # One Newton polish: free under fusion, and lifts float32 accuracy
    # close to machine epsilon (important for the TPU f32 fast path).
    E = E - (E - e * jnp.sin(E) - M) / (1 - e * jnp.cos(E))
    return E * one


@jax.custom_jvp
def kepler_solver(M, e):
    """Solve E - e*sin(E) = M for eccentric anomaly E, elliptic case e<1.

    Fully vectorized and branch-free. M may be any real value (internally
    reduced to [-pi, pi]); returns E continuous with M (E - M is periodic).
    """
    M, e = jnp.broadcast_arrays(jnp.asarray(M), jnp.asarray(e))
    # reduce M to [-pi, pi), remember the offset to restore continuity
    Mr = jnp.mod(M + _PI, 2 * _PI) - _PI
    offset = M - Mr
    sgn = jnp.where(Mr < 0, -1.0, 1.0)
    E = sgn * _markley(jnp.abs(Mr), e)
    return E + offset


@kepler_solver.defjvp
def _kepler_solver_jvp(primals, tangents):
    # Implicit differentiation of E - e sinE = M:
    #   dE = (dM + sinE de) / (1 - e cosE)
    M, e = primals
    dM, de = tangents
    E = kepler_solver(M, e)
    denom = 1 - e * jnp.cos(E)
    dE = (dM + jnp.sin(E) * de) / denom
    return E, dE


def _hyperbolic_newton(M, e):
    """Solve e*sinh(H) - H = M by guarded Newton (e > 1)."""
    absM = jnp.abs(M)
    sgn = jnp.where(M < 0, -1.0, 1.0)
    H = jnp.log(2 * absM / e + 1.8)

    def body(_, H):
        f = e * jnp.sinh(H) - H - absM
        fp = e * jnp.cosh(H) - 1
        return H - f / fp

    H = jax.lax.fori_loop(0, 30, body, H)
    return sgn * H


@jax.custom_jvp
def kepler_solver_hyperbolic(M, e):
    """Solve e*sinh(H) - H = M for hyperbolic anomaly H (e > 1)."""
    M, e = jnp.broadcast_arrays(jnp.asarray(M), jnp.asarray(e))
    return _hyperbolic_newton(M, e)


@kepler_solver_hyperbolic.defjvp
def _kepler_hyp_jvp(primals, tangents):
    M, e = primals
    dM, de = tangents
    H = kepler_solver_hyperbolic(M, e)
    denom = e * jnp.cosh(H) - 1
    dH = (dM - jnp.sinh(H) * de) / denom
    return H, dH
