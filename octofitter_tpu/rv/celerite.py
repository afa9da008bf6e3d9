"""Celerite semiseparable Gaussian-process solver, O(N) and differentiable.

TPU-native replacement for the reference's vendored Celerite.jl
(`/root/reference/OctofitterRadialVelocity/src/celerite/` — vendored
because upstream is unmaintained, and explicitly NOT autodiff-capable,
`Celerite.jl:1-8`). Here the celerite Cholesky recursion
(Foreman-Mackey et al. 2017) is a `lax.scan` over epochs: linear time,
fully differentiable through `jax.grad`, and vmappable across chains.

Kernel terms: RealTerm(a, c), ComplexTerm(a, b, c, d), and
SHOTerm(S0, w0, Q) (underdamped Q > 1/2 branch) — k(tau) =
sum_j exp(-c_j tau) (a_j cos(d_j tau) + b_j sin(d_j tau)).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class CeleriteTerm:
    """Base: provides (a, b, c, d) coefficient arrays."""

    def coefficients(self):
        raise NotImplementedError

    def __add__(self, other):
        return CeleriteSum(self, other)

    # dense covariance (for testing / short series)
    def matrix(self, t1, t2):
        a, b, c, d = self.coefficients()
        tau = jnp.abs(t1[:, None] - t2[None, :])
        K = jnp.zeros(tau.shape)
        for j in range(len(a)):
            K = K + jnp.exp(-c[j] * tau) * (
                a[j] * jnp.cos(d[j] * tau) + b[j] * jnp.sin(d[j] * tau)
            )
        return K


@dataclasses.dataclass(frozen=True)
class CeleriteSum(CeleriteTerm):
    t1: CeleriteTerm
    t2: CeleriteTerm

    def coefficients(self):
        a1, b1, c1, d1 = self.t1.coefficients()
        a2, b2, c2, d2 = self.t2.coefficients()
        cat = lambda x, y: jnp.concatenate([jnp.atleast_1d(x), jnp.atleast_1d(y)])
        return cat(a1, a2), cat(b1, b2), cat(c1, c2), cat(d1, d2)


@dataclasses.dataclass(frozen=True)
class RealTerm(CeleriteTerm):
    a: object = 1.0
    c: object = 1.0

    def coefficients(self):
        z = jnp.zeros(1)
        return (
            jnp.atleast_1d(jnp.asarray(self.a)),
            z,
            jnp.atleast_1d(jnp.asarray(self.c)),
            z,
        )


@dataclasses.dataclass(frozen=True)
class ComplexTerm(CeleriteTerm):
    a: object = 1.0
    b: object = 0.0
    c: object = 1.0
    d: object = 1.0

    def coefficients(self):
        return tuple(
            jnp.atleast_1d(jnp.asarray(x)) for x in (self.a, self.b, self.c, self.d)
        )


@dataclasses.dataclass(frozen=True)
class SHOTerm(CeleriteTerm):
    """Stochastically-driven harmonic oscillator, underdamped (Q > 1/2)."""

    S0: object = 1.0
    w0: object = 1.0
    Q: object = 2.0

    def coefficients(self):
        S0 = jnp.asarray(self.S0)
        w0 = jnp.asarray(self.w0)
        Q = jnp.asarray(self.Q)
        eta = jnp.sqrt(jnp.maximum(4 * Q * Q - 1, 1e-12))
        a = S0 * w0 * Q
        b = S0 * w0 * Q / eta
        c = w0 / (2 * Q)
        d = c * eta
        return (
            jnp.atleast_1d(a),
            jnp.atleast_1d(b),
            jnp.atleast_1d(c),
            jnp.atleast_1d(d),
        )


def _celerite_factor_scan(term: CeleriteTerm, t, diag):
    """Return per-point (D, W, U, phi) via the celerite Cholesky scan."""
    a, b, c, d = term.coefficients()
    J = a.shape[0]
    t = jnp.asarray(t)
    n = t.shape[0]

    cd = jnp.cos(d[None, :] * t[:, None])       # (n, J)
    sd = jnp.sin(d[None, :] * t[:, None])
    U = jnp.concatenate([a * cd + b * sd, a * sd - b * cd], axis=1)  # (n, 2J)
    V = jnp.concatenate([cd, sd], axis=1)
    dt = jnp.diff(t, prepend=t[0])
    phi = jnp.exp(-c[None, :] * dt[:, None])
    phi = jnp.concatenate([phi, phi], axis=1)   # (n, 2J)
    A = diag + jnp.sum(a)

    def step(carry, x):
        S_prev, W_prev, D_prev = carry
        U_n, V_n, phi_n, A_n = x
        S = phi_n[:, None] * phi_n[None, :] * (
            S_prev + D_prev * jnp.outer(W_prev, W_prev)
        )
        D = A_n - U_n @ S @ U_n
        W = (V_n - S @ U_n) / D
        return (S, W, D), (D, W)

    S0 = jnp.zeros((2 * J, 2 * J))
    W0 = jnp.zeros(2 * J)
    D0 = jnp.asarray(0.0)
    (_, _, _), (D, W) = jax.lax.scan(
        step, (S0, W0, D0), (U, V, phi, jnp.broadcast_to(A, (n,)))
    )
    return D, W, U, phi


def celerite_loglike(term: CeleriteTerm, t, resid, var):
    """log N(resid | 0, K_celerite(t) + diag(var)) in O(N * J^2)."""
    D, W, U, phi = _celerite_factor_scan(term, t, jnp.asarray(var))
    resid = jnp.asarray(resid)

    def step(carry, x):
        f_prev, z_prev, W_prev = carry
        U_n, W_n, phi_n, y_n = x
        f = phi_n * (f_prev + W_prev * z_prev)
        z = y_n - U_n @ f
        return (f, z, W_n), z

    J2 = U.shape[1]
    (_, _, _), z = jax.lax.scan(
        step,
        (jnp.zeros(J2), jnp.asarray(0.0), jnp.zeros(J2)),
        (U, W, phi, resid),
    )
    n = t.shape[0]
    D_safe = jnp.maximum(D, 1e-300)
    ll = (
        -0.5 * jnp.sum(z * z / D_safe)
        - 0.5 * jnp.sum(jnp.log(D_safe))
        - 0.5 * n * math.log(2 * math.pi)
    )
    # non-PSD proposals (D <= 0) -> -inf, matching the reference's
    # PosDefException catch (`rv-absolute.jl:229-239`)
    return jnp.where(jnp.any(D <= 0), -jnp.inf, ll)
