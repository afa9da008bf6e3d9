"""Gaussian-process kernels for RV noise modelling.

TPU-native equivalent of the reference's AbstractGPs/Celerite usage in
`OctofitterRadialVelocity` (`rv-absolute.jl:199-315`). Kernels are
static-parameter-free callables built per-sample from observation
variables; the GP log-likelihood is a dense Cholesky solve (RV series
are short, so an (N x N) solve is one fused batched op on the MXU —
and unlike the reference's vendored Celerite it is differentiable).
A celerite-style O(N) associative-scan solver can be slotted in for
long series.
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp
import jax.scipy.linalg as jsl


@dataclasses.dataclass(frozen=True)
class Kernel:
    def matrix(self, t1, t2):
        raise NotImplementedError

    def __add__(self, other):
        return SumKernel(self, other)

    def __mul__(self, other):
        return ProductKernel(self, other)


@dataclasses.dataclass(frozen=True)
class SumKernel(Kernel):
    a: Kernel
    b: Kernel

    def matrix(self, t1, t2):
        return self.a.matrix(t1, t2) + self.b.matrix(t1, t2)


@dataclasses.dataclass(frozen=True)
class ProductKernel(Kernel):
    a: Kernel
    b: Kernel

    def matrix(self, t1, t2):
        return self.a.matrix(t1, t2) * self.b.matrix(t1, t2)


@dataclasses.dataclass(frozen=True)
class SqExponentialKernel(Kernel):
    """amp^2 * exp(-dt^2 / (2 len^2))"""

    amplitude: object = 1.0
    lengthscale: object = 1.0

    def matrix(self, t1, t2):
        dt = t1[:, None] - t2[None, :]
        return self.amplitude**2 * jnp.exp(-0.5 * (dt / self.lengthscale) ** 2)


@dataclasses.dataclass(frozen=True)
class Matern32Kernel(Kernel):
    amplitude: object = 1.0
    lengthscale: object = 1.0

    def matrix(self, t1, t2):
        dt = jnp.abs(t1[:, None] - t2[None, :])
        arg = math.sqrt(3.0) * dt / self.lengthscale
        return self.amplitude**2 * (1 + arg) * jnp.exp(-arg)


@dataclasses.dataclass(frozen=True)
class QuasiPeriodicKernel(Kernel):
    """The standard RV activity kernel (e.g. HARPS analyses, reference
    `docs/src/rv-gp.md`):

      eta1^2 exp(-dt^2/(2 eta2^2) - sin^2(pi dt / eta3) / (2 eta4^2))
    """

    eta1: object = 1.0   # amplitude (m/s)
    eta2: object = 1.0   # evolution timescale (days)
    eta3: object = 1.0   # rotation period (days)
    eta4: object = 0.5   # periodic scale

    def matrix(self, t1, t2):
        dt = t1[:, None] - t2[None, :]
        decay = -0.5 * (dt / self.eta2) ** 2
        periodic = -jnp.sin(math.pi * dt / self.eta3) ** 2 / (2 * self.eta4**2)
        return self.eta1**2 * jnp.exp(decay + periodic)


def gp_loglike(kernel, t, resid, var, method="scan"):
    """log N(resid | 0, K(t,t) + diag(var)); branch-free and
    differentiable. Non-PSD proposals yield NaN which the model's
    -Inf gate absorbs (reference catches PosDefException instead,
    `rv-absolute.jl:229-239`).

    Celerite terms dispatch to the O(N) scan solver (or the
    associative-scan parallel Kalman path with method="associative" —
    see `celerite.celerite_loglike_assoc` for the measured tradeoff);
    dense kernels use a Cholesky factorization.
    """
    from .celerite import CeleriteTerm, celerite_loglike

    if isinstance(kernel, CeleriteTerm):
        if method == "associative":
            from .celerite import celerite_loglike_assoc

            return celerite_loglike_assoc(kernel, t, resid, var)
        return celerite_loglike(kernel, t, resid, var)
    K = kernel.matrix(t, t) + jnp.diag(var)
    L = jnp.linalg.cholesky(K)
    alpha = jsl.solve_triangular(L, resid, lower=True)
    n = t.shape[0]
    return (
        -0.5 * jnp.sum(alpha**2)
        - jnp.sum(jnp.log(jnp.diagonal(L)))
        - 0.5 * n * math.log(2 * math.pi)
    )


def gp_predict(kernel: Kernel, t_train, resid_train, var_train, t_test):
    """GP conditional mean and variance at t_test (for held-out CV and
    rvpostplot; reference `rv-absolute.jl:253-304`)."""
    K = kernel.matrix(t_train, t_train) + jnp.diag(var_train)
    L = jnp.linalg.cholesky(K)
    Ks = kernel.matrix(t_test, t_train)
    alpha = jsl.cho_solve((L, True), resid_train)
    mean = Ks @ alpha
    v = jsl.solve_triangular(L, Ks.T, lower=True)
    var = jnp.diagonal(kernel.matrix(t_test, t_test)) - jnp.sum(v**2, axis=0)
    return mean, var
