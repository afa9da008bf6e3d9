"""Shared vectorized likelihood helpers."""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp

from ..orbits.elements import OrbitSolution

_LOG_2PI = math.log(2 * math.pi)


def gauss2d_logpdf(r1, r2, sigma1, sigma2, cor):
    """Vectorized log-density of correlated 2-vector residuals.

    Equivalent of the reference's per-epoch `MvNormal` 2x2 blocks
    (`relative-astrometry.jl:74-90,219-248`), but closed-form and fused.
    """
    one_m_c2 = 1 - cor * cor
    z = (
        (r1 / sigma1) ** 2
        - 2 * cor * r1 * r2 / (sigma1 * sigma2)
        + (r2 / sigma2) ** 2
    )
    logdet = 2 * jnp.log(sigma1) + 2 * jnp.log(sigma2) + jnp.log(one_m_c2)
    return -_LOG_2PI - 0.5 * logdet - 0.5 * z / one_m_c2


def gauss_logpdf(resid, sigma):
    """Vectorized univariate normal log-density of residuals."""
    return -0.5 * (resid / sigma) ** 2 - jnp.log(sigma) - 0.5 * _LOG_2PI


def take_epochs(sol: OrbitSolution, start: int, n: int) -> OrbitSolution:
    """Slice the epoch axis of a batched OrbitSolution (static indices).

    Replaces the reference's per-likelihood views into the pre-solved
    solutions array (`system.jl:93-107`).
    """
    fields = {
        f.name: getattr(sol, f.name)
        for f in dataclasses.fields(sol)
    }
    elem = fields.pop("elem")
    comp = fields.pop("compensated")
    sliced = {k: v[..., start : start + n] for k, v in fields.items()}
    if comp is not None:
        comp = type(comp)(
            **{
                f.name: getattr(comp, f.name)[..., start : start + n]
                for f in dataclasses.fields(comp)
            }
        )
    return OrbitSolution(elem=elem, compensated=comp, **sliced)
