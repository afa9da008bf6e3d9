"""Bijective transforms between constrained and unconstrained space.

Equivalent of the Bijectors.jl usage in the reference
(`/root/reference/src/variables.jl:1205-1369`,
`src/logdensitymodel.jl:61-85`): every prior is paired with a transform
to unconstrained space chosen from its support, and the log-density in
unconstrained space includes the log|det J| of the inverse transform
(`logpdf_with_trans` semantics).

Conventions:
  - ``forward`` (link):   constrained x -> unconstrained y
  - ``inverse`` (invlink): unconstrained y -> constrained x
  - ``logabsdet_inverse(y)``: log|dx/dy| evaluated at y, the correction
    added to ``logpdf(x)`` to express the density in y-space.

All methods are pure jnp functions, safe under jit/vmap/grad.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from jax import nn


@dataclasses.dataclass(frozen=True)
class Bijector:
    def forward(self, x):
        raise NotImplementedError

    def inverse(self, y):
        raise NotImplementedError

    def logabsdet_inverse(self, y):
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class Identity(Bijector):
    def forward(self, x):
        return x

    def inverse(self, y):
        return y

    def logabsdet_inverse(self, y):
        return jnp.zeros_like(y)


@dataclasses.dataclass(frozen=True)
class LowerBounded(Bijector):
    """Support (a, inf): y = log(x - a)."""

    lower: float

    def forward(self, x):
        return jnp.log(x - self.lower)

    def inverse(self, y):
        return self.lower + jnp.exp(y)

    def logabsdet_inverse(self, y):
        return y


@dataclasses.dataclass(frozen=True)
class UpperBounded(Bijector):
    """Support (-inf, b): y = log(b - x)."""

    upper: float

    def forward(self, x):
        return jnp.log(self.upper - x)

    def inverse(self, y):
        return self.upper - jnp.exp(y)

    def logabsdet_inverse(self, y):
        return y


@dataclasses.dataclass(frozen=True)
class Interval(Bijector):
    """Support (a, b): y = logit((x - a)/(b - a))."""

    lower: float
    upper: float

    def forward(self, x):
        u = (x - self.lower) / (self.upper - self.lower)
        return jnp.log(u) - jnp.log1p(-u)

    def inverse(self, y):
        return self.lower + (self.upper - self.lower) * nn.sigmoid(y)

    def logabsdet_inverse(self, y):
        # d/dy [a + (b-a) sigmoid(y)] = (b-a) sigmoid(y) sigmoid(-y)
        return (
            jnp.log(self.upper - self.lower)
            + nn.log_sigmoid(y)
            + nn.log_sigmoid(-y)
        )


def from_support(lower: float | None, upper: float | None) -> Bijector:
    """Pick the standard bijector for a distribution's support.

    Mirrors Bijectors.jl's default `bijector(dist)` choice used by the
    reference's link/invlink construction.
    """
    lo_finite = lower is not None and lower != float("-inf")
    hi_finite = upper is not None and upper != float("inf")
    if lo_finite and hi_finite:
        return Interval(float(lower), float(upper))
    if lo_finite:
        return LowerBounded(float(lower))
    if hi_finite:
        return UpperBounded(float(upper))
    return Identity()
