"""Observable-based and stability pseudo-priors.

TPU-native equivalents of
`/root/reference/src/likelihoods/prior-observable.jl`,
`prior-non-crossing.jl`, and `prior-planet-order.jl`. All are
branch-free: the reference's data-dependent sorting of orbits by
semi-major axis becomes `jnp.argsort` gathers, and hard cutoffs are
`jnp.where(-inf)` masks.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..constants import JULIAN_YEAR_DAYS, MJUP2MSOL
from ..model.variables import (
    AbstractObs,
    PlanetObservationContext,
    SystemObservationContext,
)
from ..orbits import (
    apoapsis,
    eccanom,
    eccentricity,
    meananom,
    periapsis,
    period,
    semimajoraxis,
)
from .utils import take_epochs


class ObsPriorAstromONeil2019(AbstractObs):
    """O'Neil 2019 observable-based prior wrapping an astrometry
    likelihood (`prior-observable.jl:56-137`).

    Per epoch the Jacobian term is |3M(e+cosE) + 2(-2+e^2+e cosE) sinE|,
    the total is multiplied by P^(1/3)/sqrt(1-e^2), and 2*log(jac) is
    added. As in the reference, `ln_like` returns the *wrapped*
    likelihood plus the prior correction; attach only this wrapper (not
    the inner likelihood as well) unless you intend both terms.
    """

    def __init__(self, wrapped_like: AbstractObs):
        super().__init__(variables=None, name="obspri_" + wrapped_like.name)
        self.wrapped_like = wrapped_like
        self.var_specs = wrapped_like.var_specs
        self.table = wrapped_like.table

    def _jacobian(self, sol, orbit):
        e = eccentricity(orbit)
        M = meananom(sol)
        E = eccanom(sol)
        jac = jnp.sum(
            jnp.abs(3 * M * (e + jnp.cos(E)) + 2 * (-2 + e**2 + e * jnp.cos(E)) * jnp.sin(E))
        )
        P_years = period(orbit) / JULIAN_YEAR_DAYS
        jac = jac * jnp.cbrt(P_years) / jnp.sqrt(1 - e**2)
        return 2 * jnp.log(jac)

    def ln_like(self, ctx):
        ll = self.wrapped_like.ln_like(ctx)
        n = len(self.table["epoch"])
        if isinstance(ctx, PlanetObservationContext):
            orbit = ctx.orbits[ctx.i_planet]
            sol = take_epochs(ctx.solutions[ctx.i_planet], ctx.epoch_start, n)
            ll = ll + self._jacobian(sol, orbit)
        else:
            for i, orbit in enumerate(ctx.orbits):
                sol = take_epochs(ctx.solutions[i], ctx.epoch_start, n)
                ll = ll + self._jacobian(sol, orbit)
        return ll

    def simulate(self, ctx):
        return self.wrapped_like.simulate(ctx)

    def generate_from_params(self, ctx, rng, add_noise=False):
        return ObsPriorAstromONeil2019(
            self.wrapped_like.generate_from_params(ctx, rng, add_noise=add_noise)
        )

    def likeobj_from_epoch_subset(self, idx):
        return ObsPriorAstromONeil2019(self.wrapped_like.likeobj_from_epoch_subset(idx))


class LimitClosestApproachAUPrior(AbstractObs):
    """Hard/soft repulsion between adjacent orbits
    (`prior-non-crossing.jl:1-38`)."""

    def __init__(self, soft_closest_approach_au=0.0, hard_closest_approach_au=None):
        super().__init__(variables=None, name="LimitClosestApproachAUPrior")
        if hard_closest_approach_au is None:
            hard_closest_approach_au = 0.0
        self.hard = float(hard_closest_approach_au)
        self.soft = float(soft_closest_approach_au)

    @property
    def is_prior(self):
        return True

    def ln_like(self, ctx: SystemObservationContext):
        orbits = ctx.orbits
        if len(orbits) <= 1:
            return jnp.asarray(0.0)
        sma = jnp.stack([semimajoraxis(o) for o in orbits])
        apo = jnp.stack([apoapsis(o) for o in orbits])
        peri = jnp.stack([periapsis(o) for o in orbits])
        order = jnp.argsort(sma)
        apo_s = apo[order]
        peri_s = peri[order]
        closest = peri_s[1:] - apo_s[:-1]
        hard_violate = jnp.any(closest <= self.hard)
        soft_pen = jnp.where(
            closest < self.soft,
            -1.0 / (closest - self.soft) ** 2,
            0.0,
        )
        ll = jnp.sum(soft_pen)
        return jnp.where(hard_violate, -jnp.inf, ll)

    def likeobj_from_epoch_subset(self, idx):
        return self


def NonCrossingPrior():
    """Adjacent orbits may not cross (`prior-non-crossing.jl:6`)."""
    return LimitClosestApproachAUPrior(0.0, 0.0)


class HillStabilityPrior(AbstractObs):
    """Mutual Hill-stability hard cutoff (`prior-non-crossing.jl:43-88`):
    adjacent pairs must satisfy delta_a > 2*sqrt(3)*R_Hill."""

    def __init__(self):
        super().__init__(variables=None, name="HillStabilityPrior")

    @property
    def is_prior(self):
        return True

    def ln_like(self, ctx: SystemObservationContext):
        orbits = ctx.orbits
        theta = ctx.theta_system
        if len(orbits) <= 1:
            return jnp.asarray(0.0)
        pnames = list(theta.planets.keys())
        sma = jnp.stack([semimajoraxis(o) for o in orbits])
        masses = jnp.stack(
            [theta.planets[p].mass * MJUP2MSOL for p in pnames]
        )
        order = jnp.argsort(sma)
        sma_s = sma[order]
        m_s = masses[order]
        delta_a = sma_s[1:] - sma_s[:-1]
        M_star = jnp.maximum(0.0, theta.M - m_s[1:] - m_s[:-1])
        R_H = sma_s[1:] * jnp.cbrt((m_s[1:] + m_s[:-1]) / (3 * M_star))
        violate = jnp.any(delta_a <= 2 * jnp.sqrt(3.0) * R_H)
        return jnp.where(violate, -jnp.inf, 0.0)

    def likeobj_from_epoch_subset(self, idx):
        return self


class PlanetOrderPrior(AbstractObs):
    """Constrain the listed planets to ascending semi-major axis
    (`prior-planet-order.jl:1-33`)."""

    def __init__(self, *planet_names):
        names = [p.name if hasattr(p, "name") else str(p) for p in planet_names]
        super().__init__(
            variables=None, name="PlanetOrderPrior_" + "_".join(names)
        )
        self.planet_names = names

    @property
    def is_prior(self):
        return True

    def ln_like(self, ctx: SystemObservationContext):
        theta = ctx.theta_system
        pnames = list(theta.planets.keys())
        idxs = [pnames.index(n) for n in self.planet_names]
        sma = jnp.stack([semimajoraxis(ctx.orbits[i]) for i in idxs])
        violate = jnp.any(sma[:-1] >= sma[1:])
        return jnp.where(violate, -jnp.inf, 0.0)

    def likeobj_from_epoch_subset(self, idx):
        return self
