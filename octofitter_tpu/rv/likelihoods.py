"""Radial-velocity likelihoods.

TPU-native equivalent of the `OctofitterRadialVelocity` subpackage
(`/root/reference/OctofitterRadialVelocity/src/rv-absolute.jl`,
`rv-absolute-margin.jl`, `rv-relative.jl`): absolute stellar RV with
offset/jitter/trend/GP, the analytically zero-point-marginalized
variant (Orvara-paper formula), and companion-relative RV.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ..constants import MJUP2MSOL
from ..distributions import LogUniform, Uniform
from ..model.params import Params, hasproperty
from ..model.variables import (
    AbstractObs,
    PlanetObservationContext,
    SystemObservationContext,
    prepare_table,
)
from ..likelihoods.utils import gauss_logpdf, take_epochs
from ..orbits import radvel, semimajoraxis
from .kernels import gp_loglike

_RV_COLS = ("epoch", "rv", "σ_rv")


def _default_rv_variables():
    # reference defaults (`rv-absolute.jl:73-77`)
    return dict(offset=Uniform(-1000, 1000), jitter=LogUniform(0.001, 100))


class _BaseRVObs(AbstractObs):
    def __init__(self, observations, variables, name, trend_function, gaussian_process, gp_method="scan"):
        super().__init__(variables=variables, name=name)
        if isinstance(observations, dict):
            observations = {
                k.replace("sigma_", "σ_") if k.startswith("sigma_") else k: v
                for k, v in observations.items()
            }
        self.table = prepare_table(observations, (_RV_COLS,), type(self).__name__)
        self.trend_function = trend_function
        self.gaussian_process = gaussian_process
        self.gp_method = gp_method
        self.held_out_table = None

    def _trend(self, theta_obs, epochs):
        if self.trend_function is None:
            return jnp.zeros_like(epochs)
        return self.trend_function(theta_obs, epochs)

    def _copy_with_table(self, table):
        new = object.__new__(type(self))
        AbstractObs.__init__(new, variables=None, name=self.name)
        new.var_specs = self.var_specs
        new.table = table
        new.trend_function = self.trend_function
        new.gaussian_process = self.gaussian_process
        new.gp_method = getattr(self, "gp_method", "scan")
        new.held_out_table = None
        return new

    def likeobj_from_epoch_subset(self, idx):
        """Keep rows `idx`; the complement is retained as held-out data
        for GP cross-validation (`rv-absolute.jl:115-130`)."""
        mask = np.zeros(len(self.table["epoch"]), bool)
        mask[idx] = True
        new = self._copy_with_table({k: v[mask] for k, v in self.table.items()})
        new.held_out_table = {k: v[~mask] for k, v in self.table.items()}
        return new


class StarAbsoluteRVObs(_BaseRVObs):
    """Absolute RV of the host star (`rv-absolute.jl:56-318`).

    Observation variables: `offset` (zero point, m/s), `jitter` (m/s);
    optional trend_function(theta_obs, epochs) and
    gaussian_process(theta_obs) -> Kernel.
    """

    def __init__(self, observations, variables=None, *, name,
                 trend_function=None, gaussian_process=None,
                 gp_method="scan"):
        if variables is None:
            variables = _default_rv_variables()
        super().__init__(observations, variables, name, trend_function,
                         gaussian_process, gp_method)

    def simulate(self, ctx: SystemObservationContext):
        epochs = jnp.asarray(self.table["epoch"])
        theta_obs = ctx.theta_obs
        offset = theta_obs.get("offset", jnp.asarray(0.0)) if isinstance(theta_obs, Params) else jnp.asarray(0.0)
        rv = offset + self._trend(theta_obs, epochs)
        n = len(self.table["epoch"])
        planets = ctx.theta_system.planets
        for j, pname in enumerate(planets.keys()):
            theta_p = planets[pname]
            if not hasproperty(theta_p, "mass"):
                continue
            sol = take_epochs(ctx.solutions[j], ctx.epoch_start, n)
            rv = rv + radvel(sol, theta_p.mass * MJUP2MSOL)
        return {"rv_model": rv, "epochs": self.table["epoch"]}

    def ln_like(self, ctx: SystemObservationContext):
        theta_obs = ctx.theta_obs
        jitter = theta_obs.get("jitter", jnp.asarray(0.0)) if isinstance(theta_obs, Params) else jnp.asarray(0.0)
        rv_model = self.simulate(ctx)["rv_model"]
        resid = jnp.asarray(self.table["rv"]) - rv_model
        var = jnp.asarray(self.table["σ_rv"]) ** 2 + jitter**2
        if self.gaussian_process is None:
            if self.held_out_table is None:
                return jnp.sum(gauss_logpdf(resid, jnp.sqrt(var)))
            # non-GP CV path: held-out points are independent
            ll = jnp.sum(gauss_logpdf(resid, jnp.sqrt(var)))
            return ll
        kernel = self.gaussian_process(theta_obs)
        epochs = jnp.asarray(self.table["epoch"])
        if self.held_out_table is None:
            return gp_loglike(kernel, epochs, resid, var,
                              method=getattr(self, "gp_method", "scan"))
        # cross-validation: condition on table, evaluate held-out
        # (`rv-absolute.jl:253-304`)
        from .kernels import gp_predict
        from ..orbits import orbitsolve

        ho = self.held_out_table
        ho_epochs = jnp.asarray(ho["epoch"])
        offset = theta_obs.get("offset", jnp.asarray(0.0)) if isinstance(theta_obs, Params) else jnp.asarray(0.0)
        rv_ho = offset + self._trend(theta_obs, ho_epochs)
        planets = ctx.theta_system.planets
        for j, pname in enumerate(planets.keys()):
            theta_p = planets[pname]
            if not hasproperty(theta_p, "mass"):
                continue
            sol = orbitsolve(ctx.orbits[j], ho_epochs)
            rv_ho = rv_ho + radvel(sol, theta_p.mass * MJUP2MSOL)
        resid_ho = jnp.asarray(ho["rv"]) - rv_ho
        jitter2 = jitter**2
        var_ho = jnp.asarray(ho["σ_rv"]) ** 2 + jitter2
        pred, pvar = gp_predict(kernel, epochs, resid, var, ho_epochs)
        return jnp.sum(gauss_logpdf(resid_ho - pred, jnp.sqrt(pvar + var_ho)))

    def pointwise_ln_like(self, ctx: SystemObservationContext):
        """Per-epoch log-likelihood for CV; the GP case uses the
        per-point marginal N(0, K_ii + var_i)."""
        theta_obs = ctx.theta_obs
        jitter = theta_obs.get("jitter", jnp.asarray(0.0)) if isinstance(theta_obs, Params) else jnp.asarray(0.0)
        rv_model = self.simulate(ctx)["rv_model"]
        resid = jnp.asarray(self.table["rv"]) - rv_model
        var = jnp.asarray(self.table["σ_rv"]) ** 2 + jitter**2
        if self.gaussian_process is not None:
            kernel = self.gaussian_process(theta_obs)
            t = jnp.asarray(self.table["epoch"])
            var = var + jnp.diagonal(kernel.matrix(t, t))
        return gauss_logpdf(resid, jnp.sqrt(var))

    def generate_from_params(self, ctx, rng, add_noise=False):
        rv_model = np.asarray(self.simulate(ctx)["rv_model"], dtype=np.float64)
        theta_obs = ctx.theta_obs
        jitter = float(theta_obs.get("jitter", 0.0)) if isinstance(theta_obs, Params) else 0.0
        table = {k: np.array(v) for k, v in self.table.items()}
        rv = rv_model
        if add_noise:
            rv = rv + rng.standard_normal(rv.shape) * np.hypot(table["σ_rv"], jitter)
        table["rv"] = rv
        return self._copy_with_table(table)


class MarginalizedStarAbsoluteRVObs(_BaseRVObs):
    """Absolute RV with the zero point marginalized analytically
    (Orvara-paper formula; `rv-absolute-margin.jl:41-216`).

    Accumulate A = sum 1/var, B = -2 sum r/var, C = sum r^2/var; then
    ll = sum(-log(2 pi var)) - (-B^2/(4A) + C + log A).
    """

    def __init__(self, observations, variables=None, *, name, trend_function=None):
        if variables is None:
            variables = dict(jitter=LogUniform(0.001, 100))
        super().__init__(observations, variables, name, trend_function, None)

    def simulate(self, ctx: SystemObservationContext):
        epochs = jnp.asarray(self.table["epoch"])
        theta_obs = ctx.theta_obs
        rv = self._trend(theta_obs, epochs)
        n = len(self.table["epoch"])
        planets = ctx.theta_system.planets
        for j, pname in enumerate(planets.keys()):
            theta_p = planets[pname]
            if not hasproperty(theta_p, "mass"):
                continue
            sol = take_epochs(ctx.solutions[j], ctx.epoch_start, n)
            rv = rv + radvel(sol, theta_p.mass * MJUP2MSOL)
        return {"rv_model": rv, "epochs": self.table["epoch"]}

    def ln_like(self, ctx: SystemObservationContext):
        theta_obs = ctx.theta_obs
        jitter = theta_obs.get("jitter", jnp.asarray(0.0)) if isinstance(theta_obs, Params) else jnp.asarray(0.0)
        rv_model = self.simulate(ctx)["rv_model"]
        resid = jnp.asarray(self.table["rv"]) - rv_model
        var = jnp.asarray(self.table["σ_rv"]) ** 2 + jitter**2
        A = jnp.sum(1.0 / var)
        B = -2.0 * jnp.sum(resid / var)
        C = jnp.sum(resid**2 / var)
        ll = -jnp.sum(jnp.log(2 * math.pi * var))
        ll = ll - (-(B**2) / (4 * A) + C + jnp.log(A))
        return ll

    def pointwise_ln_like(self, ctx: SystemObservationContext):
        # single-row marginalized formula: a lone point with a free
        # zero-point carries no information beyond the constant
        n = len(self.table["epoch"])
        return jnp.full((n,), -math.log(2 * math.pi))

    def generate_from_params(self, ctx, rng, add_noise=False):
        rv_model = np.asarray(self.simulate(ctx)["rv_model"], dtype=np.float64)
        theta_obs = ctx.theta_obs
        jitter = float(theta_obs.get("jitter", 0.0)) if isinstance(theta_obs, Params) else 0.0
        table = {k: np.array(v) for k, v in self.table.items()}
        rv = rv_model
        if add_noise:
            rv = rv + rng.standard_normal(rv.shape) * np.hypot(table["σ_rv"], jitter)
        table["rv"] = rv
        return self._copy_with_table(table)


class PlanetRelativeRVObs(_BaseRVObs):
    """RV of a companion relative to the host (`rv-relative.jl:55-325`),
    with perturbations from interior massive companions."""

    def __init__(self, observations, variables=None, *, name,
                 trend_function=None, gaussian_process=None):
        if variables is None:
            variables = dict(jitter=LogUniform(0.001, 100))
        super().__init__(observations, variables, name, trend_function, gaussian_process)

    def simulate(self, ctx: PlanetObservationContext):
        epochs = jnp.asarray(self.table["epoch"])
        n = len(self.table["epoch"])
        theta_obs = ctx.theta_obs
        offset = theta_obs.get("offset", jnp.asarray(0.0)) if isinstance(theta_obs, Params) else jnp.asarray(0.0)
        rv = offset + self._trend(theta_obs, epochs)
        sol = take_epochs(ctx.solutions[ctx.i_planet], ctx.epoch_start, n)
        rv = rv + radvel(sol)
        this_orbit = ctx.orbits[ctx.i_planet]
        a_this = semimajoraxis(this_orbit)
        planets = ctx.theta_system.planets
        for j, pname in enumerate(planets.keys()):
            theta_p = planets[pname]
            if not hasproperty(theta_p, "mass") or j == ctx.i_planet:
                continue
            sol_o = take_epochs(ctx.solutions[j], ctx.epoch_start, n)
            w = jnp.where(semimajoraxis(ctx.orbits[j]) < a_this, 1.0, 0.0)
            rv = rv + w * radvel(sol_o, theta_p.mass * MJUP2MSOL)
        return {"rv_model": rv, "epochs": self.table["epoch"]}

    def ln_like(self, ctx: PlanetObservationContext):
        theta_obs = ctx.theta_obs
        jitter = theta_obs.get("jitter", jnp.asarray(0.0)) if isinstance(theta_obs, Params) else jnp.asarray(0.0)
        rv_model = self.simulate(ctx)["rv_model"]
        resid = jnp.asarray(self.table["rv"]) - rv_model
        var = jnp.asarray(self.table["σ_rv"]) ** 2 + jitter**2
        if self.gaussian_process is None:
            return jnp.sum(gauss_logpdf(resid, jnp.sqrt(var)))
        kernel = self.gaussian_process(theta_obs)
        return gp_loglike(kernel, jnp.asarray(self.table["epoch"]), resid, var)

    def pointwise_ln_like(self, ctx: PlanetObservationContext):
        theta_obs = ctx.theta_obs
        jitter = theta_obs.get("jitter", jnp.asarray(0.0)) if isinstance(theta_obs, Params) else jnp.asarray(0.0)
        rv_model = self.simulate(ctx)["rv_model"]
        resid = jnp.asarray(self.table["rv"]) - rv_model
        var = jnp.asarray(self.table["σ_rv"]) ** 2 + jitter**2
        if self.gaussian_process is not None:
            kernel = self.gaussian_process(theta_obs)
            t = jnp.asarray(self.table["epoch"])
            var = var + jnp.diagonal(kernel.matrix(t, t))
        return gauss_logpdf(resid, jnp.sqrt(var))

    def generate_from_params(self, ctx, rng, add_noise=False):
        rv_model = np.asarray(self.simulate(ctx)["rv_model"], dtype=np.float64)
        theta_obs = ctx.theta_obs
        jitter = float(theta_obs.get("jitter", 0.0)) if isinstance(theta_obs, Params) else 0.0
        table = {k: np.array(v) for k, v in self.table.items()}
        rv = rv_model
        if add_noise:
            rv = rv + rng.standard_normal(rv.shape) * np.hypot(table["σ_rv"], jitter)
        table["rv"] = rv
        return self._copy_with_table(table)


StarAbsoluteRVLikelihood = StarAbsoluteRVObs
MarginalizedStarAbsoluteRVLikelihood = MarginalizedStarAbsoluteRVObs
# reference also exports this shorter alias (OctofitterRadialVelocity.jl)
StarAbsoluteRVMarginLikelihood = MarginalizedStarAbsoluteRVObs
PlanetRelativeRVLikelihood = PlanetRelativeRVObs
