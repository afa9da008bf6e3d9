"""Relative astrometry likelihood.

TPU-native equivalent of the reference's `PlanetRelAstromObs`
(`/root/reference/src/likelihoods/relative-astrometry.jl`): positions of
a companion relative to its host in either (ra, dec) or (sep, pa) form,
with per-point correlated 2x2 Gaussian errors, optional `jitter`,
`platescale`, `northangle` instrument nuisances, and photocentre
perturbation from interior massive companions.

The reference loops epochs with bump-allocated buffers
(`relative-astrometry.jl:166-253`); here the whole epoch axis is one
vectorized computation over the pre-solved solution arrays.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import MJUP2MSOL
from ..model.params import Params, hasproperty
from ..model.variables import (
    AbstractObs,
    PlanetObservationContext,
    prepare_table,
)
from ..orbits import decoff, raoff, semimajoraxis
from .utils import gauss2d_logpdf, take_epochs


_COLS_RADEC = ("epoch", "ra", "dec", "σ_ra", "σ_dec")
_COLS_SEPPA = ("epoch", "pa", "sep", "σ_pa", "σ_sep")


class PlanetRelAstromObs(AbstractObs):
    """Relative astrometry observations (mas / radians, epochs in MJD)."""

    def __init__(self, observations, variables=None, name="relastrom"):
        super().__init__(variables=variables, name=name)
        # accept ascii sigma column aliases
        if isinstance(observations, dict):
            observations = {
                k.replace("sigma_", "σ_") if k.startswith("sigma_") else k: v
                for k, v in observations.items()
            }
        self.table = prepare_table(
            observations, (_COLS_RADEC, _COLS_SEPPA), type(self).__name__
        )
        self.seppa = "pa" in self.table and "sep" in self.table
        epochs = self.table["epoch"]
        if np.any(epochs >= 69807) or np.any(epochs <= 33282):
            import warnings

            warnings.warn(
                "Epochs fell outside the year 1950-2050 range; expected "
                "format is MJD. Double check your input data."
            )
        if "cor" in self.table and np.any(np.abs(self.table["cor"]) > 1 - 1e-5):
            raise ValueError("Correlation values may not be well-specified")

    # ------------------------------------------------------------------
    def simulate(self, ctx: PlanetObservationContext):
        """Model (ra, dec) offsets at each epoch, including interior-
        companion photocentre perturbation
        (`relative-astrometry.jl:104-142`)."""
        n = len(self.table["epoch"])
        sol = take_epochs(ctx.solutions[ctx.i_planet], ctx.epoch_start, n)
        ra_model = raoff(sol)
        dec_model = decoff(sol)

        this_orbit = ctx.orbits[ctx.i_planet]
        a_this = semimajoraxis(this_orbit)
        planets = ctx.theta_system.planets
        for j, pname in enumerate(planets.keys()):
            theta_other = planets[pname]
            if not hasproperty(theta_other, "mass"):
                continue
            other_orbit = ctx.orbits[j]
            sol_other = take_epochs(ctx.solutions[j], ctx.epoch_start, n)
            mass_other = theta_other.mass * MJUP2MSOL
            # Only interior planets perturb the host photocentre. The
            # reference branches on a data-dependent comparison
            # (`relative-astrometry.jl:120`); on TPU this is a weight
            # mask so shapes stay static.
            is_inner = (semimajoraxis(other_orbit) < a_this) & (j != ctx.i_planet)
            w = jnp.where(is_inner, 1.0, 0.0)
            ra_model = ra_model - w * raoff(sol_other, mass_other)
            dec_model = dec_model - w * decoff(sol_other, mass_other)
        return {"ra_model": ra_model, "dec_model": dec_model, "epochs": self.table["epoch"]}

    # ------------------------------------------------------------------
    def pointwise_ln_like(self, ctx: PlanetObservationContext):
        theta_obs = ctx.theta_obs
        dtype = jnp.result_type(float)
        jitter = theta_obs.get("jitter", jnp.asarray(0.0, dtype)) if isinstance(theta_obs, Params) else jnp.asarray(0.0, dtype)
        platescale = theta_obs.get("platescale", jnp.asarray(1.0, dtype)) if isinstance(theta_obs, Params) else jnp.asarray(1.0, dtype)
        northangle = theta_obs.get("northangle", jnp.asarray(0.0, dtype)) if isinstance(theta_obs, Params) else jnp.asarray(0.0, dtype)

        sim = self.simulate(ctx)
        ra_model, dec_model = sim["ra_model"], sim["dec_model"]

        if self.seppa:
            sigma1 = jnp.asarray(self.table["σ_pa"])
            sigma2 = jnp.asarray(self.table["σ_sep"])
            rho = jnp.hypot(ra_model, dec_model)
            pa = jnp.arctan2(ra_model, dec_model)
            # northangle sign convention: corrected PA = data PA + northangle
            # (`relative-astrometry.jl:195-201`, regression test for #141)
            pa_dat = jnp.asarray(self.table["pa"]) + northangle
            pa_diff = jnp.mod(pa_dat - pa + math.pi, 2 * math.pi) - math.pi
            pa_diff = jnp.where(pa_diff < -math.pi, pa_diff + 2 * math.pi, pa_diff)
            resid1 = pa_diff
            resid2 = jnp.asarray(self.table["sep"]) * platescale - rho
        else:
            sigma1 = jnp.asarray(self.table["σ_ra"])
            sigma2 = jnp.asarray(self.table["σ_dec"])
            # data angle here runs East through North (opposite to PA), so
            # northangle is subtracted (`relative-astrometry.jl:205-215`)
            pa_dat = jnp.arctan2(jnp.asarray(self.table["dec"]), jnp.asarray(self.table["ra"])) - northangle
            sep_dat = jnp.hypot(jnp.asarray(self.table["dec"]), jnp.asarray(self.table["ra"])) * platescale
            resid1 = sep_dat * jnp.cos(pa_dat) - ra_model
            resid2 = sep_dat * jnp.sin(pa_dat) - dec_model

        sigma1 = jnp.hypot(sigma1, jitter)
        sigma2 = jnp.hypot(sigma2, jitter)
        cor = jnp.asarray(self.table.get("cor", np.zeros_like(self.table["epoch"])))
        return gauss2d_logpdf(resid1, resid2, sigma1, sigma2, cor)

    def ln_like(self, ctx: PlanetObservationContext):
        return jnp.sum(self.pointwise_ln_like(ctx))

    # ------------------------------------------------------------------
    def generate_from_params(self, ctx, rng, add_noise=False):
        """Synthesize a new observation object from model parameters
        (`relative-astrometry.jl:256-319`)."""
        sim = self.simulate(ctx)
        ra_model = np.asarray(sim["ra_model"], dtype=np.float64)
        dec_model = np.asarray(sim["dec_model"], dtype=np.float64)
        theta_obs = ctx.theta_obs
        platescale = float(theta_obs.get("platescale", 1.0)) if isinstance(theta_obs, Params) else 1.0
        northangle = float(theta_obs.get("northangle", 0.0)) if isinstance(theta_obs, Params) else 0.0
        jitter = float(theta_obs.get("jitter", 0.0)) if isinstance(theta_obs, Params) else 0.0

        table = {k: np.array(v) for k, v in self.table.items()}
        if self.seppa:
            sep = np.hypot(ra_model, dec_model) / platescale
            pa = np.arctan2(ra_model, dec_model) - northangle
            if add_noise:
                sep = sep + rng.standard_normal(sep.shape) * table["σ_sep"]
                pa = pa + rng.standard_normal(pa.shape) * table["σ_pa"]
            table["sep"], table["pa"] = sep, pa
        else:
            sep_c = np.hypot(ra_model, dec_model) / platescale
            pa_c = np.arctan2(ra_model, dec_model) - northangle
            ra = sep_c * np.sin(pa_c)
            dec = sep_c * np.cos(pa_c)
            if add_noise:
                ra = ra + rng.standard_normal(ra.shape) * np.hypot(table["σ_ra"], jitter)
                dec = dec + rng.standard_normal(dec.shape) * np.hypot(table["σ_dec"], jitter)
            table["ra"], table["dec"] = ra, dec
        new = object.__new__(type(self))
        AbstractObs.__init__(new, variables=None, name=self.name)
        new.var_specs = self.var_specs
        new.table = table
        new.seppa = self.seppa
        return new

    def likeobj_from_epoch_subset(self, idx):
        new = object.__new__(type(self))
        AbstractObs.__init__(new, variables=None, name=self.name)
        new.var_specs = self.var_specs
        new.table = {k: np.asarray(v)[idx] for k, v in self.table.items()}
        new.seppa = self.seppa
        return new


# Backwards-compat alias, as in the reference (`relative-astrometry.jl:98`)
PlanetRelAstromLikelihood = PlanetRelAstromObs
