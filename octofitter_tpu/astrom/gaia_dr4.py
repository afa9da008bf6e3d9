"""Gaia DR4 epoch astrometry (IAD) likelihood.

TPU-native equivalent of `/root/reference/src/likelihoods/gaia-dr4.jl`
(`GaiaDR4AstromObs`): along-scan centroid residuals modelled as the
scan-projected (position + proper motion | AbsoluteVisual-propagated)
offsets plus planet perturbations plus the parallax term, with an
`astrometric_jitter` noise variable and outlier-flag masking. The
`primary_star_perturbation` mode analytically detrends the linear
(mean + slope) part of the perturbation with precomputed O(N)
coefficients (`gaia-dr4.jl:58-66,207-235`).

All per-epoch loops are vectorized; the detrend is two fused
reductions.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ..constants import JULIAN_YEAR_DAYS, MJUP2MSOL, jd2mjd
from ..likelihoods.utils import gauss_logpdf, take_epochs
from ..model.params import Params, hasproperty
from ..model.variables import (
    AbstractObs,
    SystemObservationContext,
    prepare_table,
)
from ..orbits import AbsoluteVisualOrbit, decoff, raoff
from .ephemeris import geocentre_position_query

_REQ = ("centroid_pos_al", "centroid_pos_error_al", "scan_pos_angle", "parallax_factor_al")


class GaiaDR4AstromObs(AbstractObs):
    """Gaia DR4 IAD likelihood.

    Required columns: `centroid_pos_al`, `centroid_pos_error_al` [mas],
    `scan_pos_angle` [rad], `parallax_factor_al`, plus `epoch` (MJD) or
    `obs_time_tcb` (JD). Optional `outlier_flag`.

    Observation variables: `astrometric_jitter` (mas); in non-absolute
    mode also `ra_offset_mas`, `dec_offset_mas`, `pmra`, `pmdec`,
    `ref_epoch`.
    """

    def __init__(
        self,
        observations_table,
        *,
        gaia_id=0,
        gaia_sol=None,
        variables=None,
        name="GaiaDR4",
        primary_star_perturbation=False,
        earth_table=None,
        observer="gaia",
    ):
        super().__init__(variables=variables, name=name)
        table = {k: np.atleast_1d(np.asarray(v, dtype=np.float64))
                 for k, v in dict(observations_table).items()}
        if "epoch" not in table and "obs_time_tcb" in table:
            table["epoch"] = jd2mjd(table["obs_time_tcb"])
        missing = [c for c in _REQ if c not in table]
        if missing:
            raise ValueError(f"GaiaDR4AstromObs missing columns {missing}")
        order = np.argsort(table["epoch"], kind="stable")
        table = {k: v[order] for k, v in table.items()}
        pos = geocentre_position_query(table["epoch"], earth_table,
                               observer=observer)
        table["x"], table["y"], table["z"] = pos["x"], pos["y"], pos["z"]
        self.table = table
        self.gaia_id = gaia_id
        self.gaia_sol = dict(gaia_sol or {})
        self.primary_star_perturbation = bool(primary_star_perturbation)

        epochs = table["epoch"]
        mean_epoch = epochs.mean()
        self.detrend_dt = (epochs - mean_epoch) / JULIAN_YEAR_DAYS
        self.detrend_inv_N = 1.0 / len(epochs)
        self.detrend_inv_sum_dt2 = 1.0 / np.sum(self.detrend_dt**2)

    # ------------------------------------------------------------------
    def simulate(self, ctx: SystemObservationContext):
        theta = ctx.theta_system
        theta_obs = ctx.theta_obs
        n = len(self.table["epoch"])
        epochs = jnp.asarray(self.table["epoch"])
        pnames = list(theta.planets.keys())

        absolute = len(ctx.orbits) > 0 and isinstance(
            ctx.orbits[0], AbsoluteVisualOrbit
        )
        if absolute:
            sol0 = take_epochs(ctx.solutions[0], ctx.epoch_start, n)
            comp = sol0.compensated
            deg2mas = 60.0 * 60.0 * 1000.0
            ra_ref = self.gaia_sol.get("ra", float(np.asarray(0.0)))
            dec_ref = self.gaia_sol.get("dec", float(np.asarray(0.0)))
            ra_off = (comp.ra2 - ra_ref) * deg2mas * jnp.cos(jnp.deg2rad(comp.dec2))
            dec_off = (comp.dec2 - dec_ref) * deg2mas
        else:
            # linear barycentric model from observation variables
            # (`gaia-dr4.jl:183-187`)
            ra0 = theta_obs.get("ra_offset_mas", jnp.asarray(0.0)) if isinstance(theta_obs, Params) else jnp.asarray(0.0)
            dec0 = theta_obs.get("dec_offset_mas", jnp.asarray(0.0)) if isinstance(theta_obs, Params) else jnp.asarray(0.0)
            pmra = theta_obs.get("pmra", theta.get("pmra", jnp.asarray(0.0))) if isinstance(theta_obs, Params) else theta.get("pmra", jnp.asarray(0.0))
            pmdec = theta_obs.get("pmdec", theta.get("pmdec", jnp.asarray(0.0))) if isinstance(theta_obs, Params) else theta.get("pmdec", jnp.asarray(0.0))
            ref_epoch = theta_obs.get("ref_epoch", jnp.asarray(57388.5)) if isinstance(theta_obs, Params) else jnp.asarray(57388.5)
            dt_yr = (epochs - ref_epoch) / JULIAN_YEAR_DAYS
            ra_off = ra0 + pmra * dt_yr
            dec_off = dec0 + pmdec * dt_yr

        # planet perturbations (host reflex)
        pert_ra = jnp.zeros(n)
        pert_dec = jnp.zeros(n)
        for i, pname in enumerate(pnames):
            theta_p = theta.planets[pname]
            if not hasproperty(theta_p, "mass"):
                continue
            m = theta_p.mass * MJUP2MSOL
            sol = take_epochs(ctx.solutions[i], ctx.epoch_start, n)
            pert_ra = pert_ra + raoff(sol, m)
            pert_dec = pert_dec + decoff(sol, m)

        if self.primary_star_perturbation:
            # remove best-fit mean + slope (`gaia-dr4.jl:207-235`)
            dt = jnp.asarray(self.detrend_dt)
            mean_ra = jnp.sum(pert_ra) * self.detrend_inv_N
            slope_ra = jnp.sum(dt * pert_ra) * self.detrend_inv_sum_dt2
            mean_dec = jnp.sum(pert_dec) * self.detrend_inv_N
            slope_dec = jnp.sum(dt * pert_dec) * self.detrend_inv_sum_dt2
            pert_ra = pert_ra - mean_ra - slope_ra * dt
            pert_dec = pert_dec - mean_dec - slope_dec * dt

        ra_off = ra_off + pert_ra
        dec_off = dec_off + pert_dec

        # project onto along-scan + parallax (`gaia-dr4.jl:248-254`)
        psi = jnp.asarray(self.table["scan_pos_angle"])
        along = (
            ra_off * jnp.sin(psi)
            + dec_off * jnp.cos(psi)
            + theta.plx * jnp.asarray(self.table["parallax_factor_al"])
        )
        return {
            "along_scan_model": along,
            "ra_offset": ra_off,
            "dec_offset": dec_off,
        }

    def pointwise_ln_like(self, ctx):
        theta_obs = ctx.theta_obs
        jit = theta_obs.get("astrometric_jitter", jnp.asarray(0.0)) if isinstance(theta_obs, Params) else jnp.asarray(0.0)
        sim = self.simulate(ctx)
        sigma = jnp.sqrt(
            jit**2 + jnp.asarray(self.table["centroid_pos_error_al"]) ** 2
        )
        lp = gauss_logpdf(
            sim["along_scan_model"] - jnp.asarray(self.table["centroid_pos_al"]),
            sigma,
        )
        if "outlier_flag" in self.table:
            keep = jnp.asarray(self.table["outlier_flag"] <= 0)
            lp = jnp.where(keep, lp, 0.0)
        return lp

    def ln_like(self, ctx):
        return jnp.sum(self.pointwise_ln_like(ctx))

    def generate_from_params(self, ctx, rng, add_noise=False):
        sim = self.simulate(ctx)
        along = np.asarray(sim["along_scan_model"], dtype=np.float64)
        table = {k: np.array(v) for k, v in self.table.items()}
        if add_noise:
            along = along + rng.standard_normal(along.shape) * table["centroid_pos_error_al"]
        table["centroid_pos_al"] = along
        new = object.__new__(type(self))
        AbstractObs.__init__(new, variables=None, name=self.name)
        new.var_specs = self.var_specs
        new.table = table
        new.gaia_id = self.gaia_id
        new.gaia_sol = self.gaia_sol
        new.primary_star_perturbation = self.primary_star_perturbation
        new.detrend_dt = self.detrend_dt
        new.detrend_inv_N = self.detrend_inv_N
        new.detrend_inv_sum_dt2 = self.detrend_inv_sum_dt2
        return new

    def likeobj_from_epoch_subset(self, idx):
        import copy

        new = copy.copy(self)
        new.table = {k: np.asarray(v)[idx] for k, v in self.table.items()}
        epochs = new.table["epoch"]
        mean_epoch = epochs.mean()
        new.detrend_dt = (epochs - mean_epoch) / JULIAN_YEAR_DAYS
        new.detrend_inv_N = 1.0 / len(epochs)
        new.detrend_inv_sum_dt2 = 1.0 / np.sum(new.detrend_dt**2)
        return new


GaiaDR4Astrom = GaiaDR4AstromObs
