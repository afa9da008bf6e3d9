"""HGCA likelihood with the full measurement-process (linear-fit) model.

TPU-native equivalent of `/root/reference/src/likelihoods/hgca-linfit.jl`
(`HGCAObs`): simulate per-scan photocentre perturbations over the
Hipparcos IAD scans and the Gaia scanning law, recover the
catalog-equivalent proper-motion offsets by 5-parameter least-squares
fits *of the perturbations*, add them to the (optionally AbsoluteVisual-
propagated) barycentric proper motion, and compare the three HGCA
channels (Hip PM, Gaia PM, Hip-Gaia positional PM) with their
correlated 2x2 uncertainty blocks.

The per-sample LSQ solves are small QR factorizations, differentiable
and vmapped across chains. `missed_transits` marginalization is a
weight mask in the LSQ (zeroed rows), not a shape change — the TPU
analogue of the reference's per-sample table mutation
(`hgca-linfit.jl:308-322`; SURVEY.md "Hard parts").
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import J2000_MJD, JULIAN_YEAR_DAYS, MJUP2MSOL
from ..likelihoods.hgca import _REQUIRED_KEYS, load_hgca
from ..likelihoods.utils import gauss2d_logpdf, take_epochs
from ..model.params import Params, hasproperty
from ..model.variables import AbstractObs, SystemObservationContext
from ..orbits import AbsoluteVisualOrbit, orbitsolve
from .fitting import fit_5param
from .gaia import GaiaCatalogFitObs
from .hipparcos import HipparcosIADObs
from .skypath import skypath_perturbations_linear


def _jyear_to_mjd(jy):
    return (jy - 2000.0) * JULIAN_YEAR_DAYS + J2000_MJD


class HGCAObs(AbstractObs):
    """Full HGCA measurement-process likelihood.

    Parameters:
      hgca: catalog row dict (or catalog= path + gaia_id=)
      hip_like: a HipparcosIADObs (or iad_file= to construct one)
      gaia_like: a GaiaCatalogFitObs (or gaia_sol= + scanlaw= to construct)
      include_iad: include the published IAD residuals in the Hipparcos
        refit (`hgca-linfit.jl:402-406`)
    Observation variable `fluxratio` (array over planets) sets companion
    flux ratios in the photocentre model.
    """

    def __init__(
        self,
        *,
        hgca=None,
        catalog=None,
        gaia_id=None,
        hip_like: HipparcosIADObs | None = None,
        iad_file=None,
        gaia_like: GaiaCatalogFitObs | None = None,
        gaia_sol=None,
        scanlaw=None,
        include_iad=True,
        variables=None,
        name="HGCA",
    ):
        super().__init__(variables=variables, name=name)
        if hgca is None:
            hgca = load_hgca(catalog, gaia_id=gaia_id)
        missing = [k for k in _REQUIRED_KEYS if k not in hgca]
        if missing:
            raise ValueError(f"HGCA row missing keys: {missing}")
        self.hgca = {k: float(np.asarray(v)) for k, v in hgca.items()
                     if np.ndim(v) == 0 or np.size(v) == 1}
        self.hgca.setdefault("nonlinear_dpmra", 0.0)
        self.hgca.setdefault("nonlinear_dpmdec", 0.0)
        self.include_iad = include_iad

        self.epochs_mjd = {
            "ra_hip": _jyear_to_mjd(self.hgca["epoch_ra_hip"]),
            "dec_hip": _jyear_to_mjd(self.hgca["epoch_dec_hip"]),
            "ra_gaia": _jyear_to_mjd(self.hgca["epoch_ra_gaia"]),
            "dec_gaia": _jyear_to_mjd(self.hgca["epoch_dec_gaia"]),
        }

        if hip_like is None:
            if iad_file is None:
                raise ValueError("provide hip_like or iad_file")
            hip_like = HipparcosIADObs(
                iad_file=iad_file,
                ref_epoch_ra=self.epochs_mjd["ra_hip"],
                ref_epoch_dec=self.epochs_mjd["dec_hip"],
            )
        if gaia_like is None:
            if gaia_sol is None or scanlaw is None:
                raise ValueError("provide gaia_like or gaia_sol + scanlaw")
            gaia_like = GaiaCatalogFitObs(
                gaia_sol=gaia_sol,
                scanlaw=scanlaw,
                ref_epoch_ra=self.epochs_mjd["ra_gaia"],
                ref_epoch_dec=self.epochs_mjd["dec_gaia"],
            )
        self.hip_like = hip_like
        self.gaia_like = gaia_like
        # channels included (subset at whole-channel granularity,
        # `hgca-linfit.jl:198`)
        self.kinds = ["ra_hip", "dec_hip", "ra_gaia", "dec_gaia", "ra_hg", "dec_hg"]

        self.n_hip = len(hip_like.table["epoch"])
        self.n_gaia = len(gaia_like.table["epoch"])
        self.table = {
            "epoch": np.concatenate(
                [hip_like.table["epoch"], gaia_like.table["epoch"]]
            )
        }

    @property
    def epochs(self):
        return self.table["epoch"]

    # ------------------------------------------------------------------
    def _fluxratio(self, theta_obs, i):
        if isinstance(theta_obs, Params) and "fluxratio" in theta_obs:
            fr = theta_obs["fluxratio"]
            if jnp.ndim(fr) == 0:
                return fr
            return fr[i]
        return jnp.asarray(0.0)

    def _propagate_astrom(self, orbit, epoch_ra, epoch_dec, theta):
        """(`hgca-linfit.jl:329-347`) propagated (ra, dec, pmra, pmdec)
        at the channel epochs, with differential light-travel apparent
        acceleration for AbsoluteVisual orbits."""
        if isinstance(orbit, AbsoluteVisualOrbit):
            sol_ra = orbitsolve(orbit, jnp.asarray(epoch_ra))
            sol_dec = orbitsolve(orbit, jnp.asarray(epoch_dec))
            cmp_ra = sol_ra.compensated
            cmp_dec = sol_dec.compensated
            t1 = max(epoch_ra, epoch_dec)
            dt = 100.0
            sol = sol_ra if epoch_ra >= epoch_dec else sol_dec
            sol2 = orbitsolve(orbit, jnp.asarray(t1 + dt))
            lt_fac = (sol2.compensated.t_em_days - sol.compensated.t_em_days - dt) / dt
            pmra = cmp_ra.pmra2 + lt_fac * sol.compensated.pmra2
            pmdec = cmp_dec.pmdec2 + lt_fac * sol.compensated.pmdec2
            return cmp_ra.ra2, cmp_dec.dec2, pmra, pmdec
        return jnp.asarray(0.0), jnp.asarray(0.0), theta.pmra, theta.pmdec

    def simulate(self, ctx: SystemObservationContext):
        theta = ctx.theta_system
        theta_obs = ctx.theta_obs
        pnames = list(theta.planets.keys())
        absolute = isinstance(ctx.orbits[0], AbsoluteVisualOrbit)

        # ---- Gaia window -------------------------------------------------
        gt = self.gaia_like.table
        n_g = self.n_gaia
        dalpha_g = jnp.zeros(n_g)
        ddelta_g = jnp.zeros(n_g)
        for i, pname in enumerate(pnames):
            theta_p = theta.planets[pname]
            m = theta_p.mass * MJUP2MSOL if hasproperty(theta_p, "mass") else jnp.asarray(0.0)
            sol = take_epochs(ctx.solutions[i], ctx.epoch_start + self.n_hip, n_g)
            da, dd = skypath_perturbations_linear(
                sol, ctx.orbits[i], m, self._fluxratio(theta_obs, i)
            )
            dalpha_g = dalpha_g + da
            ddelta_g = ddelta_g + dd

        A5_g = jnp.asarray(self.gaia_like.A_prepared_5)
        cphi_g = jnp.asarray(gt["cosphi"])
        sphi_g = jnp.asarray(gt["sinphi"])

        # missed_transits marginalization as a weight mask
        # (`hgca-linfit.jl:308-322`): zeroed rows drop out of the LSQ.
        bad_duplicates = jnp.asarray(False)
        if hasproperty(theta, "missed_transits"):
            mt = jnp.asarray(theta.missed_transits).astype(jnp.int32)
            counts = jnp.zeros(n_g).at[mt].add(1.0)
            bad_duplicates = jnp.any(counts > 1)
            w = jnp.where(counts > 0, 0.0, 1.0)
            A5_g = A5_g * w[:, None]
            dalpha_g = dalpha_g * w
            ddelta_g = ddelta_g * w

        out_g = fit_5param(A5_g, cphi_g, sphi_g, dalpha_g, ddelta_g)
        da_g, dd_g, dpmra_g, dpmdec_g, _ = out_g["parameters"]
        ra_g0, dec_g0, pmra_g0, pmdec_g0 = self._propagate_astrom(
            ctx.orbits[0], self.epochs_mjd["ra_gaia"], self.epochs_mjd["dec_gaia"], theta
        )
        mu_g = jnp.stack([pmra_g0 + dpmra_g, pmdec_g0 + dpmdec_g])

        # ---- Hipparcos window -------------------------------------------
        ht = self.hip_like.table
        n_h = self.n_hip
        dalpha_h = jnp.zeros(n_h)
        ddelta_h = jnp.zeros(n_h)
        for i, pname in enumerate(pnames):
            theta_p = theta.planets[pname]
            m = theta_p.mass * MJUP2MSOL if hasproperty(theta_p, "mass") else jnp.asarray(0.0)
            sol = take_epochs(ctx.solutions[i], ctx.epoch_start, n_h)
            da, dd = skypath_perturbations_linear(
                sol, ctx.orbits[i], m, self._fluxratio(theta_obs, i)
            )
            dalpha_h = dalpha_h + da
            ddelta_h = ddelta_h + dd

        A5_h = jnp.asarray(self.hip_like.A_prepared_5)
        cphi_h = jnp.asarray(ht["cosphi"])
        sphi_h = jnp.asarray(ht["sinphi"])
        if self.include_iad:
            out_h = fit_5param(
                A5_h, cphi_h, sphi_h, dalpha_h, ddelta_h,
                residuals=jnp.asarray(ht["res"]),
                sigma=jnp.asarray(ht["sres"]),
            )
        else:
            out_h = fit_5param(A5_h, cphi_h, sphi_h, dalpha_h, ddelta_h)
        da_h, dd_h, dpmra_h, dpmdec_h, _ = out_h["parameters"]
        ra_h0, dec_h0, pmra_h0, pmdec_h0 = self._propagate_astrom(
            ctx.orbits[0], self.epochs_mjd["ra_hip"], self.epochs_mjd["dec_hip"], theta
        )
        mu_h = jnp.stack([pmra_h0 + dpmra_h, pmdec_h0 + dpmdec_h])

        # ---- HG positional PM -------------------------------------------
        ep = self.epochs_mjd
        deg2mas = 60.0 * 60.0 * 1000.0
        if absolute:
            d_ra_prop = (ra_g0 - ra_h0) * deg2mas * jnp.cos(
                jnp.deg2rad((dec_g0 + dec_h0) / 2)
            )
            d_dec_prop = (dec_g0 - dec_h0) * deg2mas
            pmra_hg = (da_g - da_h + d_ra_prop) / (
                ep["ra_gaia"] - ep["ra_hip"]
            ) * JULIAN_YEAR_DAYS
            pmdec_hg = (dd_g - dd_h + d_dec_prop) / (
                ep["dec_gaia"] - ep["dec_hip"]
            ) * JULIAN_YEAR_DAYS
        else:
            pmra_hg = (da_g - da_h) / (
                ep["ra_gaia"] - ep["ra_hip"]
            ) * JULIAN_YEAR_DAYS + theta.pmra
            pmdec_hg = (dd_g - dd_h) / (
                ep["dec_gaia"] - ep["dec_hip"]
            ) * JULIAN_YEAR_DAYS + theta.pmdec
        mu_hg = jnp.stack([pmra_hg, pmdec_hg])

        # frame adjustment: pmra/pmdec refer to the primary at the Gaia
        # epoch (`hgca-linfit.jl:434-441`)
        dpm_g = jnp.stack([dpmra_g, dpmdec_g])
        mu_h = mu_h - dpm_g
        mu_hg = mu_hg - dpm_g
        mu_g = mu_g - dpm_g

        return {
            "mu_g": mu_g,
            "mu_h": mu_h,
            "mu_hg": mu_hg,
            "dpmra_g": dpmra_g,
            "dpmdec_g": dpmdec_g,
            "bad_duplicates": bad_duplicates,
            "absolute": absolute,
        }

    # ------------------------------------------------------------------
    def ln_like(self, ctx: SystemObservationContext):
        sim = self.simulate(ctx)
        h = self.hgca
        mu_g, mu_h, mu_hg = sim["mu_g"], sim["mu_h"], sim["mu_hg"]

        # nonlinear correction only applies when we propagate ourselves
        # (`hgca-linfit.jl:237-255`)
        if sim["absolute"]:
            mu_hg = mu_hg + jnp.asarray(
                [h["nonlinear_dpmra"], h["nonlinear_dpmdec"]]
            )
            mu_h = mu_h + 2 * jnp.asarray(
                [h["nonlinear_dpmra"], h["nonlinear_dpmdec"]]
            )

        ll = jnp.asarray(0.0)
        if "ra_hip" in self.kinds and "dec_hip" in self.kinds:
            ll = ll + gauss2d_logpdf(
                mu_h[0] - h["pmra_hip"], mu_h[1] - h["pmdec_hip"],
                h["pmra_hip_error"], h["pmdec_hip_error"], h["pmra_pmdec_hip"],
            )
        if "ra_hg" in self.kinds and "dec_hg" in self.kinds:
            ll = ll + gauss2d_logpdf(
                mu_hg[0] - h["pmra_hg"], mu_hg[1] - h["pmdec_hg"],
                h["pmra_hg_error"], h["pmdec_hg_error"], h["pmra_pmdec_hg"],
            )
        if "ra_gaia" in self.kinds and "dec_gaia" in self.kinds:
            ll = ll + gauss2d_logpdf(
                mu_g[0] - h["pmra_gaia"], mu_g[1] - h["pmdec_gaia"],
                h["pmra_gaia_error"], h["pmdec_gaia_error"], h["pmra_pmdec_gaia"],
            )
        return jnp.where(sim["bad_duplicates"], -jnp.inf, ll)

    def pointwise_ln_like(self, ctx):
        return jnp.reshape(self.ln_like(ctx), (1,))

    def generate_from_params(self, ctx, rng, add_noise=False):
        """Write model PMs back as a synthetic catalog row
        (`hgca-linfit.jl:462-...`)."""
        sim = self.simulate(ctx)
        h = dict(self.hgca)
        vals = {
            "pmra_hip": float(sim["mu_h"][0]),
            "pmdec_hip": float(sim["mu_h"][1]),
            "pmra_gaia": float(sim["mu_g"][0]),
            "pmdec_gaia": float(sim["mu_g"][1]),
            "pmra_hg": float(sim["mu_hg"][0]),
            "pmdec_hg": float(sim["mu_hg"][1]),
        }
        if add_noise:
            for block in ("hip", "gaia", "hg"):
                s1 = h[f"pmra_{block}_error"]
                s2 = h[f"pmdec_{block}_error"]
                rho = h[f"pmra_pmdec_{block}"]
                z1, z2 = rng.standard_normal(2)
                vals[f"pmra_{block}"] += s1 * z1
                vals[f"pmdec_{block}"] += s2 * (
                    rho * z1 + math.sqrt(max(1 - rho**2, 0.0)) * z2
                )
        h.update(vals)
        import copy

        new = copy.copy(self)
        new.hgca = h
        return new

    def likeobj_from_epoch_subset(self, idx):
        # subsetting at whole-channel granularity
        import copy

        new = copy.copy(self)
        new.kinds = [self.kinds[i] for i in np.atleast_1d(idx)]
        return new


HGCALikelihood = HGCAObs
