"""Closure-phase + squared-visibility likelihood.

TPU-native equivalent of `OctofitterInterferometry`'s
`InterferometryObs`
(`/root/reference/OctofitterInterferometry/src/OctofitterInterferometry.jl:13-300`):
model complex visibilities of the host + point-source companions,
form closure phases over the supplied baseline triangles, and compare
with measured closure phases (deg) and optionally squared
visibilities. The reference's per-epoch/per-wavelength loops become a
fused computation over the (baseline x wavelength) grid per epoch.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ..constants import MJUP2MSOL, RAD2AS
from ..model.params import Params, hasproperty
from ..model.variables import AbstractObs, SystemObservationContext
from ..likelihoods.utils import take_epochs
from ..orbits import decoff, raoff, semimajoraxis

MAS_TO_RAD = 1.0 / (RAD2AS * 1000.0)


def cvis_point_sources(u, v, dra_mas, ddec_mas, contrasts):
    """Complex visibility of host (flux 1) + point companions.

    u, v: (n_baseline, n_wave) in inverse wavelengths; dra/ddec lists of
    scalars (mas); contrasts list of scalars. Normalized by total flux.
    (`cvis_bin!`, reference `:255-277`.)
    """
    cvis = jnp.ones_like(u, dtype=jnp.complex128 if u.dtype == jnp.float64 else jnp.complex64)
    total = jnp.asarray(0.0)
    for dra, ddec, f in zip(dra_mas, ddec_mas, contrasts):
        arg = -2 * math.pi * (u * dra + v * ddec) * MAS_TO_RAD
        cvis = cvis + f * jnp.exp(1j * arg)
        total = total + f
    return cvis / (1.0 + total)


def closure_phases_deg(cvis, i1, i2, i3):
    """Closure phases [deg] over triangles (`closurephase!`,
    reference `:280-300`): phi(i1) + phi(i2) - phi(i3), each phase
    wrapped to (-180, 180]."""
    phi = jnp.rad2deg(jnp.angle(cvis))
    return phi[i1, :] + phi[i2, :] - phi[i3, :]


class AbstractInterferometryObs(AbstractObs):
    """Supertype of interferometric observation objects (reference
    `OctofitterInterferometry.jl:10` AbstractInterferometryLikelihood)."""


class InterferometryObs(AbstractInterferometryObs):
    """Closure phases + V^2 from interferometric observations.

    observations: list of per-epoch dicts with keys
      epoch (MJD), u, v ((n_baseline, n_wave), inverse wavelengths),
      cps_data, dcps ((n_triangle, n_wave), degrees),
      vis2_data, dvis2 ((n_baseline, n_wave)),
      index_cps1/2/3 (triangle index arrays into the baseline axis),
      use_vis2 (bool).
    Observation variables: `flux` (array over planets: companion flux
    contrasts), optional `σ_cp_jitter` (deg), `platescale`, `northangle`.
    """

    def __init__(self, observations, variables=None, name="interferometry"):
        super().__init__(variables=variables, name=name)
        rows = [dict(r) for r in observations]
        # OIFITS auto-extraction: a row with `filename` is replaced by
        # the parsed file contents (reference
        # `OctofitterInterferometry.jl:32-38`); other row keys
        # (epoch, wavelength_min/max_meters, use_vis2) pass through.
        from .oifits import load_oifits

        rows = [
            load_oifits(**r) if "filename" in r else r for r in rows
        ]
        for r in rows:
            dcps = np.asarray(r["dcps"], dtype=np.float64)
            if np.any(dcps == 0):
                # clamp CP errors to >= 2 degrees (reference `:89-93`)
                dcps = np.maximum(2.0, dcps)
            r["dcps"] = dcps
        rows.sort(key=lambda r: float(r["epoch"]))
        self.rows = rows
        self.table = {"epoch": np.asarray([float(r["epoch"]) for r in rows])}

    # ------------------------------------------------------------------
    def _positions(self, ctx, i_epoch):
        """Model (dra, ddec) [mas] of each companion at epoch i,
        including inner-companion photocentre shifts."""
        theta = ctx.theta_system
        theta_obs = ctx.theta_obs
        platescale = theta_obs.get("platescale", jnp.asarray(1.0)) if isinstance(theta_obs, Params) else jnp.asarray(1.0)
        northangle = theta_obs.get("northangle", jnp.asarray(0.0)) if isinstance(theta_obs, Params) else jnp.asarray(0.0)
        pnames = list(theta.planets.keys())
        n_p = len(pnames)
        sols = [take_epochs(ctx.solutions[j], ctx.epoch_start + i_epoch, 1) for j in range(n_p)]
        dras, ddecs = [], []
        c, s = jnp.cos(northangle), jnp.sin(northangle)
        for i in range(n_p):
            ra = raoff(sols[i])[0]
            dec = decoff(sols[i])[0]
            a_this = semimajoraxis(ctx.orbits[i])
            for j in range(n_p):
                if j == i:
                    continue
                theta_o = theta.planets[pnames[j]]
                if not hasproperty(theta_o, "mass"):
                    continue
                w = jnp.where(semimajoraxis(ctx.orbits[j]) < a_this, 1.0, 0.0)
                m = theta_o.mass * MJUP2MSOL
                ra = ra - w * raoff(sols[j], m)[0]
                dec = dec - w * decoff(sols[j], m)[0]
            ra_r = ra * c - dec * s
            dec_r = ra * s + dec * c
            dras.append(ra_r * platescale)
            ddecs.append(dec_r * platescale)
        return dras, ddecs

    def ln_like(self, ctx: SystemObservationContext):
        theta_obs = ctx.theta_obs
        sig_jit = theta_obs.get("σ_cp_jitter", jnp.asarray(0.0)) if isinstance(theta_obs, Params) else jnp.asarray(0.0)
        flux = theta_obs["flux"]
        n_p = len(ctx.theta_system.planets)
        contrasts = [flux[i] if jnp.ndim(flux) else flux for i in range(n_p)]

        ll = jnp.asarray(0.0)
        for i_epoch, r in enumerate(self.rows):
            u = jnp.asarray(np.asarray(r["u"], dtype=np.float64))
            v = jnp.asarray(np.asarray(r["v"], dtype=np.float64))
            dras, ddecs = self._positions(ctx, i_epoch)
            cvis = cvis_point_sources(u, v, dras, ddecs, contrasts)

            i1 = np.asarray(r["index_cps1"], dtype=int)
            i2 = np.asarray(r["index_cps2"], dtype=int)
            i3 = np.asarray(r["index_cps3"], dtype=int)
            cps_model = closure_phases_deg(cvis, i1, i2, i3)
            cps_data = jnp.asarray(np.asarray(r["cps_data"], dtype=np.float64))
            dcps = jnp.asarray(np.asarray(r["dcps"], dtype=np.float64))
            var = dcps**2 + sig_jit**2
            ll = ll + jnp.sum(
                -0.5 * (cps_data - cps_model) ** 2 / var
                - 0.5 * jnp.log(2 * math.pi * var)
            )
            if r.get("use_vis2", False):
                vis2 = jnp.abs(cvis) ** 2
                v2d = jnp.asarray(np.asarray(r["vis2_data"], dtype=np.float64))
                dv2 = jnp.asarray(np.asarray(r["dvis2"], dtype=np.float64))
                ll = ll + jnp.sum(
                    -0.5 * (v2d - vis2) ** 2 / dv2**2
                    - 0.5 * jnp.log(2 * math.pi * dv2**2)
                )
        return ll

    def likeobj_from_epoch_subset(self, idx):
        idx = np.atleast_1d(idx)
        new = object.__new__(type(self))
        AbstractObs.__init__(new, variables=None, name=self.name)
        new.var_specs = self.var_specs
        new.rows = [self.rows[i] for i in idx]
        new.table = {"epoch": self.table["epoch"][idx]}
        return new


InterferometryLikelihood = InterferometryObs
AbstractInterferometryLikelihood = AbstractInterferometryObs
