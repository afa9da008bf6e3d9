"""Direct-image likelihoods.

TPU-native equivalent of `OctofitterImages`
(`/root/reference/OctofitterImages/src/images.jl`,
`likelihood-maps.jl`): interpolate each image (and its contrast
curve/map) at the model position of the companion and apply the
Ruffio 2017 (eq 31) / Mawet 2019 (eq 8) likelihood
    ll_i = -(flux^2 - 2 flux f_x) / (2 sigma_x^2).

Images are stored as device arrays; the per-epoch interpolation is
`jax.scipy.ndimage.map_coordinates` (order 1), fully differentiable.
Image pixel grids are centered: coordinate (0, 0) is the star, +x is
-RA (image convention), +y is +Dec, in units of `platescale` mas/px.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import MJUP2MSOL
from ..model.params import Params, hasproperty
from ..model.variables import AbstractObs, PlanetObservationContext
from ..orbits import decoff, raoff, semimajoraxis
from .utils_interp import interp_image_centered
from ..likelihoods.utils import take_epochs


def contrast_curve(image: np.ndarray, step_px: float = 2.0) -> tuple:
    """Azimuthal-std contrast curve of a centered image
    (`images.jl:93-139`). Returns (radii_px, sigma)."""
    ny, nx = image.shape
    y, x = np.mgrid[0:ny, 0:nx]
    cx, cy = (nx - 1) / 2, (ny - 1) / 2
    dr = np.hypot(x - cx, y - cy)
    rmax = dr.max()
    bins = np.arange(0, rmax, step_px)
    radii, sigmas = [], []
    for lo in bins:
        mask = (dr >= lo) & (dr < lo + step_px) & np.isfinite(image)
        if mask.sum() > 5:
            radii.append(lo + step_px / 2)
            sigmas.append(np.std(image[mask]))
    return np.asarray(radii), np.asarray(sigmas)


class ImageObs(AbstractObs):
    """Direct-image likelihood.

    observations: list of dicts with keys `image` (2D array, centered),
    `epoch` (MJD), `platescale` (mas/px); optional `contrast` as
    (radii_px, sigma) tuple or `contrastmap` 2D array. The observation
    variables must include `flux` (band flux of the companion);
    optional `platescale` (multiplier) and `northangle` nuisances.
    """

    def __init__(self, observations, variables=None, name="images"):
        super().__init__(variables=variables, name=name)
        rows = list(observations)
        self._epochs = np.asarray([float(r["epoch"]) for r in rows])
        order = np.argsort(self._epochs, kind="stable")
        rows = [rows[i] for i in order]
        self._epochs = self._epochs[order]
        self.images = [jnp.asarray(np.asarray(r["image"], dtype=np.float64)) for r in rows]
        self.platescales = np.asarray([float(r["platescale"]) for r in rows])
        self.contrastmaps = []
        self.contrasts = []
        for r in rows:
            if "contrastmap" in r:
                self.contrastmaps.append(jnp.asarray(np.asarray(r["contrastmap"], float)))
                self.contrasts.append(None)
            else:
                if "contrast" in r:
                    radii, sig = r["contrast"]
                else:
                    radii, sig = contrast_curve(np.asarray(r["image"], float))
                self.contrastmaps.append(None)
                self.contrasts.append((jnp.asarray(radii), jnp.asarray(sig)))
        self.table = {"epoch": self._epochs}

    # ------------------------------------------------------------------
    def _model_xy(self, ctx: PlanetObservationContext):
        n = len(self._epochs)
        sol = take_epochs(ctx.solutions[ctx.i_planet], ctx.epoch_start, n)
        ra = raoff(sol)
        dec = decoff(sol)
        this_orbit = ctx.orbits[ctx.i_planet]
        a_this = semimajoraxis(this_orbit)
        planets = ctx.theta_system.planets
        for j, pname in enumerate(planets.keys()):
            theta_p = planets[pname]
            if not hasproperty(theta_p, "mass") or j == ctx.i_planet:
                continue
            w = jnp.where(semimajoraxis(ctx.orbits[j]) < a_this, 1.0, 0.0)
            sol_o = take_epochs(ctx.solutions[j], ctx.epoch_start, n)
            m = theta_p.mass * MJUP2MSOL
            ra = ra - w * raoff(sol_o, m)
            dec = dec - w * decoff(sol_o, m)

        theta_obs = ctx.theta_obs
        northangle = theta_obs.get("northangle", jnp.asarray(0.0)) if isinstance(theta_obs, Params) else jnp.asarray(0.0)
        c, s = jnp.cos(northangle), jnp.sin(northangle)
        ra_r = ra * c - dec * s
        dec_r = ra * s + dec * c
        # image-frame: x reversed relative to RA (`images.jl:210-212`)
        return -ra_r, dec_r

    def ln_like(self, ctx: PlanetObservationContext):
        return jnp.sum(self.pointwise_ln_like(ctx))

    def pointwise_ln_like(self, ctx: PlanetObservationContext):
        theta_obs = ctx.theta_obs
        theta = ctx.theta_system.merge(ctx.theta_planet).merge(ctx.theta_obs)
        flux = theta["flux"]
        ps_mult = theta_obs.get("platescale", jnp.asarray(1.0)) if isinstance(theta_obs, Params) else jnp.asarray(1.0)
        x, y = self._model_xy(ctx)

        lls = []
        for i in range(len(self._epochs)):
            ps = self.platescales[i] * ps_mult
            xi, yi = x[i] / ps, y[i] / ps
            f = interp_image_centered(self.images[i], xi, yi)
            f = jnp.where(jnp.isfinite(f), f, 0.0)
            if self.contrastmaps[i] is not None:
                sig = interp_image_centered(self.contrastmaps[i], xi, yi)
            else:
                radii, sigs = self.contrasts[i]
                r = jnp.hypot(xi, yi)
                sig = jnp.interp(r, radii, sigs)
            bad = (~jnp.isfinite(sig)) | (sig == 0)
            sig = jnp.where(bad, 1.0, sig)
            ll_i = -(flux**2 - 2 * flux * f) / (2 * sig**2)
            lls.append(jnp.where(bad, -jnp.inf, ll_i))
        return jnp.stack(lls)

    def likeobj_from_epoch_subset(self, idx):
        idx = np.atleast_1d(idx)
        new = object.__new__(type(self))
        AbstractObs.__init__(new, variables=None, name=self.name)
        new.var_specs = self.var_specs
        new._epochs = self._epochs[idx]
        new.images = [self.images[i] for i in idx]
        new.platescales = self.platescales[idx]
        new.contrastmaps = [self.contrastmaps[i] for i in idx]
        new.contrasts = [self.contrasts[i] for i in idx]
        new.table = {"epoch": new._epochs}
        return new


class LogLikelihoodMapObs(AbstractObs):
    """External per-epoch log-likelihood maps over (Delta-RA, Delta-Dec)
    (`OctofitterImages/src/likelihood-maps.jl:37-201`).

    observations: dicts with `map` (2D ll values, centered), `epoch`,
    `platescale` (mas/px); optional `fillvalue` for out-of-map positions.
    """

    def __init__(self, observations, variables=None, name="llmaps", fillvalue=-1e4):
        super().__init__(variables=variables, name=name)
        rows = list(observations)
        self._epochs = np.asarray([float(r["epoch"]) for r in rows])
        order = np.argsort(self._epochs, kind="stable")
        rows = [rows[i] for i in order]
        self._epochs = self._epochs[order]
        self.maps = [jnp.asarray(np.asarray(r["map"], float)) for r in rows]
        self.platescales = np.asarray([float(r["platescale"]) for r in rows])
        self.fillvalues = np.asarray(
            [float(r.get("fillvalue", fillvalue)) for r in rows]
        )
        self.table = {"epoch": self._epochs}

    def ln_like(self, ctx: PlanetObservationContext):
        return jnp.sum(self.pointwise_ln_like(ctx))

    def pointwise_ln_like(self, ctx: PlanetObservationContext):
        n = len(self._epochs)
        sol = take_epochs(ctx.solutions[ctx.i_planet], ctx.epoch_start, n)
        ra = raoff(sol)
        dec = decoff(sol)
        lls = []
        for i in range(n):
            ps = self.platescales[i]
            xi, yi = -ra[i] / ps, dec[i] / ps
            v = interp_image_centered(self.maps[i], xi, yi)
            lls.append(jnp.where(jnp.isfinite(v), v, self.fillvalues[i]))
        return jnp.stack(lls)

    def likeobj_from_epoch_subset(self, idx):
        idx = np.atleast_1d(idx)
        new = object.__new__(type(self))
        AbstractObs.__init__(new, variables=None, name=self.name)
        new.var_specs = self.var_specs
        new._epochs = self._epochs[idx]
        new.maps = [self.maps[i] for i in idx]
        new.platescales = self.platescales[idx]
        new.fillvalues = self.fillvalues[idx]
        new.table = {"epoch": new._epochs}
        return new


ImageLikelihood = ImageObs
# reference alias (OctofitterImages/src/likelihood-maps.jl:76)
LogLikelihoodMap = LogLikelihoodMapObs
