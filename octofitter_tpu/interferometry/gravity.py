"""GRAVITY-Wide kernel-phase likelihood.

TPU-native equivalent of
`/root/reference/OctofitterInterferometry/src/GRAVITY.jl` +
`GRAVITY-correlation.jl` (`GRAVITYWideKPObs`): closure phases projected
into a kernel-phase basis (Cholesky of the closure design matrix),
fiber-coupling throughput loss for off-centre companions, and Jens'
semi-analytic block-diagonal kernel-phase correlation matrix with
spectral correlation parameter `kp_Cy` and additive `kp_jitter`.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ..atmosphere import interp2d_bilinear
from ..model.params import Params
from ..model.variables import AbstractObs, SystemObservationContext
from .likelihoods import AbstractInterferometryObs
from ..likelihoods.utils import take_epochs
from ..orbits import decoff, projectedseparation, raoff
from .likelihoods import closure_phases_deg, cvis_point_sources

# GRAVITY/VLTI closure design matrix: 4 triangles from 6 baselines
# (`GRAVITY.jl:48-53`)
_T_GRAVITY = np.array(
    [
        [1, -1, 0, 1, 0, 0],
        [1, 0, -1, 0, 1, 0],
        [0, 1, -1, 0, 0, 1],
        [0, 0, 0, 1, -1, 1],
    ],
    dtype=np.int8,
)


def fiber_coupling_fraction(theta_mas, lambda_m=2.2e-6, n_grid=500):
    """Fiber coupling efficiency vs offset (mas) at one wavelength.

    Fraunhofer overlap integral of a tilted pupil field with a Gaussian
    fiber mode (`fiber_coupling_fraction`, `GRAVITY.jl:115-129`; credit
    W. Balmer, D. Bakely et al. in the reference).
    """
    theta_mas = np.atleast_1d(np.asarray(theta_mas, dtype=np.float64))
    D = 8.0
    x = np.linspace(-2 * D, 2 * D, n_grid)
    r = np.hypot(x[:, None], x[None, :])
    m = r < D / 2
    w0 = 0.32 * D
    field_fiber = np.exp(-(r**2) / (2 * w0**2))
    mas2rad = 1e-3 / (180 / np.pi * 3600)
    out = np.empty(len(theta_mas))
    denom = abs((m * field_fiber).sum()) ** 2
    for i, th in enumerate(theta_mas):
        phase = x[:, None] / lambda_m * th * mas2rad * 2 * np.pi
        field_pup = m * np.exp(1j * phase)
        out[i] = abs((field_pup * field_fiber).sum()) ** 2 / denom
    return out


def _kernel_phase_basis(n_wave: int, T=_T_GRAVITY):
    """Kernel-phase projection P1 ((3*n_wave) x (4*n_wave)) from the
    wavelength-replicated design matrix (`GRAVITY.jl:55-79`)."""
    nT, nB = T.shape
    TL = np.zeros((n_wave * nT, n_wave * nB))
    for bi in range(nT):
        for bj in range(nB):
            for wi in range(n_wave):
                TL[wi + bi * n_wave, wi + bj * n_wave] = T[bi, bj]
    M = TL @ TL.T
    import scipy.linalg as sla

    L = sla.cholesky(M + 1e-10 * np.eye(M.shape[0]), lower=True)
    P1 = L / np.sqrt(np.diag(L @ L.T))[:, None]
    d = np.diag(P1)
    i_max = int(np.argmax(d <= 1e-5)) if np.any(d <= 1e-5) else len(d)
    return P1[:, :i_max].T  # (i_max, 4*n_wave) -> rows are KP combinations


class GRAVITYWideKPObs(AbstractInterferometryObs):
    """GRAVITY wide-field kernel phases.

    observations: per-epoch dicts with keys epoch, u, v
    ((4 triangles-worth of baselines? -> n_baseline x n_wave)),
    cps_data/dcps ((4, n_wave), deg), index_cps1/2/3, eff_wave (m).
    Observation variables: `flux` (per-planet contrast), optional
    `kp_jitter` (deg), `kp_Cy` (spectral correlation in [0,1)).
    """

    def __init__(self, observations, variables=None, name="GRAVITY-WIDE"):
        super().__init__(variables=variables, name=name)
        rows = [dict(r) for r in observations]
        rows.sort(key=lambda r: float(r["epoch"]))
        for r in rows:
            r["dcps"] = np.maximum(np.asarray(r["dcps"], dtype=np.float64), 1e-3)
            n_wave = len(np.asarray(r["eff_wave"]))
            P1 = _kernel_phase_basis(n_wave)
            r["P1"] = P1
            # CP vector layout: triangle-major, wavelengths contiguous
            r["sigma_kp"] = P1 @ np.asarray(r["dcps"], dtype=np.float64).reshape(-1)
        self.rows = rows
        self.table = {"epoch": np.asarray([float(r["epoch"]) for r in rows])}

        # fiber coupling interpolation grid (`GRAVITY.jl:84-92`)
        sep_grid = np.arange(0.0, 102.0, 2.0)
        waves = np.concatenate([np.asarray(r["eff_wave"], dtype=np.float64) for r in rows])
        lam_grid = np.linspace(waves.min() * 0.99, waves.max() * 1.01, 15)
        coupling = np.stack(
            [fiber_coupling_fraction(sep_grid, lam) for lam in lam_grid], axis=1
        )
        self._coupling = interp2d_bilinear(sep_grid, lam_grid, coupling)

    # ------------------------------------------------------------------
    def ln_like(self, ctx: SystemObservationContext):
        theta_obs = ctx.theta_obs
        flux = theta_obs["flux"]
        n_p = len(ctx.theta_system.planets)
        contrasts = [flux[i] if jnp.ndim(flux) else flux for i in range(n_p)]
        kp_jitter = theta_obs.get("kp_jitter", jnp.asarray(0.0)) if isinstance(theta_obs, Params) else jnp.asarray(0.0)
        kp_cy = theta_obs.get("kp_Cy", jnp.asarray(0.0)) if isinstance(theta_obs, Params) else jnp.asarray(0.0)

        ll = jnp.asarray(0.0)
        for i_epoch, r in enumerate(self.rows):
            u = jnp.asarray(np.asarray(r["u"], dtype=np.float64))
            v = jnp.asarray(np.asarray(r["v"], dtype=np.float64))
            eff_wave = np.asarray(r["eff_wave"], dtype=np.float64)
            n_wave = len(eff_wave)

            # positions + throughput-scaled contrasts per wavelength
            dras, ddecs, eff_contrasts = [], [], []
            for i in range(n_p):
                sol = take_epochs(ctx.solutions[i], ctx.epoch_start + i_epoch, 1)
                ra = raoff(sol)[0]
                dec = decoff(sol)[0]
                sep = projectedseparation(sol)[0]
                f = contrasts[i]
                fiber_offset = f * sep / (1.0 + f)
                coup = jnp.stack(
                    [self._coupling(fiber_offset, lam) for lam in eff_wave]
                )
                coup = jnp.where(jnp.isfinite(coup), coup, 0.0)
                dras.append(ra)
                ddecs.append(dec)
                eff_contrasts.append(f * coup)  # (n_wave,)

            # complex visibilities with per-wavelength contrasts
            cvis = jnp.ones_like(u, dtype=jnp.complex64 if u.dtype == jnp.float32 else jnp.complex128)
            from ..constants import RAD2AS

            mas2rad = 1.0 / (RAD2AS * 1000.0)
            for dra, ddec, fc in zip(dras, ddecs, eff_contrasts):
                arg = -2 * math.pi * (u * dra + v * ddec) * mas2rad
                cvis = cvis + fc[None, :] * jnp.exp(1j * arg)
            # normalization uses the raw contrast (`GRAVITY.jl:223-226`)
            norm = 1.0 + sum(contrasts) if n_p else 1.0
            cvis = cvis / norm

            i1 = np.asarray(r["index_cps1"], dtype=int)
            i2 = np.asarray(r["index_cps2"], dtype=int)
            i3 = np.asarray(r["index_cps3"], dtype=int)
            cps_model = closure_phases_deg(cvis, i1, i2, i3)
            cps_data = jnp.asarray(np.asarray(r["cps_data"], dtype=np.float64))
            resids = (cps_data - cps_model).reshape(-1)  # triangle-major

            P1 = jnp.asarray(r["P1"])
            kp_resids = P1 @ resids
            sigma_kp = jnp.asarray(r["sigma_kp"])

            # block-diagonal KP correlation: three (n_wave x n_wave)
            # blocks of (1 diag, kp_Cy off-diag) (`CKP`,
            # `GRAVITY-correlation.jl:123-160`)
            n_kp = P1.shape[0]
            n_blocks = max(n_kp // n_wave, 1)
            block = kp_cy * jnp.ones((n_wave, n_wave)) + (1 - kp_cy) * jnp.eye(n_wave)
            C = jnp.kron(jnp.eye(n_blocks), block)[:n_kp, :n_kp]
            Sigma = sigma_kp[:, None] * C * sigma_kp[None, :]
            Sigma = Sigma + (kp_jitter**2 + 1e-12) * jnp.eye(n_kp)

            L = jnp.linalg.cholesky(Sigma)
            import jax.scipy.linalg as jsl

            alpha = jsl.solve_triangular(L, kp_resids, lower=True)
            ll_e = (
                -0.5 * jnp.sum(alpha**2)
                - jnp.sum(jnp.log(jnp.diagonal(L)))
                - 0.5 * n_kp * math.log(2 * math.pi)
            )
            ll = ll + jnp.where(jnp.isfinite(ll_e), ll_e, -jnp.inf)
        return ll

    def likeobj_from_epoch_subset(self, idx):
        idx = np.atleast_1d(idx)
        new = object.__new__(type(self))
        AbstractObs.__init__(new, variables=None, name=self.name)
        new.var_specs = self.var_specs
        new.rows = [self.rows[i] for i in idx]
        new.table = {"epoch": self.table["epoch"][idx]}
        new._coupling = self._coupling
        return new


GRAVITYWideKPLikelihood = GRAVITYWideKPObs
