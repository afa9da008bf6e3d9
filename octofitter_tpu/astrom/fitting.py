"""Differentiable astrometric least-squares fits.

TPU-native equivalent of the reference's design matrices and 4/5-param
solves (`/root/reference/src/likelihoods/gaia-utils.jl:295-459`). The
solves are small (N x 5) QR factorizations — differentiable through
`jax.numpy.linalg` and batched across chains by vmap, replacing the
bump-allocated in-place `\\` of the reference.

Design matrix columns (`gaia-utils.jl:317-339`):
    [cos(phi), sin(phi), -parallaxFactorAL, cos(phi) dt_ra, sin(phi) dt_dec]
with dt in Julian years from per-axis reference epochs. RHS:
    b = d(alpha*) cos(phi) + d(delta) sin(phi) + residuals.
Returned parameter order: (d_alpha, d_delta, d_pmra, d_pmdec, d_plx)
(the reference returns x[[1,2,4,5,3]], `gaia-utils.jl:405`).
"""

from __future__ import annotations

import jax.numpy as jnp
import jax.scipy.linalg as jsl
import numpy as np

from ..constants import JULIAN_YEAR_DAYS


def prepare_A_4param(epoch, cosphi, sinphi, ref_epoch_ra, ref_epoch_dec):
    dt_ra = (np.asarray(epoch) - ref_epoch_ra) / JULIAN_YEAR_DAYS
    dt_dec = (np.asarray(epoch) - ref_epoch_dec) / JULIAN_YEAR_DAYS
    return np.stack(
        [cosphi, sinphi, cosphi * dt_ra, sinphi * dt_dec], axis=-1
    )


def prepare_A_5param(epoch, cosphi, sinphi, parallax_factor_al,
                     ref_epoch_ra, ref_epoch_dec):
    dt_ra = (np.asarray(epoch) - ref_epoch_ra) / JULIAN_YEAR_DAYS
    dt_dec = (np.asarray(epoch) - ref_epoch_dec) / JULIAN_YEAR_DAYS
    return np.stack(
        [
            cosphi,
            sinphi,
            -np.asarray(parallax_factor_al),
            cosphi * dt_ra,
            sinphi * dt_dec,
        ],
        axis=-1,
    )


def _lstsq_qr(A, b):
    """Least-squares via QR; differentiable and stable in f32."""
    Q, R = jnp.linalg.qr(A)
    return jsl.solve_triangular(R, Q.T @ b, lower=False)


def fit_5param(A, cosphi, sinphi, dalpha, ddelta, residuals=0.0, sigma=None,
               include_chi2=False, weights=None, n_rows=None):
    """Weighted 5-parameter fit (`fit_5param_prepared`,
    `gaia-utils.jl:371-439`).

    sigma: None or scalar (cancels in the solve, folded into chi2 only)
    or a per-epoch vector (genuinely weights the solve).

    weights: optional per-row multiplicities/masks — the TPU-native form
    of the reference's per-sample epoch re-selection (`missed_transits`
    / `transits_dr2` table mutation, `hgca-linfit.jl:308-322`,
    `g23h.jl:1732-1736,2092`): weight 0 drops a scan from the fit,
    weight 2 enters it twice (a doubly-downlinked DR2 transit), all
    with fixed array shapes under jit.

    n_rows: effective row count for the chi2 dof when weights select a
    subset (defaults to A.shape[0]).

    Returns dict with 'parameters' (d_alpha, d_delta, d_pmra, d_pmdec,
    d_plx) and optionally chi2 values.
    """
    A = jnp.asarray(A)
    b = dalpha * cosphi + ddelta * sinphi + residuals
    scalar_sigma = sigma is None or jnp.ndim(sigma) == 0
    if not scalar_sigma:
        Aw = A / sigma[:, None]
        bw = b / sigma
    else:
        Aw, bw = A, b
    if weights is not None:
        sw = jnp.sqrt(jnp.asarray(weights, A.dtype))
        Aw = Aw * sw[:, None]
        bw = bw * sw
    x = _lstsq_qr(Aw, bw)
    parameters = (x[0], x[1], x[3], x[4], x[2])
    out = {"parameters": parameters}
    if include_chi2:
        resid = bw - Aw @ x
        if scalar_sigma:
            s = 1.0 if sigma is None else sigma
            chi2 = jnp.sum(resid * resid) / (s * s)
        else:
            chi2 = jnp.sum(resid * resid)
        dof = (A.shape[0] if n_rows is None else n_rows) - 5
        out["chi_squared_astro"] = chi2
        out["chi2_reduced"] = chi2 / dof
        out["dof"] = dof
    return out


def fit_4param(A, cosphi, sinphi, dalpha, ddelta, sigma=None):
    """4-parameter (no parallax) fit (`fit_4param_prepared`,
    `gaia-utils.jl:342-369`). Returns (d_alpha, d_delta, d_pmra, d_pmdec)."""
    A = jnp.asarray(A)
    b = dalpha * cosphi + ddelta * sinphi
    if sigma is not None and jnp.ndim(sigma) > 0:
        A = A / sigma[:, None]
        b = b / sigma
    x = _lstsq_qr(A, b)
    return {"parameters": (x[0], x[1], x[2], x[3])}


def fit_5param_pinv(pinv_A, cosphi, sinphi, dalpha, ddelta, residuals=0.0):
    """5-param solve with a precomputed pseudo-inverse (5 x N), the
    cached-weighted-pinv fast path of `gaia-utils.jl:441-459`."""
    b = dalpha * cosphi + ddelta * sinphi + residuals
    x = jnp.asarray(pinv_A) @ b
    return {"parameters": (x[0], x[1], x[3], x[4], x[2])}
