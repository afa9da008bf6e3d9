"""Sky-path perturbation accumulators.

TPU-native equivalents of the reference's per-scan perturbation loops
(`/root/reference/src/likelihoods/gaia-utils.jl:460-699`): the linear
photocentre form (Gaia / small separation) and the BINARYS atan2
Hippacentre with resolution taper and sigma-inflation (Hipparcos
abscissae). Both are fully vectorized over the scan/epoch axis.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from ..orbits import decoff, raoff, totalmass

# Hipparcos main grid step & resolution scale (Lindegren 1997, ESA
# SP-1200; `gaia-utils.jl:468-482`)
HIPPARCOS_GRID_STEP_ARCSEC = 1.2074
HIPPARCOS_RESOLUTION_ARCSEC = 1.207


def photocentre_coeff(orbit, planet_mass_msol, flux_ratio):
    """Linear photocentre coefficient (`gaia-utils.jl:505-510`):
    offset = raoff(sol) * coeff with
    coeff = (-m_p + f*m_host) / (M_tot * (1 + f))."""
    M_tot = totalmass(orbit)
    m_host_eff = M_tot - planet_mass_msol
    return (-planet_mass_msol + flux_ratio * m_host_eff) / (M_tot * (1 + flux_ratio))


def skypath_perturbations_linear(sol, orbit, planet_mass_msol, flux_ratio):
    """Photocentre (d_alpha*, d_delta) [mas] per epoch for one companion
    (`_simulate_skypath_perturbations!`, `gaia-utils.jl:494-525`)."""
    coeff = photocentre_coeff(orbit, planet_mass_msol, flux_ratio)
    return raoff(sol) * coeff, decoff(sol) * coeff


def hippacentre_combined(
    cosphi,
    sinphi,
    sols,                 # list of per-planet OrbitSolution over the scans
    planet_masses_msol,   # list of traced masses
    flux_ratios,          # list of traced Hp-band flux ratios
    s_arcsec: float = HIPPARCOS_GRID_STEP_ARCSEC,
):
    """Combined BINARYS Hippacentre along-scan offset + sigma inflation
    (`_simulate_skypath_hippacentre_combined!`, `gaia-utils.jl:577-699`;
    Leclerc et al. 2023 Eq. 13 & 15, multi-companion generalization).

    Returns (d_alpha [mas], d_delta [mas], sigma_inflation) arrays over
    scans. The per-companion modulated signal is gated by the Gaussian
    resolution taper in full projected separation; the host-reflex sum
    is not gated. Zero-mass companions contribute exactly zero via a
    weight mask (branch-free analogue of the reference's skips).
    """
    s_mas = s_arcsec * 1000.0
    two_pi_over_s = 2 * math.pi / s_mas
    inv_res_mas2 = 1.0 / (1000.0 * HIPPARCOS_RESOLUTION_ARCSEC) ** 2

    Re = jnp.ones_like(cosphi)
    Im = jnp.zeros_like(cosphi)
    f_total = jnp.zeros_like(cosphi)
    host_along = jnp.zeros_like(cosphi)

    for sol, m, f in zip(sols, planet_masses_msol, flux_ratios):
        active = jnp.where(m != 0, 1.0, 0.0)
        ra_h = raoff(sol, m)
        dec_h = decoff(sol, m)
        host_along = host_along + active * (ra_h * cosphi + dec_h * sinphi)

        ra_p = raoff(sol)
        dec_p = decoff(sol)
        rho_pk = ra_p * cosphi + dec_p * sinphi
        rho_full_sq = ra_p * ra_p + dec_p * dec_p
        alpha_k = jnp.exp(-rho_full_sq * inv_res_mas2)
        zeta = two_pi_over_s * rho_pk
        zeta_ok = jnp.isfinite(zeta)
        zeta_safe = jnp.where(zeta_ok, zeta, 0.0)
        f_k = f * alpha_k * active
        sz = jnp.where(zeta_ok, jnp.sin(zeta_safe), jnp.nan)
        cz = jnp.where(zeta_ok, jnp.cos(zeta_safe), jnp.nan)
        Re = Re + f_k * cz
        Im = Im + f_k * sz
        f_total = f_total + f_k

    phi = jnp.arctan2(Im, Re)
    dnu = s_mas / (2 * math.pi) * phi + host_along
    d_alpha = dnu * cosphi
    d_delta = dnu * sinphi
    amp = jnp.sqrt(Re * Re + Im * Im)
    sigma_inflation = (1 + f_total) / amp
    return d_alpha, d_delta, sigma_inflation
