"""AbsoluteVisual orbits: rigorous on-sky barycentric propagation.

TPU-native equivalent of PlanetOrbits.jl's `AbsoluteVisual{KepOrbit}`
(SURVEY.md section 2.5; consumed at reference `hipparcos.jl:610-621`,
`gaia-dr4.jl:191-197`, `hgca-linfit.jl:329-343`): the system barycentre
moves through space, so the apparent ra/dec/parallax/proper-motion all
change with time, and the changing distance modulates the light-travel
time (shifting the observed orbital phase — an apparent acceleration).

Implementation: exact epoch propagation in Cartesian coordinates
(Butkevich & Lindegren 2014 style). Units: ra/dec in degrees, plx in
mas, pmra/pmdec in mas/yr (pmra includes cos(dec)), rv in m/s,
ref_epoch in MJD. Solutions carry a `compensated` block with
ra2/dec2/parallax2/pmra2/pmdec2/rv2/t_em_days, matching the reference's
`sol.compensated` field names.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..constants import (
    AUDAY_TO_MS,
    IAU_AU_M,
    IAU_PC2AU,
    JULIAN_YEAR_DAYS,
    KEPLER_YEAR_DAYS,
    RAD2AS,
)
from .elements import (
    OrbitSolution,
    _pytree_dataclass,
    _resolve_aliases,
    _solve_common,
    _thiele_innes_unit,
    _pick,
)

# light travel time across one parsec, in days
C_M_S = 299792458.0
PC_LT_DAYS = IAU_PC2AU * IAU_AU_M / C_M_S / 86400.0
MASYR_TO_RADYR = 1.0 / (1000.0 * RAD2AS)


@_pytree_dataclass
class Compensated:
    """Propagated barycentric astrometry at the solution epoch."""

    ra2: jax.Array         # deg
    dec2: jax.Array        # deg
    parallax2: jax.Array   # mas
    pmra2: jax.Array       # mas/yr
    pmdec2: jax.Array      # mas/yr
    rv2: jax.Array         # m/s
    distance2_pc: jax.Array
    t_em_days: jax.Array   # emission epoch (MJD days)


@_pytree_dataclass
class AbsoluteVisualOrbit:
    """AbsoluteVisual{KepOrbit}."""

    a: jax.Array
    e: jax.Array
    i: jax.Array
    omega: jax.Array
    Omega: jax.Array
    tp: jax.Array
    M: jax.Array
    plx: jax.Array
    ra: jax.Array          # deg, at ref_epoch
    dec: jax.Array         # deg, at ref_epoch
    rv: jax.Array          # m/s
    pmra: jax.Array        # mas/yr
    pmdec: jax.Array       # mas/yr
    ref_epoch: jax.Array   # MJD

    @classmethod
    def from_params(cls, **kw):
        kw = _resolve_aliases(kw)
        if "rv" not in kw:
            kw["rv"] = 0.0
        return cls(
            **_pick(
                kw,
                "a", "e", "i", "omega", "Omega", "tp", "M", "plx",
                "ra", "dec", "rv", "pmra", "pmdec", "ref_epoch",
            )
        )


def _unit_vectors(ra_rad, dec_rad):
    cr, sr = jnp.cos(ra_rad), jnp.sin(ra_rad)
    cd, sd = jnp.cos(dec_rad), jnp.sin(dec_rad)
    rhat = jnp.stack([cr * cd, sr * cd, sd], axis=-1)
    phat = jnp.stack([-sr, cr, jnp.zeros_like(sr)], axis=-1)      # East
    qhat = jnp.stack([-cr * sd, -sr * sd, cd], axis=-1)           # North
    return rhat, phat, qhat


def propagate_astrometry(elem: AbsoluteVisualOrbit, t):
    """Epoch-propagate the barycentre to MJD t; returns Compensated."""
    t = jnp.asarray(t)
    ra0 = jnp.deg2rad(elem.ra)
    dec0 = jnp.deg2rad(elem.dec)
    d0 = 1000.0 / elem.plx * 1.0  # pc

    rhat, phat, qhat = _unit_vectors(ra0, dec0)

    # velocity in pc/julian-year
    mu_a = elem.pmra * MASYR_TO_RADYR    # rad/yr
    mu_d = elem.pmdec * MASYR_TO_RADYR
    v_r = elem.rv / IAU_AU_M * 86400.0 * JULIAN_YEAR_DAYS / IAU_PC2AU  # pc/yr
    v = d0 * (mu_a * phat + mu_d * qhat) + v_r * rhat  # pc/yr

    dt_yr = (t - elem.ref_epoch) / JULIAN_YEAR_DAYS
    b = d0 * rhat + v * dt_yr[..., None] if jnp.ndim(t) else d0 * rhat + v * dt_yr
    d_t = jnp.linalg.norm(b, axis=-1)
    rhat_t = b / d_t[..., None] if jnp.ndim(t) else b / d_t

    ra_t = jnp.arctan2(rhat_t[..., 1], rhat_t[..., 0])
    ra_t = jnp.mod(ra_t, 2 * jnp.pi)
    dec_t = jnp.arcsin(jnp.clip(rhat_t[..., 2], -1.0, 1.0))

    _, phat_t, qhat_t = _unit_vectors(ra_t, dec_t)
    pmra_t = jnp.sum(v * phat_t, axis=-1) / d_t / MASYR_TO_RADYR
    pmdec_t = jnp.sum(v * qhat_t, axis=-1) / d_t / MASYR_TO_RADYR
    rv_t = jnp.sum(v * rhat_t, axis=-1) / (86400.0 * JULIAN_YEAR_DAYS) * IAU_PC2AU * IAU_AU_M

    t_em = t - (d_t - d0) * PC_LT_DAYS

    return Compensated(
        ra2=jnp.rad2deg(ra_t),
        dec2=jnp.rad2deg(dec_t),
        parallax2=1000.0 / d_t,
        pmra2=pmra_t,
        pmdec2=pmdec_t,
        rv2=rv_t,
        distance2_pc=d_t,
        t_em_days=t_em,
    )


def orbitsolve_absolute(elem: AbsoluteVisualOrbit, t):
    """Solve the orbit at observation epoch t (MJD), with the Kepler
    phase evaluated at the light-travel-compensated emission epoch."""
    t = jnp.asarray(t)
    comp = propagate_astrometry(elem, t)

    EA, nu, r, X, Y, VX, VY = _solve_common(elem, comp.t_em_days, elem.a, elem.e)
    A, B, F, G = _thiele_innes_unit(elem)
    sw, cw = jnp.sin(elem.omega), jnp.cos(elem.omega)
    si = jnp.sin(elem.i)
    posx = B * X + G * Y
    posy = A * X + F * Y
    posz = si * (sw * X + cw * Y)
    vx = B * VX + G * VY
    vy = A * VX + F * VY
    vz = si * (sw * VX + cw * VY)
    plx_t = comp.parallax2
    sol = OrbitSolution(
        elem=elem,
        t=t,
        EA=EA,
        nu=nu,
        r=r,
        posx=posx,
        posy=posy,
        posz=posz,
        vx=vx,
        vy=vy,
        vz=vz,
        raoff_mas=posx * plx_t,
        decoff_mas=posy * plx_t,
        pmra_masyr=vx * plx_t * JULIAN_YEAR_DAYS,
        pmdec_masyr=vy * plx_t * JULIAN_YEAR_DAYS,
        radvel_ms=vz * AUDAY_TO_MS,
        compensated=comp,
    )
    return sol
