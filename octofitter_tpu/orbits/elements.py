"""Orbit element types, solver, and solution accessors.

TPU-native replacement for the reference's L0 layer (PlanetOrbits.jl,
re-exported at `/root/reference/src/Octofitter.jl:26-27`; observable API
surface catalogued in SURVEY.md section 2.5). Conventions match
Orbitize!/PlanetOrbits (`docs/src/kepler.md:4`):

  - Elements: a [AU], e, i [rad], omega (argument of periastron of the
    *companion*, rad), Omega (longitude of ascending node, rad),
    tp [MJD], M (total mass, Msun), plx [mas].
  - Sky frame: +RA offset East, +Dec offset North, +z *away* from the
    observer, so ``radvel`` > 0 means receding.
  - Thiele-Innes matrix (Campbell -> sky, verified against
    `src/parameterizations.jl:34-37`):
        A =  cosO*cosw - sinO*sinw*cosi     (Dec row)
        B =  sinO*cosw + cosO*sinw*cosi     (RA row)
        F = -cosO*sinw - sinO*cosw*cosi
        G = -sinO*sinw + cosO*cosw*cosi
    with in-plane coordinates X = a(cosE - e), Y = a sqrt(1-e^2) sinE:
        dec = A*X + F*Y ; ra = B*X + G*Y ; z = sini*(sinw*X + cosw*Y).
  - Mass-weighted accessors (e.g. ``raoff(sol, m)``) return the *host
    star's reflex*: -(m/Mtot) x companion quantity (sign verified against
    `src/likelihoods/gaia-utils.jl:636-642` "Host reflex = -B_k rho").

Design (TPU-first): element types are registered pytree dataclasses of
traced scalars; ``orbitsolve(elem, t)`` broadcasts over an epoch array and
returns an ``OrbitSolution`` whose fields are arrays — the whole-system
pre-solve of `src/likelihoods/system.jl:131-171` becomes a single fused
vectorized call, vmappable over chains.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..constants import (
    AUDAY_TO_MS,
    JULIAN_YEAR_DAYS,
    KEPLER_YEAR_DAYS,
)
from .kepler import kepler_solver


def _pytree_dataclass(cls):
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


def _pick(kw, *names):
    return {k: jnp.asarray(kw[k]) for k in names}


# --------------------------------------------------------------------------
# Element types
# --------------------------------------------------------------------------

@_pytree_dataclass
class KepOrbit:
    """Campbell elements, no parallax (physical units only)."""

    a: jax.Array      # semi-major axis [AU]
    e: jax.Array      # eccentricity
    i: jax.Array      # inclination [rad]
    omega: jax.Array  # argument of periastron [rad]
    Omega: jax.Array  # longitude of ascending node [rad]
    tp: jax.Array     # epoch of periastron [MJD]
    M: jax.Array      # total mass [Msun]

    @classmethod
    def from_params(cls, **kw):
        kw = _resolve_aliases(kw)
        return cls(**_pick(kw, "a", "e", "i", "omega", "Omega", "tp", "M"))


@_pytree_dataclass
class VisualOrbit:
    """Visual{KepOrbit}: Campbell elements + parallax for on-sky angles."""

    a: jax.Array
    e: jax.Array
    i: jax.Array
    omega: jax.Array
    Omega: jax.Array
    tp: jax.Array
    M: jax.Array
    plx: jax.Array    # parallax [mas]

    @classmethod
    def from_params(cls, **kw):
        kw = _resolve_aliases(kw)
        return cls(**_pick(kw, "a", "e", "i", "omega", "Omega", "tp", "M", "plx"))


@_pytree_dataclass
class ThieleInnesOrbit:
    """Thiele-Innes linear elements A,B,F,G [mas] (+ e, tp, M, plx)."""

    e: jax.Array
    A: jax.Array
    B: jax.Array
    F: jax.Array
    G: jax.Array
    tp: jax.Array
    M: jax.Array
    plx: jax.Array

    @classmethod
    def from_params(cls, **kw):
        kw = _resolve_aliases(kw)
        return cls(**_pick(kw, "e", "A", "B", "F", "G", "tp", "M", "plx"))


@_pytree_dataclass
class RadialVelocityOrbit:
    """RV-only orbit: no inclination/node (sin(i)=1 convention)."""

    a: jax.Array
    e: jax.Array
    omega: jax.Array
    tp: jax.Array
    M: jax.Array

    @classmethod
    def from_params(cls, **kw):
        kw = _resolve_aliases(kw)
        return cls(**_pick(kw, "a", "e", "omega", "tp", "M"))


def _resolve_aliases(kw):
    """Accept unicode names (as used in reference docs) and P->a."""
    kw = dict(kw)
    alias = {"ω": "omega", "Ω": "Omega", "ϖ": "plx", "τ": "tau"}
    for old, new in alias.items():
        if old in kw and new not in kw:
            kw[new] = kw.pop(old)
    if "a" not in kw and "P" in kw and "M" in kw:
        # P in days -> a via Kepler's third law
        P_kepler_years = jnp.asarray(kw["P"]) / KEPLER_YEAR_DAYS
        kw["a"] = jnp.cbrt(kw["M"] * P_kepler_years**2)
    return kw


# --------------------------------------------------------------------------
# Derived element quantities
# --------------------------------------------------------------------------

def semimajoraxis(elem):
    """Semi-major axis in AU (for TI orbits, derived from A,B,F,G & plx)."""
    if isinstance(elem, ThieleInnesOrbit):
        u = (elem.A**2 + elem.B**2 + elem.F**2 + elem.G**2) / 2
        v = elem.A * elem.G - elem.B * elem.F
        alpha = jnp.sqrt(u + jnp.sqrt((u + v) * (u - v)))  # [mas]
        return alpha / elem.plx
    if not hasattr(elem, "a"):
        # FixedPosition-style bases (`orbit-models.jl:33`)
        return jnp.asarray(0.0)
    return elem.a


def eccentricity(elem):
    return elem.e


def totalmass(elem):
    return elem.M


def periastron(elem):
    return elem.tp


def period(elem):
    """Orbital period in days."""
    a = semimajoraxis(elem)
    return jnp.sqrt(a**3 / elem.M) * KEPLER_YEAR_DAYS


def meanmotion(elem):
    """Mean motion in rad/day."""
    return 2 * jnp.pi / period(elem)


def periapsis(elem):
    """Periapsis distance [AU]."""
    return semimajoraxis(elem) * (1 - elem.e)


def apoapsis(elem):
    """Apoapsis distance [AU]."""
    return semimajoraxis(elem) * (1 + elem.e)


def distance_pc(elem):
    """Distance in parsecs from parallax."""
    return 1000.0 / elem.plx


def _thiele_innes_unit(elem):
    """Unitless Thiele-Innes constants from Campbell elements."""
    cw, sw = jnp.cos(elem.omega), jnp.sin(elem.omega)
    cO, sO = jnp.cos(elem.Omega), jnp.sin(elem.Omega)
    ci = jnp.cos(elem.i)
    A = cO * cw - sO * sw * ci
    B = sO * cw + cO * sw * ci
    F = -cO * sw - sO * cw * ci
    G = -sO * sw + cO * cw * ci
    return A, B, F, G


def thiele_innes_to_campbell(A, B, F, G):
    """(A,B,F,G) -> (alpha, i, omega, Omega). alpha in input units.

    Standard inversion (used for TI radial velocities and the NSS
    conversion, reference `src/nss.jl:502`).

    Note the inherent node degeneracy: (omega, Omega) and
    (omega+pi, Omega+pi) give identical A,B,F,G but opposite
    line-of-sight position/velocity. This inversion returns the branch
    with omega+Omega and omega-Omega each in (-pi, pi]; radial
    velocities derived from TI elements are sign-ambiguous without RV
    data to break the degeneracy.
    """
    wpO = jnp.arctan2(B - F, A + G)
    wmO = jnp.arctan2(-(B + F), A - G)
    q1 = jnp.hypot(A + G, B - F)   # alpha (1 + cos i)
    q2 = jnp.hypot(A - G, B + F)   # alpha (1 - cos i)
    alpha = (q1 + q2) / 2
    cosi = (q1 - q2) / (q1 + q2)
    i = jnp.arccos(jnp.clip(cosi, -1.0, 1.0))
    omega = (wpO + wmO) / 2
    Omega = (wpO - wmO) / 2
    return alpha, i, omega, Omega


# --------------------------------------------------------------------------
# Solutions
# --------------------------------------------------------------------------

@_pytree_dataclass
class OrbitSolution:
    """Orbit solved at epoch(s) t, with all on-sky observables cached.

    Fields broadcast with t; under vmap over chains everything stays
    fused. Angles in mas, velocities: pm* in mas/yr, radvel in m/s,
    positions pos* in AU.
    """

    elem: object
    t: jax.Array
    EA: jax.Array        # eccentric anomaly [rad]
    nu: jax.Array        # true anomaly [rad]
    r: jax.Array         # physical separation [AU]
    posx: jax.Array      # RA-direction offset [AU] (East +)
    posy: jax.Array      # Dec-direction offset [AU] (North +)
    posz: jax.Array      # line-of-sight offset [AU] (+ away from observer)
    vx: jax.Array        # d(posx)/dt [AU/day]
    vy: jax.Array        # d(posy)/dt [AU/day]
    vz: jax.Array        # d(posz)/dt [AU/day]
    raoff_mas: jax.Array
    decoff_mas: jax.Array
    pmra_masyr: jax.Array
    pmdec_masyr: jax.Array
    radvel_ms: jax.Array
    # AbsoluteVisual orbits attach propagated barycentric astrometry here
    # (a Compensated dataclass); None for plain orbits.
    compensated: object = None


def _solve_common(elem, t, a, e):
    """Kepler solve + in-plane coords shared by all element types."""
    P = jnp.sqrt(a**3 / elem.M) * KEPLER_YEAR_DAYS
    n = 2 * jnp.pi / P                          # rad/day
    MA = n * (t - elem.tp)
    EA = kepler_solver(MA, e)
    sE, cE = jnp.sin(EA), jnp.cos(EA)
    sq = jnp.sqrt(1 - e**2)
    X = a * (cE - e)
    Y = a * sq * sE
    Edot = n / (1 - e * cE)                     # rad/day
    VX = -a * sE * Edot
    VY = a * sq * cE * Edot
    nu = jnp.arctan2(Y, X)
    r = a * (1 - e * cE)
    return EA, nu, r, X, Y, VX, VY


def orbitsolve(elem, t):
    """Solve the orbit at epoch(s) t [MJD] -> OrbitSolution.

    Replaces the reference's `orbitsolve` + `_kepsolve_all!` pre-solve
    loop (`src/likelihoods/system.jl:250-268`): t may be the full packed
    epoch array, producing one vectorized solution.
    """
    t = jnp.asarray(t)

    if isinstance(elem, (KepOrbit, VisualOrbit)):
        a, e = elem.a, elem.e
        EA, nu, r, X, Y, VX, VY = _solve_common(elem, t, a, e)
        A, B, F, G = _thiele_innes_unit(elem)
        sw, cw = jnp.sin(elem.omega), jnp.cos(elem.omega)
        si = jnp.sin(elem.i)
        posx = B * X + G * Y
        posy = A * X + F * Y
        posz = si * (sw * X + cw * Y)
        vx = B * VX + G * VY
        vy = A * VX + F * VY
        vz = si * (sw * VX + cw * VY)
        if isinstance(elem, VisualOrbit):
            plx = elem.plx
        else:
            plx = jnp.full_like(X, jnp.nan)
        raoff = posx * plx
        decoff = posy * plx
        pmra = vx * plx * JULIAN_YEAR_DAYS
        pmdec = vy * plx * JULIAN_YEAR_DAYS
        radvel = vz * AUDAY_TO_MS

    elif isinstance(elem, ThieleInnesOrbit):
        a = semimajoraxis(elem)
        e = elem.e
        EA, nu, r, X, Y, VX, VY = _solve_common(elem, t, a, e)
        # X, Y are in AU; the TI constants carry the mas scale, so the
        # on-sky projection uses the unit (a=1) in-plane coordinates.
        Xu, Yu, VXu, VYu = X / a, Y / a, VX / a, VY / a
        raoff = elem.B * Xu + elem.G * Yu
        decoff = elem.A * Xu + elem.F * Yu
        pmra = (elem.B * VXu + elem.G * VYu) * JULIAN_YEAR_DAYS
        pmdec = (elem.A * VXu + elem.F * VYu) * JULIAN_YEAR_DAYS
        # physical quantities via TI -> Campbell inversion
        _, inc, omega, _ = thiele_innes_to_campbell(elem.A, elem.B, elem.F, elem.G)
        si = jnp.sin(inc)
        sw, cw = jnp.sin(omega), jnp.cos(omega)
        vz = si * (sw * VX + cw * VY)              # AU/day
        posx = raoff / elem.plx
        posy = decoff / elem.plx
        posz = si * (sw * X + cw * Y)
        vx = VX
        vy = VY
        radvel = vz * AUDAY_TO_MS

    elif isinstance(elem, RadialVelocityOrbit):
        a, e = elem.a, elem.e
        EA, nu, r, X, Y, VX, VY = _solve_common(elem, t, a, e)
        sw, cw = jnp.sin(elem.omega), jnp.cos(elem.omega)
        posz = sw * X + cw * Y      # sin(i) = 1
        vz = sw * VX + cw * VY
        nanlike = jnp.full_like(X, jnp.nan)
        posx = posy = vx = vy = nanlike
        raoff = decoff = pmra = pmdec = nanlike
        radvel = vz * AUDAY_TO_MS

    else:
        from .absolute_visual import AbsoluteVisualOrbit, orbitsolve_absolute
        from .extra_bases import (
            CartesianOrbit,
            FixedPositionOrbit,
            HyperbolicOrbit,
            orbitsolve_cartesian,
            orbitsolve_fixed,
            orbitsolve_hyperbolic,
        )

        if isinstance(elem, AbsoluteVisualOrbit):
            return orbitsolve_absolute(elem, t)
        if isinstance(elem, FixedPositionOrbit):
            return orbitsolve_fixed(elem, t)
        if isinstance(elem, CartesianOrbit):
            return orbitsolve_cartesian(elem, t)
        if isinstance(elem, HyperbolicOrbit):
            return orbitsolve_hyperbolic(elem, t)
        raise TypeError(f"Unsupported orbit element type {type(elem).__name__}")

    return OrbitSolution(
        elem=elem, t=t, EA=EA, nu=nu, r=r,
        posx=posx, posy=posy, posz=posz, vx=vx, vy=vy, vz=vz,
        raoff_mas=raoff, decoff_mas=decoff,
        pmra_masyr=pmra, pmdec_masyr=pmdec, radvel_ms=radvel,
    )


# --------------------------------------------------------------------------
# Solution accessors (PlanetOrbits API surface, SURVEY.md section 2.5)
# --------------------------------------------------------------------------

def _reflex_factor(sol, mass):
    """-(m_companion / M_total): host-reflex weighting."""
    return -mass / totalmass(sol.elem)


def raoff(sol, mass=None):
    if mass is None:
        return sol.raoff_mas
    return _reflex_factor(sol, mass) * sol.raoff_mas


def decoff(sol, mass=None):
    if mass is None:
        return sol.decoff_mas
    return _reflex_factor(sol, mass) * sol.decoff_mas


def pmra(sol, mass=None):
    if mass is None:
        return sol.pmra_masyr
    return _reflex_factor(sol, mass) * sol.pmra_masyr


def pmdec(sol, mass=None):
    if mass is None:
        return sol.pmdec_masyr
    return _reflex_factor(sol, mass) * sol.pmdec_masyr


def radvel(sol, mass=None):
    if mass is None:
        return sol.radvel_ms
    return _reflex_factor(sol, mass) * sol.radvel_ms


def posx(sol, mass=None):
    if mass is None:
        return sol.posx
    return _reflex_factor(sol, mass) * sol.posx


def posy(sol, mass=None):
    if mass is None:
        return sol.posy
    return _reflex_factor(sol, mass) * sol.posy


def posz(sol, mass=None):
    if mass is None:
        return sol.posz
    return _reflex_factor(sol, mass) * sol.posz


def projectedseparation(sol):
    """Projected separation in mas."""
    return jnp.hypot(sol.raoff_mas, sol.decoff_mas)


def posangle(sol):
    """Position angle, North through East [rad]."""
    return jnp.arctan2(sol.raoff_mas, sol.decoff_mas)


def meananom(sol):
    return meanmotion(sol.elem) * (sol.t - sol.elem.tp)


def eccanom(sol):
    return sol.EA


def trueanom(sol):
    return sol.nu


def soltime(sol):
    return sol.t
