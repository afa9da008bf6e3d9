"""Additional orbit bases: FixedPosition and CartesianOrbit.

TPU-native equivalents of the reference's single-epoch fixed-position
shim (`/root/reference/src/orbit-models.jl:17-112`) and PlanetOrbits'
Cartesian state-vector basis (SURVEY.md section 2.5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import (
    AUDAY_TO_MS,
    GAUSSIAN_GRAV_CONST,
    JULIAN_YEAR_DAYS,
)
from .elements import (
    OrbitSolution,
    _pytree_dataclass,
    _resolve_aliases,
    _pick,
)


@_pytree_dataclass
class FixedPositionOrbit:
    """Visual{FixedPosition}: a single fixed sky offset, useful when
    only one epoch of data exists (`orbit-models.jl:17-112`).

    Constructed from (x, y[, z]) in AU, (ra, dec) in mas, or (sep, pa)
    (mas, rad), always with plx.
    """

    x: jax.Array     # AU, RA direction
    y: jax.Array     # AU, Dec direction
    z: jax.Array     # AU, line of sight
    plx: jax.Array   # mas

    @classmethod
    def from_params(cls, **kw):
        kw = _resolve_aliases(kw)
        plx = jnp.asarray(kw["plx"])
        z = jnp.asarray(kw.get("z", 0.0))
        if "x" in kw and "y" in kw:
            x = jnp.asarray(kw["x"])
            y = jnp.asarray(kw["y"])
        elif "ra" in kw and "dec" in kw:
            x = jnp.asarray(kw["ra"]) / plx
            y = jnp.asarray(kw["dec"]) / plx
        elif "sep" in kw and "pa" in kw:
            x = jnp.asarray(kw["sep"]) * jnp.sin(kw["pa"]) / plx
            y = jnp.asarray(kw["sep"]) * jnp.cos(kw["pa"]) / plx
        else:
            raise ValueError("pass x & y, ra & dec, or sep & pa (with plx)")
        return cls(x=x, y=y, z=z, plx=plx)


def orbitsolve_fixed(elem: FixedPositionOrbit, t):
    t = jnp.asarray(t)
    one = jnp.ones_like(t)
    zero = jnp.zeros_like(t)
    return OrbitSolution(
        elem=elem, t=t, EA=zero, nu=zero,
        r=jnp.hypot(elem.x * one, elem.y * one),
        posx=elem.x * one, posy=elem.y * one, posz=elem.z * one,
        vx=zero, vy=zero, vz=zero,
        raoff_mas=elem.x * elem.plx * one,
        decoff_mas=elem.y * elem.plx * one,
        pmra_masyr=zero, pmdec_masyr=zero, radvel_ms=zero,
    )


@_pytree_dataclass
class CartesianOrbit:
    """Orbit from a Cartesian state vector at a reference epoch.

    x, y, z [AU] in the sky frame (+x East, +y North, +z away from the
    observer), vx, vy, vz [AU/day], M [Msun], tref [MJD], plx [mas].
    Converted to Campbell elements at solve time (standard rv2el).
    """

    x: jax.Array
    y: jax.Array
    z: jax.Array
    vx: jax.Array
    vy: jax.Array
    vz: jax.Array
    M: jax.Array
    tref: jax.Array
    plx: jax.Array

    @classmethod
    def from_params(cls, **kw):
        kw = _resolve_aliases(kw)
        if "tref" not in kw:
            kw["tref"] = kw.get("ref_epoch", 57388.5)
        return cls(**_pick(kw, "x", "y", "z", "vx", "vy", "vz", "M", "tref", "plx"))


def cartesian_to_campbell(elem: CartesianOrbit):
    """State vector -> (a, e, i, omega, Omega, tp) in this framework's
    conventions (z away from observer; angular momentum etc. standard)."""
    mu = GAUSSIAN_GRAV_CONST**2 * elem.M  # AU^3 / day^2
    rvec = jnp.stack([elem.x, elem.y, elem.z])
    vvec = jnp.stack([elem.vx, elem.vy, elem.vz])
    r = jnp.linalg.norm(rvec)
    v2 = jnp.dot(vvec, vvec)

    hvec = jnp.cross(rvec, vvec)
    h = jnp.linalg.norm(hvec)
    # eccentricity vector
    evec = jnp.cross(vvec, hvec) / mu - rvec / r
    e = jnp.linalg.norm(evec)
    # semi-major axis from vis-viva
    a = 1.0 / (2.0 / r - v2 / mu)

    # The sky frame maps to the orbit frame used by our Thiele-Innes
    # projection: dec axis = "X ref direction" (node angle measured from
    # North). Inclination from h_z; our convention has the reference
    # plane = sky plane with +z away from the observer.
    # The sky frame (x=East, y=North, z=away) is LEFT-handed, so the
    # right-handed cross product yields h with an inverted z
    # interpretation: i = arccos(-h_z/h).
    i = jnp.arccos(jnp.clip(-hvec[2] / h, -1.0, 1.0))
    # ascending node vector n = z_hat x h
    nvec = jnp.stack([-hvec[1], hvec[0], jnp.zeros_like(h)])
    n = jnp.linalg.norm(nvec)
    # Omega measured in the sky plane from North (y) toward East (x):
    Omega = jnp.arctan2(nvec[0], nvec[1])
    # argument of periastron
    cos_w = jnp.dot(nvec, evec) / jnp.maximum(n * e, 1e-300)
    omega = jnp.arccos(jnp.clip(cos_w, -1.0, 1.0))
    omega = jnp.where(evec[2] < 0, 2 * jnp.pi - omega, omega)
    # true anomaly at tref
    cos_nu = jnp.dot(evec, rvec) / jnp.maximum(e * r, 1e-300)
    nu = jnp.arccos(jnp.clip(cos_nu, -1.0, 1.0))
    nu = jnp.where(jnp.dot(rvec, vvec) < 0, 2 * jnp.pi - nu, nu)
    # eccentric & mean anomaly -> tp
    E = 2 * jnp.arctan2(
        jnp.sqrt(1 - e) * jnp.sin(nu / 2), jnp.sqrt(1 + e) * jnp.cos(nu / 2)
    )
    Mano = E - e * jnp.sin(E)
    n_mot = jnp.sqrt(mu / a**3)  # rad/day
    tp = elem.tref - Mano / n_mot
    return a, e, i, omega, Omega, tp


def orbitsolve_cartesian(elem: CartesianOrbit, t):
    from .elements import VisualOrbit, orbitsolve

    a, e, i, omega, Omega, tp = cartesian_to_campbell(elem)
    vis = VisualOrbit(
        a=a, e=e, i=i, omega=omega, Omega=Omega, tp=tp, M=elem.M, plx=elem.plx
    )
    sol = orbitsolve(vis, t)
    # keep a reference to the original element
    import dataclasses

    return dataclasses.replace(sol, elem=elem)


# --------------------------------------------------------------------------
# Hyperbolic orbits (e > 1, a < 0) — `docs/src/index.md:34` capability
# --------------------------------------------------------------------------

@_pytree_dataclass
class HyperbolicOrbit:
    """Visual hyperbolic orbit, Campbell elements with e > 1 and a < 0
    (AU, standard convention; a > 0 input is negated). Covers the
    reference's hyperbolic-orbit support (`docs/src/index.md:34`,
    PlanetOrbits.jl e > 1 branch) with the same accessor surface as
    VisualOrbit; the solver is the guarded Newton on
    e sinh(H) - H = M with an implicit-diff JVP (`orbits/kepler.py`).
    """

    a: jax.Array       # semi-major axis [AU], negative
    e: jax.Array       # eccentricity > 1
    i: jax.Array       # inclination [rad]
    omega: jax.Array   # argument of periastron [rad]
    Omega: jax.Array   # longitude of ascending node [rad]
    tp: jax.Array      # periastron passage epoch [MJD]
    M: jax.Array       # total mass [Msun]
    plx: jax.Array     # parallax [mas]

    @classmethod
    def from_params(cls, **kw):
        kw = _resolve_aliases(kw)
        return cls(**_pick(kw, "a", "e", "i", "omega", "Omega", "tp", "M", "plx"))


def orbitsolve_hyperbolic(elem: HyperbolicOrbit, t):
    """Solve a hyperbolic orbit at epoch(s) t [MJD]."""
    from .kepler import kepler_solver_hyperbolic
    from .elements import _thiele_innes_unit

    t = jnp.asarray(t)
    a = -jnp.abs(elem.a)                       # enforce a < 0
    e = elem.e
    mu = GAUSSIAN_GRAV_CONST**2 * elem.M       # AU^3/day^2
    n = jnp.sqrt(mu / (-a) ** 3)               # rad/day
    MA = n * (t - elem.tp)
    H = kepler_solver_hyperbolic(MA, e)
    ch, sh = jnp.cosh(H), jnp.sinh(H)
    sq = jnp.sqrt(e**2 - 1.0)
    X = a * (ch - e)                           # r cos(nu)
    Y = -a * sq * sh                           # r sin(nu)
    r = a * (1.0 - e * ch)                     # = |a|(e cosh H - 1) > 0
    Hdot = n / (e * ch - 1.0)
    VX = a * sh * Hdot
    VY = -a * sq * ch * Hdot
    nu = jnp.arctan2(Y, X)

    A, B, F, G = _thiele_innes_unit(elem)
    sw, cw = jnp.sin(elem.omega), jnp.cos(elem.omega)
    si = jnp.sin(elem.i)
    posx = B * X + G * Y
    posy = A * X + F * Y
    posz = si * (sw * X + cw * Y)
    vx = B * VX + G * VY
    vy = A * VX + F * VY
    vz = si * (sw * VX + cw * VY)
    plx = elem.plx
    return OrbitSolution(
        elem=elem, t=t, EA=H, nu=nu, r=r,
        posx=posx, posy=posy, posz=posz, vx=vx, vy=vy, vz=vz,
        raoff_mas=posx * plx, decoff_mas=posy * plx,
        pmra_masyr=vx * plx * JULIAN_YEAR_DAYS,
        pmdec_masyr=vy * plx * JULIAN_YEAR_DAYS,
        radvel_ms=vz * AUDAY_TO_MS,
    )
