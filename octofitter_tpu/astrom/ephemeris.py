"""Earth ephemeris for parallax factors.

Replaces the reference's SPICE/DE440 geocentre queries
(`/root/reference/src/likelihoods/gaia-utils.jl:101-181`). The default
is a compact analytic solar ephemeris (Astronomical Almanac
low-precision series, ~1e-4 AU in position) evaluated host-side; for
higher precision, pass a precomputed (epoch, x, y, z) table to any
likelihood that accepts `earth_table` and it will be interpolated
instead.

Convention matches the reference IAD usage: (x, y, z) is the position
of the Earth geocentre relative to the solar-system barycentre in
*equatorial* coordinates, in AU, so the parallax deflections are
  d(alpha*) = plx * (x sin(a) - y cos(a))
  d(delta)  = plx * (x cos(a) sin(d) + y sin(a) sin(d) - z cos(d)).
"""

from __future__ import annotations

import numpy as np

from ..constants import J2000_MJD


def earth_position_au(mjd):
    """Approximate Earth barycentric position (equatorial, AU).

    Low-precision almanac series for the Sun's geocentric position,
    negated (Earth = -Sun geocentric), plus nothing for the
    Earth-Moon-barycentre/planetary terms (~5e-3 AU worst case).
    """
    mjd = np.asarray(mjd, dtype=np.float64)
    n = mjd - J2000_MJD
    # mean longitude and mean anomaly of the Sun (deg)
    L = np.deg2rad(np.mod(280.460 + 0.9856474 * n, 360.0))
    g = np.deg2rad(np.mod(357.528 + 0.9856003 * n, 360.0))
    lam = L + np.deg2rad(1.915) * np.sin(g) + np.deg2rad(0.020) * np.sin(2 * g)
    R = 1.00014 - 0.01671 * np.cos(g) - 0.00014 * np.cos(2 * g)
    eps = np.deg2rad(23.439 - 4.0e-7 * n)
    # Sun geocentric equatorial position
    xs = R * np.cos(lam)
    ys = R * np.cos(eps) * np.sin(lam)
    zs = R * np.sin(eps) * np.sin(lam)
    # Earth position relative to the Sun (≈ barycentre)
    return {"x": -xs, "y": -ys, "z": -zs}


def earth_position_from_table(mjd, earth_table):
    """Interpolate a user-supplied ephemeris table
    {'epoch','x','y','z'} at the requested epochs."""
    mjd = np.asarray(mjd, dtype=np.float64)
    ep = np.asarray(earth_table["epoch"], dtype=np.float64)
    return {
        k: np.interp(mjd, ep, np.asarray(earth_table[k], dtype=np.float64))
        for k in ("x", "y", "z")
    }


def geocentre_position_query(mjd, earth_table=None):
    """Earth (x, y, z) in AU at the given MJD epochs; uses the analytic
    series unless an ephemeris table is provided."""
    if earth_table is not None:
        return earth_position_from_table(mjd, earth_table)
    return earth_position_au(mjd)
