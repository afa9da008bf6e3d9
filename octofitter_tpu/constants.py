"""Physical and time constants.

TPU-native re-implementation of the constants used by the reference
(`/root/reference/src/units.jl:1-21` and PlanetOrbits.jl conventions).
All values are plain Python floats: they are baked into jitted programs
as compile-time constants.
"""

import math
import datetime

# --- time ---------------------------------------------------------------
# Julian year in days (`units.jl:7`).
JULIAN_YEAR_DAYS = 365.25
SEC_PER_JULIAN_YEAR = 60 * 60 * 24 * JULIAN_YEAR_DAYS

# The "Kepler year": orbital period in days of a 1 AU, 1 Msun orbit.
# P = 2*pi / k where k is the Gaussian gravitational constant
# (0.01720209895 rad/day). PlanetOrbits.jl calls this
# `kepler_year_to_julian_day_conversion_factor` (see reference
# `src/parameterizations.jl:62`).
GAUSSIAN_GRAV_CONST = 0.01720209894846  # rad/day, IAU 1976 value
KEPLER_YEAR_DAYS = 2 * math.pi / GAUSSIAN_GRAV_CONST

# Hipparcos catalog epoch J1991.25 in MJD (`units.jl:11`).
HIPPARCOS_EPOCH_MJD = 48348.5625

# MJD of J2000.0
J2000_MJD = 51544.5

# --- distances ----------------------------------------------------------
IAU_PC2AU = 648_000 / math.pi          # parsecs -> AU  (`units.jl:13`)
IAU_AU_M = 149_597_870_700             # AU in meters   (`units.jl:14`)
IAU_PC2KM = IAU_PC2AU * IAU_AU_M / 1e3

# radians -> arcseconds
RAD2AS = 206264.80624709636
# AU/day -> m/s
AUDAY_TO_MS = IAU_AU_M / 86400.0
# Jupiter mass in solar masses (PlanetOrbits `mjup2msol`)
MJUP2MSOL = 0.0009545942339693249
# Earth mass in solar masses
MEARTH2MSOL = 3.0034893488507934e-6


# --- time conversion helpers (host-side, not traced) --------------------
def mjd2jd(mjd: float) -> float:
    """Modified Julian Date -> Julian Date (`units.jl:18`)."""
    return mjd + 2400000.5


def jd2mjd(jd: float) -> float:
    """Julian Date -> Modified Julian Date (`units.jl:19`)."""
    return jd - 2400000.5


def mjd(date: str | None = None) -> float:
    """MJD of an ISO date string like "2020-01-01" (or now if None).

    Mirrors the reference's `mjd("2020-01-01")` helper
    (`docs/src/api.md:15`).
    """
    if date is None:
        dt = datetime.datetime.now(datetime.timezone.utc)
    else:
        dt = datetime.datetime.fromisoformat(date)
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=datetime.timezone.utc)
    # JD of the Unix epoch 1970-01-01T00:00:00Z is 2440587.5
    unix = dt.timestamp()
    jd = unix / 86400.0 + 2440587.5
    return jd2mjd(jd)


def years2mjd(decimal_year: float) -> float:
    """Decimal Julian year -> MJD (e.g. 2016.0 -> 57388.5)."""
    return (decimal_year - 2000.0) * JULIAN_YEAR_DAYS + J2000_MJD


def mjd2years(mjd_val: float) -> float:
    """MJD -> decimal Julian year."""
    return (mjd_val - J2000_MJD) / JULIAN_YEAR_DAYS + 2000.0
