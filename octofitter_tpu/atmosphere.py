"""Atmosphere / evolution model grids.

TPU-native equivalent of `/root/reference/src/sonora.jl` and
`src/BHAC.jl`: differentiable interpolators over the Sonora Bobcat
photometry & cooling grids and the BHAC15 isochrones. The reference's
workflow (RBF fit of the sparse model grid -> dense regular grid ->
fast linear interpolation, autodiff-safe) is reproduced with
scipy host-side RBF gridding and a jnp bilinear lookup that
differentiates cleanly inside jit.

Data files are the standard published model grids (the reference
downloads them via DataDeps, `src/Octofitter.jl:166-343`); pass local
paths here since this environment has no network.
"""

from __future__ import annotations

import math
import re

import jax.numpy as jnp
import numpy as np

from .constants import MJUP2MSOL


def interp2d_bilinear(xgrid, ygrid, values):
    """Return a differentiable f(x, y) bilinear interpolator over a
    regular grid; out-of-domain -> NaN (matching the reference's
    extrapolation_bc=NaN)."""
    xgrid = jnp.asarray(xgrid)
    ygrid = jnp.asarray(ygrid)
    values = jnp.asarray(values)
    nx, ny = values.shape

    def f(x, y):
        x = jnp.asarray(x)
        y = jnp.asarray(y)
        fx = (x - xgrid[0]) / (xgrid[-1] - xgrid[0]) * (nx - 1)
        fy = (y - ygrid[0]) / (ygrid[-1] - ygrid[0]) * (ny - 1)
        i = jnp.clip(jnp.floor(fx).astype(int), 0, nx - 2)
        j = jnp.clip(jnp.floor(fy).astype(int), 0, ny - 2)
        tx = jnp.clip(fx - i, 0.0, 1.0)
        ty = jnp.clip(fy - j, 0.0, 1.0)
        v = (
            values[i, j] * (1 - tx) * (1 - ty)
            + values[i + 1, j] * tx * (1 - ty)
            + values[i, j + 1] * (1 - tx) * ty
            + values[i + 1, j + 1] * tx * ty
        )
        inside = (
            (x >= xgrid[0]) & (x <= xgrid[-1]) & (y >= ygrid[0]) & (y <= ygrid[-1])
        )
        return jnp.where(inside, v, jnp.nan)

    return f


def _rbf_to_grid(points, samples, xg, yg, epsilon=2.0):
    from scipy.interpolate import RBFInterpolator

    rbf = RBFInterpolator(points, samples, kernel="multiquadric", epsilon=epsilon)
    XX, YY = np.meshgrid(xg, yg, indexing="ij")
    flat = np.stack([XX.reshape(-1), YY.reshape(-1)], axis=-1)
    return rbf(flat).reshape(XX.shape)


# ---------------------------------------------------------------------------
_SONORA_MAG_COLS = [
    "Teff", "logg", "mass", "R_Rsun", "Y", "logKzz",
    "MKO_Y", "MKO_Z", "MKO_J", "MKO_H", "MKO_K", "MKO_Lp", "MKO_Mp",
    "TwoMASS_J", "TwoMASS_H", "TwoMASS_Ks",
    "Keck_Ks", "Keck_Lp", "Keck_Ms",
    "SDSS_gp", "SDSS_rp", "SDSS_ip", "SDSS_zp",
    "IRAC_36", "IRAC_45", "IRAC_57", "IRAC_79",
    "WISE_W1", "WISE_W2", "WISE_W3", "WISE_W4",
]


def _normalize_band(band: str) -> str:
    return band.replace("′", "p").replace("'", "p").replace(":", "")


def load_sonora_mag_table(path) -> dict:
    """Parse a Sonora Bobcat `mag_table±x.x` photometry file."""
    rows = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) < len(_SONORA_MAG_COLS):
                continue
            try:
                rows.append([float(p) for p in parts[: len(_SONORA_MAG_COLS)]])
            except ValueError:
                continue
    arr = np.asarray(rows)
    if arr.size == 0:
        raise ValueError(f"No data rows parsed from {path}")
    return {c: arr[:, i] for i, c in enumerate(_SONORA_MAG_COLS)}


def sonora_photometry_interpolator(band, catalog, metalicity="+0.0"):
    """(temperature_K, mass_Mjup) -> absolute magnitude in `band`
    (`sonora.jl:22-62`). `catalog` is the path to the photometry table
    file (e.g. `.../photometry_tables/mag_table+0.0`)."""
    band = _normalize_band(str(band))
    table = load_sonora_mag_table(catalog)
    if band not in table:
        raise KeyError(f"not a valid band: {band}; have {list(table)[6:]}")
    pts = np.stack([table["Teff"] / 10.0, table["mass"]], axis=-1)
    samples = table[band]
    tg = np.linspace(table["Teff"].min(), table["Teff"].max(), 200)
    mg = np.linspace(table["mass"].min(), table["mass"].max(), 200)
    grid = _rbf_to_grid(pts, samples, tg / 10.0, mg, epsilon=2.0)
    f = interp2d_bilinear(tg, mg, grid)
    return lambda teff_k, mass_mjup: f(teff_k, mass_mjup)


def sonora_cooling_interpolator(catalog, metalicity="+0.0"):
    """(age_Myr, mass_Mjup) -> Teff_K (`sonora.jl:66-130`). `catalog`
    is the path to an evolution `nc+0.0_co1.0_age` style table."""
    rows = []
    with open(catalog) as f:
        lines = [l for l in f if len(l.strip()) > 10]
    header = re.split(r"  +", lines[0].strip())
    header = [re.sub(r"\W", "", h).lower() for h in header][:6]
    for line in lines[1:]:
        parts = re.split(r"  +", line.strip())
        try:
            rows.append([float(p) for p in parts[:6]])
        except ValueError:
            continue
    arr = np.asarray(rows)
    cols = {h: arr[:, i] for i, h in enumerate(header)}
    age_myr = cols["agegyr"] * 1e3
    m_mjup = cols["mmsun"] / MJUP2MSOL
    teff = cols["teffk"]
    pts = np.stack([np.log(age_myr), m_mjup], axis=-1)
    ag = np.linspace(age_myr.min(), age_myr.max(), 2000)
    mg = np.linspace(m_mjup.min(), m_mjup.max(), 500)
    grid = _rbf_to_grid(pts, teff, np.log(ag), mg, epsilon=0.5)
    f = interp2d_bilinear(ag, mg, grid)
    return lambda age_myr_, mass_mjup: f(age_myr_, mass_mjup)


# ---------------------------------------------------------------------------
def load_bhac15(path) -> list[dict]:
    """Parse a BHAC15 track file into per-age record dicts
    (`BHAC.jl:4-105`)."""
    with open(path) as f:
        lines = f.read().splitlines()
    records = []
    age_gyr = None
    colnames = None
    block = []

    def flush():
        nonlocal block
        if age_gyr is not None and colnames and block:
            arr = np.asarray(block)
            rec = {c: arr[:, i] for i, c in enumerate(colnames[: arr.shape[1]])}
            rec["age_Gyr"] = np.full(arr.shape[0], age_gyr)
            records.append(rec)
        block = []

    for i, line in enumerate(lines):
        if "t (Gyr)" in line:
            flush()
            age_gyr = float(line.split("=")[-1])
            colnames = None
            continue
        if age_gyr is not None and colnames is None and re.search(r"M/Ms", line):
            colnames = [re.sub(r"\W", "_", c) for c in re.findall(r"[\w\./]+", line)]
            continue
        if age_gyr is not None and colnames:
            parts = line.split()
            try:
                block.append([float(p) for p in parts])
            except ValueError:
                continue
    flush()
    return records


def bhac15_mass_age_interpolator(path, column="Teff"):
    """(age_Myr, mass_Msun) -> `column` from the BHAC15 isochrones."""
    records = load_bhac15(path)
    ages, masses, vals = [], [], []
    for rec in records:
        key = column if column in rec else [k for k in rec if column in k][0]
        mcol = "M_Ms" if "M_Ms" in rec else list(rec.keys())[0]
        ages.append(rec["age_Gyr"] * 1e3)
        masses.append(rec[mcol])
        vals.append(rec[key])
    age = np.concatenate(ages)
    mass = np.concatenate(masses)
    val = np.concatenate(vals)
    pts = np.stack([np.log(age), mass], axis=-1)
    ag = np.linspace(age.min(), age.max(), 500)
    mg = np.linspace(mass.min(), mass.max(), 300)
    grid = _rbf_to_grid(pts, val, np.log(ag), mg, epsilon=0.5)
    f = interp2d_bilinear(ag, mg, grid)
    return lambda age_myr, mass_msun: f(age_myr, mass_msun)
