"""Gaia-4b from REAL Gaia DR4 pre-release epoch astrometry.

Mirrors the reference tutorial `docs/src/gaia-dr4-prerelease.md`: fit
the actual DR4 along-scan epoch astrometry of Gaia-4 (DR3 source
1457486023639239296) — the first planet discovered by Gaia astrometry
— and recover the published orbit (Stefansson et al. 2025:
P = 571.3 ± 1.4 d, m = 11.8 ± 0.7 Mjup).

The CSV (reference docs, ESA/DPAC data) holds 1077 CCD-level
observations; we reduce to per-transit medians of the AGIS-used rows,
seed the barycentric parameters with a 5-parameter linear fit (no
network: the DR3 catalog solution is not available offline), and
sample with parallel tempering (astrometry-only posteriors are
multimodal; same advice as the tutorial).

Run: python examples/07_gaia4_dr4_real_data.py

Measured result (CPU, ~35 min: init + 8 PT rounds):
    period [day]: 564.7 (+8.2 / -7.7)    published 571.3 +/- 1.4
    mass [Mjup] : 11.3  (+1.1 / -1.1)    published 11.8 +/- 0.7
    plx  [mas]  : 13.620 +/- 0.022
The planet is recovered from the real Gaia epoch astrometry; the wider
period uncertainty vs the published value reflects the simple
transit-median reduction (see the tutorial's note on binning).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import octofitter_tpu as oc
from octofitter_tpu import distributions as dist
from octofitter_tpu.astrom import GaiaDR4AstromObs
from octofitter_tpu.constants import JULIAN_YEAR_DAYS, MJUP2MSOL

GAIA4_CSV = "/root/reference/docs/src/gaia4_epoch_astrometry.csv"
GAIA4_SOURCE_ID = 1457486023639239296
REF_EPOCH_MJD = 57936.375  # Gaia DR4 reference epoch, J2017.5


def load_transit_level(csv_path=GAIA4_CSV):
    """CCD-level CSV -> per-transit median rows of the AGIS-used
    observations (the tutorial's recommended reduction)."""
    import pandas as pd

    df = pd.read_csv(csv_path, comment="#")
    df = df[df["used_by_agis_al"].astype(str).str.lower() == "true"]
    num_cols = [c for c in df.columns if c not in ("used_by_agis_al",)]
    rows = []
    for _, g in df.groupby("transit_id"):
        g = g.sort_values("centroid_pos_error_al")
        n = len(g)
        lo, hi = (n - 1) // 2, n // 2  # midpoint = median for numerics
        row = {}
        for c in num_cols:
            v = g[c].to_numpy()
            row[c] = 0.5 * (v[lo] + v[hi])
        rows.append(row)
    out = {c: np.array([r[c] for r in rows]) for c in rows[0]}
    order = np.argsort(out["epoch"])
    return {k: v[order] for k, v in out.items()}


def linear_5param_seed(t):
    """Weighted linear LSQ of the no-planet barycentric model — seeds
    (ra0, dec0, plx, pmra, pmdec) without the DR3 catalog."""
    psi = t["scan_pos_angle"]
    dt = (t["epoch"] - REF_EPOCH_MJD) / JULIAN_YEAR_DAYS
    A = np.stack(
        [np.sin(psi), np.cos(psi), t["parallax_factor_al"],
         dt * np.sin(psi), dt * np.cos(psi)], axis=-1,
    )
    w = 1.0 / t["centroid_pos_error_al"]
    x, *_ = np.linalg.lstsq(A * w[:, None], t["centroid_pos_al"] * w,
                            rcond=None)
    return dict(ra0=x[0], dec0=x[1], plx=x[2], pmra=x[3], pmdec=x[4])


def build_model(table):
    seed = linear_5param_seed(table)
    print("5-param seed:", {k: round(v, 3) for k, v in seed.items()})
    orbit_ref_epoch = float(np.mean(table["epoch"]))

    gaia_obs = GaiaDR4AstromObs(
        {k: table[k] for k in ("epoch", "scan_pos_angle", "centroid_pos_al",
                               "centroid_pos_error_al", "parallax_factor_al",
                               "outlier_flag")},
        gaia_id=GAIA4_SOURCE_ID,
        name="GaiaDR4",
        variables=dict(
            astrometric_jitter=dist.LogUniform(1e-5, 10.0),  # mas
            ra_offset_mas=dist.Normal(seed["ra0"], 100.0),
            dec_offset_mas=dist.Normal(seed["dec0"], 100.0),
            pmra=dist.Normal(seed["pmra"], 50.0),
            pmdec=dist.Normal(seed["pmdec"], 50.0),
            ref_epoch=REF_EPOCH_MJD,
        ),
    )
    b = oc.Planet(
        name="b", basis="Visual{KepOrbit}",
        variables=dict(
            a=dist.Uniform(0.05, 10.0),      # AU; Gaia-4b at ~1.17
            e=dist.Uniform(0.0, 0.99),
            omega=oc.UniformCircular(),
            i=dist.Sine(),
            Omega=oc.UniformCircular(),
            theta=oc.UniformCircular(),
            tp=lambda sys, pl: oc.theta_at_epoch_to_tperi(
                pl.theta, orbit_ref_epoch, M=sys.M, e=pl.e, a=pl.a,
                i=pl.i, omega=pl.omega, Omega=pl.Omega),
            mass=lambda sys, pl: sys.mass_b,
        ),
    )
    system = oc.System(
        name="Gaia4",
        variables=dict(
            M_pri=dist.truncated(dist.Normal(0.644, 0.02), lower=0.1),
            mass_b=dist.LogUniform(0.3, 100.0),            # Mjup
            M=lambda sys: sys.M_pri + sys.mass_b * MJUP2MSOL,
            plx=dist.truncated(
                dist.Normal(seed["plx"], max(1.0, 0.1 * abs(seed["plx"]))),
                lower=1.0,
            ),
        ),
        companions=[b], observations=[gaia_obs],
    )
    return oc.LogDensityModel(system, verbosity=1)


def main():
    table = load_transit_level()
    span_yr = (table["epoch"].max() - table["epoch"].min()) / 365.25
    print(f"{len(table['epoch'])} transits over {span_yr:.2f} yr")

    model = build_model(table)
    model.initialize(jax.random.PRNGKey(0), verbosity=1)

    chain, pt = oc.octofit_pigeons(
        model, n_chains=16, n_walkers=32, n_rounds=8,
        explorer="chees", explorer_n_leapfrog=512,
        verbosity=2, key=jax.random.PRNGKey(1),
    )

    a = chain["b_a"].reshape(-1)
    Mtot = chain["M"].reshape(-1)
    mb = chain["mass_b"].reshape(-1)
    P_day = np.sqrt(a**3 / Mtot) * 365.25
    q = lambda v: np.round(np.quantile(v, [0.16, 0.5, 0.84]), 3)
    print(f"period [day]: {q(P_day)}   (published 571.3 +/- 1.4)")
    print(f"a [AU]      : {q(a)}")
    print(f"e           : {q(chain['b_e'].reshape(-1))}")
    print(f"mass [Mjup] : {q(mb)}   (published 11.8 +/- 0.7)")
    print(f"plx [mas]   : {q(chain['plx'].reshape(-1))}")
    print(f"logZ {pt['logevidence']:.1f}, barrier {pt['global_barrier']:.2f}")

    oc.octoplot(model, chain, fname="gaia4_orbit.png")
    oc.plots.gaiastarplot(model, chain, fname="gaia4_starplot.png")
    print("wrote gaia4_orbit.png, gaia4_starplot.png")


if __name__ == "__main__":
    main()
