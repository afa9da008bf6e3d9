"""Gaia DR4 completeness mapping from a real GOST scan-law forecast.

Port of the reference's cluster workflow
`/root/reference/examples/completeness_dr4/` (setup.jl /
completeness_trial.jl / assemble_results.jl / submit.sh): map detection
completeness over a (mass, separation) grid for a star observed by Gaia
DR4, by injecting companions into the forecast scan epochs, simulating
along-scan measurements at the UEVA-single noise level, refitting, and
applying a recovery criterion.

The reference fans the grid out as a SLURM array over cluster nodes;
here the trials run sequentially in-process (each is a full
generate→fit cycle) — on a TPU pod, fan `completeness_jobs` across
hosts instead, one chip per batch of trials (the trials are
embarrassingly parallel, `analysis/completeness.py`).

The scan law is the real ESA GOST DR4-baseline forecast shipped with
the reference docs (GOST-42.03...--31.42...-dr4.csv); the parallax
factors come straight from the CSV, exactly like the reference's
`geocentre_position_query`-derived factors.

Run: python examples/11_dr4_completeness.py [--fast]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import octofitter_tpu as oc
from octofitter_tpu import distributions as dist
from octofitter_tpu.analysis.completeness import completeness_map
from octofitter_tpu.astrom.gaia_dr4 import GaiaDR4AstromObs
from octofitter_tpu.astrom.scanlaw import load_gost_csv
from octofitter_tpu.constants import MJUP2MSOL

GOST_DR4_CSV = (
    "/root/reference/docs/src/"
    "GOST-42.03733343244703--31.42348623214663-dr4.csv"
)
RA_DEG, DEC_DEG = 42.03733343244703, -31.42348623214663
REF_EPOCH_MJD = 57936.375  # DR4 reference epoch (J2017.5)

# UEVA-single noise model (completeness_trial.jl:30-33): attitude,
# along-scan and calibration terms in quadrature
SIGMA_ATT = SIGMA_AL = SIGMA_CAL = 0.04
SIGMA_TRUE = float(np.sqrt(SIGMA_ATT**2 + SIGMA_AL**2 + SIGMA_CAL**2))

FAST = "--fast" in sys.argv or os.environ.get("OCTOFITTER_TEST_MODE") == "unit"

# The reference maps 12x12x5 across a cluster; a single-process example
# uses a coarser grid (pass the full grid + a pod fan-out in production)
if FAST:
    MASSES = [2.0, 20.0]               # Mjup
    SEPARATIONS = [1.0, 5.0]           # AU
    N_TRIALS = 1
else:
    MASSES = list(np.geomspace(0.5, 50.0, 4))
    SEPARATIONS = list(np.geomspace(0.8, 15.0, 4))
    N_TRIALS = 2


def build_model():
    gost = load_gost_csv(GOST_DR4_CSV)
    n = len(gost["epoch"])
    span_yr = (gost["epoch"].max() - gost["epoch"].min()) / 365.25
    print(f"GOST DR4 forecast: {n} visibility windows over {span_yr:.1f} yr")

    table = dict(
        epoch=gost["epoch"],
        scan_pos_angle=gost["scanAngle_rad"],
        centroid_pos_al=np.zeros(n),
        centroid_pos_error_al=np.full(n, SIGMA_TRUE),
        parallax_factor_al=gost["parallaxFactorAlongScan"],
        outlier_flag=np.zeros(n),
    )
    orbit_ref_epoch = float(np.mean(table["epoch"]))

    gaia_obs = GaiaDR4AstromObs(
        table,
        gaia_id=0,
        name="GaiaDR4",
        variables=dict(
            astrometric_jitter=dist.LogUniform(1e-5, 10.0),  # mas
            ra_offset_mas=dist.Normal(0.0, 100.0),
            dec_offset_mas=dist.Normal(0.0, 100.0),
            pmra=dist.Uniform(-1000.0, 1000.0),
            pmdec=dist.Uniform(-1000.0, 1000.0),
            plx=lambda sys, obs: sys.plx,
            ref_epoch=REF_EPOCH_MJD,
        ),
    )
    b = oc.Planet(
        name="b", basis="Visual{KepOrbit}",
        variables=dict(
            a=dist.LogUniform(0.1, 100.0),
            e=dist.Uniform(0.0, 0.99),
            omega=oc.UniformCircular(),
            i=dist.Sine(),
            Omega=oc.UniformCircular(),
            theta=oc.UniformCircular(),
            tp=lambda sys, pl: oc.theta_at_epoch_to_tperi(
                pl.theta, orbit_ref_epoch, M=sys.M, e=pl.e, a=pl.a,
                i=pl.i, omega=pl.omega, Omega=pl.Omega),
            mass=dist.LogUniform(0.01, 1000.0),   # Mjup
        ),
    )
    system = oc.System(
        name="DR4_completeness",
        variables=dict(
            M_pri=1.0,
            plx=dist.truncated(dist.Normal(50.0, 0.5), lower=0.1),
            M=lambda s: s.M_pri,
        ),
        companions=[b], observations=[gaia_obs],
    )
    return oc.LogDensityModel(system, verbosity=0)


def detection(chain, theta_true):
    """completeness_trial.jl:137-146: detected iff the recovered mass
    median is within 3x of truth AND the 5th percentile excludes
    near-zero (0.1 Mjup)."""
    m = np.asarray(chain["b_mass"]).ravel()
    med, low = np.median(m), np.quantile(m, 0.05)
    true_mass = float(theta_true.planets["b"].mass)
    return (true_mass / 3 < med < true_mass * 3) and (low > 0.1)


def sampler(model):
    return oc.octofit(model, chains=16, adaptation=250, iterations=250,
                      verbosity=0)


def main():
    model = build_model()
    t0 = time.time()
    cmap, results = completeness_map(
        model, sampler, detection,
        inject=lambda m, s: {"b_mass": m, "b_a": s},
        masses=MASSES, separations=SEPARATIONS, n_trials=N_TRIALS,
        add_noise=True, seed=0, verbosity=1,
    )
    dt = time.time() - t0
    print(f"{len(results)} trials in {dt:.0f} s")
    print("masses [Mjup]:", np.round(cmap.masses, 2))
    print("separations [AU]:", np.round(cmap.separations, 2))
    print("completeness:\n", cmap.completeness)

    from octofitter_tpu.plots import completenessplot

    completenessplot(cmap, fname="dr4_completeness.png")
    print("saved dr4_completeness.png")

    # Heavy companions at wide-ish separations produce ~mas wobbles
    # against a 70 uas noise floor: the top-right of the grid must be
    # recovered; the bottom-left (sub-Jupiter at <1 AU here) can fail.
    assert cmap.completeness[-1, -1] == 1.0 or cmap.n_total[-1, -1] == 0
    return cmap


if __name__ == "__main__":
    main()
