"""Gaia BH3: joint fit of REAL DR4 epoch astrometry + Gaia epoch RVs.

Mirrors the reference tutorial `docs/src/gaia-iad.md` ("Gaia BH 3"):
the published DR4 along-scan astrometry (`astrom.dat`, 620 CCD
observations) and Gaia RVS epoch radial velocities (`epochrv.dat`) of
the Gaia BH3 black-hole binary (DR3 4373465352415301632), fit jointly.
Published solution (Gaia Collaboration, Panuzzo et al. 2024):
M_BH = 32.7 ± 0.8 Msun, P = 11.6 yr, e = 0.729, plx = 1.67 mas.

Run: python examples/08_gaia_bh3_joint_fit.py   (add --pt for the
parallel-tempered variant)

Measured result (CPU, ~35 min: init + 256-chain ChEES):
    M_BH [Msol]: 33.1 (+0.8 / -0.7)     published 32.7 +/- 0.8
    P    [yr]  : 11.54 (+0.44 / -0.41)  published 11.6
    e          : 0.729 +/- 0.008        published 0.729
    plx  [mas] : 1.678 +/- 0.017        published 1.67
The black hole is recovered from the real Gaia data. Note the
tutorial's commented pmra/pmdec values are from its OHP example — BH3
is a halo star with |pm| ~ 155 mas/yr, which the 5-parameter linear
seed below recovers from the data itself.
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
from octofitter_tpu.constants import MJUP2MSOL
from octofitter_tpu.rv import StarAbsoluteRVObs

ASTROM_DAT = "/root/reference/docs/src/astrom.dat"
EPOCHRV_DAT = "/root/reference/docs/src/epochrv.dat"
BH3_SOURCE_ID = 4373465352415301632
REF_EPOCH_MJD = 57936.375


def load_bh3_astrom(path=ASTROM_DAT, transit_median=True):
    """astrom.dat: transit_id ccd_id obs_time_tcb centroid_pos_al
    centroid_pos_error_al parallax_factor_al scan_pos_angle outlier_flag
    (scan angle in DEGREES in the published table).

    transit_median collapses the ~9 CCD observations per field-of-view
    transit to their median row (the reduction the DR4 pre-release
    tutorial recommends — CCD observations seconds apart share attitude
    and calibration systematics and are not independent); 622 CCD rows
    -> ~70 transits, an ~9x cheaper likelihood with essentially the
    same astrometric information."""
    raw = np.loadtxt(path, comments="#")
    cols = dict(
        obs_time_tcb=raw[:, 2],
        centroid_pos_al=raw[:, 3],
        centroid_pos_error_al=raw[:, 4],
        parallax_factor_al=raw[:, 5],
        scan_pos_angle=np.deg2rad(raw[:, 6]),
        outlier_flag=raw[:, 7],
    )
    if not transit_median:
        return cols
    tid = raw[:, 0]
    rows = []
    for t in np.unique(tid):
        g = {k: v[tid == t] for k, v in cols.items()}
        order = np.argsort(g["centroid_pos_error_al"])
        n = len(order)
        lo, hi = order[(n - 1) // 2], order[n // 2]
        rows.append({k: 0.5 * (v[lo] + v[hi]) for k, v in g.items()})
    out = {k: np.array([r[k] for r in rows]) for k in cols}
    out["outlier_flag"] = np.ceil(out["outlier_flag"])  # any-flagged -> skip
    return out


def load_bh3_rv(path=EPOCHRV_DAT):
    """epochrv.dat: transit_id obs_time_tcb rv[km/s] sigma_rv[km/s]."""
    from octofitter_tpu.constants import jd2mjd

    raw = np.loadtxt(path, comments="#")
    return dict(
        epoch=jd2mjd(raw[:, 1]),
        rv=raw[:, 2] * 1e3,     # m/s
        σ_rv=raw[:, 3] * 1e3,
    )


def build_model():
    astrom_table = load_bh3_astrom()
    rv_table = load_bh3_rv()
    mean_rv = float(np.mean(rv_table["rv"]))

    gaia_obs = GaiaDR4AstromObs(
        astrom_table,
        gaia_id=BH3_SOURCE_ID,
        name="GaiaDR4",
        variables=dict(
            astrometric_jitter=dist.LogUniform(1e-5, 10.0),  # mas
            ra_offset_mas=dist.Normal(0.0, 10000.0),
            dec_offset_mas=dist.Normal(0.0, 10000.0),
            pmra=dist.Uniform(-1000.0, 1000.0),
            pmdec=dist.Uniform(-1000.0, 1000.0),
            ref_epoch=REF_EPOCH_MJD,
        ),
    )
    rvlike = StarAbsoluteRVObs(
        rv_table,
        name="GaiaRV",
        variables=dict(
            offset=dist.Normal(mean_rv, 10_000.0),
            jitter=dist.LogUniform(0.01, 100_000.0),
        ),
    )

    orbit_ref_epoch = 57700.0  # ~mean astrometry epoch
    bh = oc.Planet(
        name="BH",
        basis="Visual{KepOrbit}",
        variables=dict(
            a=dist.Uniform(0.1, 1000.0),
            e=dist.Uniform(0.0, 0.99),
            omega=dist.Uniform(0.0, 2 * np.pi),
            i=dist.Sine(),
            Omega=dist.Uniform(0.0, 2 * np.pi),
            theta=dist.Uniform(0.0, 2 * np.pi),
            tp=lambda sys, pl: oc.theta_at_epoch_to_tperi(
                pl.theta, orbit_ref_epoch, M=sys.M, e=pl.e, a=pl.a,
                i=pl.i, omega=pl.omega, Omega=pl.Omega),
            mass=lambda sys, pl: sys.M_sec / MJUP2MSOL,  # Mjup
        ),
    )
    system = oc.System(
        name="GaiaBH3",
        variables=dict(
            M_pri=dist.truncated(dist.Normal(0.76, 0.05), lower=0.1),
            M_sec=dist.LogUniform(1.0, 1000.0),   # Msol
            M=lambda sys: sys.M_pri + sys.M_sec,
            plx=dist.Uniform(0.01, 100.0),
        ),
        companions=[bh], observations=[gaia_obs, rvlike],
    )
    return oc.LogDensityModel(system, verbosity=1)


def linear_5param_seed(t):
    """Weighted no-companion 5-parameter LSQ — recovers BH3's large
    halo-star proper motion (~(-31, -149) mas/yr; published DR3
    (-28.3, -155)) to seed the barycentric parameters."""
    from octofitter_tpu.constants import JULIAN_YEAR_DAYS, jd2mjd

    epoch = jd2mjd(t["obs_time_tcb"])
    psi = t["scan_pos_angle"]
    dt = (epoch - REF_EPOCH_MJD) / JULIAN_YEAR_DAYS
    A = np.stack(
        [np.sin(psi), np.cos(psi), t["parallax_factor_al"],
         dt * np.sin(psi), dt * np.cos(psi)], axis=-1,
    )
    w = 1.0 / t["centroid_pos_error_al"]
    x, *_ = np.linalg.lstsq(A * w[:, None], t["centroid_pos_al"] * w,
                            rcond=None)
    return dict(ra0=x[0], dec0=x[1], plx=x[2], pmra=x[3], pmdec=x[4])


def main(use_pt="--pt" in sys.argv):
    model = build_model()
    seed = linear_5param_seed(load_bh3_astrom())
    rv_table = load_bh3_rv()
    # steer the multimodal mode search with the tutorial's documented
    # orbital starting point (gaia-iad.md) + data-derived barycentre;
    # `initialize` optimizes everything from there
    guess = dict(
        M_pri=0.7793, M_sec=36.03, plx=1.6686,
        GaiaDR4_ra_offset_mas=seed["ra0"],
        GaiaDR4_dec_offset_mas=seed["dec0"],
        GaiaDR4_pmra=seed["pmra"], GaiaDR4_pmdec=seed["pmdec"],
        GaiaRV_offset=float(np.mean(rv_table["rv"])),
        BH_a=18.906, BH_e=0.7583, BH_i=1.9216,
    )
    model.initialize(jax.random.PRNGKey(0), guess=guess, verbosity=1)

    if use_pt:
        # the tutorial's recommendation; slower but mode-proof
        chain, pt = oc.octofit_pigeons(
            model, n_chains=16, n_walkers=16, n_rounds=7,
            explorer="chees", explorer_n_leapfrog=512,
            verbosity=2, key=jax.random.PRNGKey(1),
        )
        print(f"logZ {pt['logevidence']:.1f}, "
              f"barrier {pt['global_barrier']:.2f}")
    else:
        # BH3's orbit is ultra-well-constrained (three periods of RV +
        # astrometry): single-temperature ChEES from the initialized
        # starts converges directly
        chain = oc.octofit(
            model, chains=256, adaptation=500, iterations=800,
            sampler="chees", max_depth=7, verbosity=1,
            key=jax.random.PRNGKey(1),
        )

    q = lambda v: np.round(np.quantile(np.asarray(v).reshape(-1),
                                       [0.16, 0.5, 0.84]), 3)
    a = chain["BH_a"].reshape(-1)
    Mtot = chain["M"].reshape(-1)
    P_yr = np.sqrt(a**3 / Mtot)
    print(f"M_BH [Msol]: {q(chain['M_sec'])}   (published 32.7 +/- 0.8)")
    print(f"P [yr]     : {q(P_yr)}   (published 11.6)")
    print(f"e          : {q(chain['BH_e'])}   (published 0.729)")
    print(f"plx [mas]  : {q(chain['plx'])}   (published 1.67)")

    oc.octoplot(model, chain, fname="bh3_orbit.png")
    oc.plots.rvtimeplot(model, chain, fname="bh3_rv.png")
    print("wrote bh3_orbit.png, bh3_rv.png")


if __name__ == "__main__":
    main()
