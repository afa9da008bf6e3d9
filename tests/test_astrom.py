"""Absolute astrometry stack tests: 5-param fits, skypath perturbations,
Hipparcos IAD, Gaia catalog fit, HGCA linfit, Gaia DR4.

Strategy per SURVEY.md section 4/5: validate each channel against
closed-form expectations and pulls at truth.
"""

import io
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import octofitter_tpu as oc
from octofitter_tpu import distributions as dist
from octofitter_tpu.constants import (
    HIPPARCOS_EPOCH_MJD,
    JULIAN_YEAR_DAYS,
    MJUP2MSOL,
)
from octofitter_tpu.astrom import (
    GaiaDR4AstromObs,
    HGCAObs,
    HipparcosIADObs,
    GaiaCatalogFitObs,
    fit_5param,
    hippacentre_combined,
    prepare_A_5param,
    skypath_perturbations_linear,
    earth_position_au,
)
from octofitter_tpu.model.generate import generate_from_params
from octofitter_tpu.model.logdensity import LogDensityModel
from octofitter_tpu.orbits import AbsoluteVisualOrbit, VisualOrbit, orbitsolve, raoff, decoff


# ---------------------------------------------------------------------------
def test_earth_position_magnitude():
    mjd = np.linspace(48000, 59000, 500)
    pos = earth_position_au(mjd)
    r = np.sqrt(pos["x"] ** 2 + pos["y"] ** 2 + pos["z"] ** 2)
    # barycentric: heliocentric 0.983-1.017 AU plus the Sun's own
    # barycentric offset (up to ~0.01 AU)
    assert np.all(np.abs(r - 1.0) < 0.03)
    # one-year periodicity
    p0 = earth_position_au(55000.0)
    p1 = earth_position_au(55000.0 + 365.25)
    assert abs(p0["x"] - p1["x"]) < 0.02


def _synth_scans(n=60, seed=0, t0=56000.0, t1=57000.0):
    rng = np.random.default_rng(seed)
    epoch = np.sort(rng.uniform(t0, t1, n))
    angle = rng.uniform(0, 2 * np.pi, n)
    cosphi, sinphi = np.cos(angle), np.sin(angle)
    parf = rng.uniform(-0.7, 0.7, n)
    return dict(epoch=epoch, cosphi=cosphi, sinphi=sinphi,
                parallaxFactorAlongScan=parf)


def test_fit_5param_recovers_injected_solution():
    t = _synth_scans()
    ref = 56500.0
    A = prepare_A_5param(t["epoch"], t["cosphi"], t["sinphi"],
                         t["parallaxFactorAlongScan"], ref, ref)
    true = dict(da=1.5, dd=-2.0, dplx=0.7, dpmra=3.0, dpmdec=-1.0)
    dt = (t["epoch"] - ref) / JULIAN_YEAR_DAYS
    # build (dalpha, ddelta) whose scan projection matches A @ x
    dalpha = true["da"] + true["dpmra"] * dt
    ddelta = true["dd"] + true["dpmdec"] * dt
    # parallax enters along-scan only; emulate via residuals term
    resid = -true["dplx"] * t["parallaxFactorAlongScan"]
    out = fit_5param(A, jnp.asarray(t["cosphi"]), jnp.asarray(t["sinphi"]),
                     jnp.asarray(dalpha), jnp.asarray(ddelta),
                     residuals=jnp.asarray(resid), include_chi2=True)
    da, dd, dpmra, dpmdec, dplx = [float(x) for x in out["parameters"]]
    np.testing.assert_allclose(
        [da, dd, dpmra, dpmdec, dplx],
        [true["da"], true["dd"], true["dpmra"], true["dpmdec"], true["dplx"]],
        atol=1e-8,
    )
    assert float(out["chi_squared_astro"]) < 1e-12


def test_fit_5param_gradient():
    t = _synth_scans(n=30)
    A = prepare_A_5param(t["epoch"], t["cosphi"], t["sinphi"],
                         t["parallaxFactorAlongScan"], 56500.0, 56500.0)

    def f(scale):
        out = fit_5param(
            jnp.asarray(A),
            jnp.asarray(t["cosphi"]),
            jnp.asarray(t["sinphi"]),
            scale * jnp.asarray(np.sin(t["epoch"] / 100)),
            scale * jnp.asarray(np.cos(t["epoch"] / 100)),
        )
        return out["parameters"][2]

    g = jax.grad(f)(1.0)
    fd = (f(1.0 + 1e-6) - f(1.0 - 1e-6)) / 2e-6
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-6)


def test_hippacentre_dark_companion_reduces_to_reflex():
    t = _synth_scans(n=20)
    orbit = VisualOrbit.from_params(
        a=3.0, e=0.1, i=0.5, omega=1.0, Omega=2.0, tp=56000.0, M=1.0, plx=50.0
    )
    sol = orbitsolve(orbit, jnp.asarray(t["epoch"]))
    m = 10 * MJUP2MSOL
    da, dd, sig = hippacentre_combined(
        jnp.asarray(t["cosphi"]), jnp.asarray(t["sinphi"]),
        [sol], [jnp.asarray(m)], [jnp.asarray(0.0)],
    )
    # dark companion: pure host reflex projected along scan
    ra_h = np.asarray(raoff(sol, m))
    dec_h = np.asarray(decoff(sol, m))
    along = ra_h * t["cosphi"] + dec_h * t["sinphi"]
    np.testing.assert_allclose(np.asarray(da), along * t["cosphi"], rtol=1e-10)
    np.testing.assert_allclose(np.asarray(sig), np.ones_like(sig), rtol=1e-12)
    # zero-mass: exactly zero
    da0, dd0, sig0 = hippacentre_combined(
        jnp.asarray(t["cosphi"]), jnp.asarray(t["sinphi"]),
        [sol], [jnp.asarray(0.0)], [jnp.asarray(0.5)],
    )
    assert float(jnp.max(jnp.abs(da0))) == 0.0


def test_photocentre_coeff_dark_matches_reflex():
    orbit = VisualOrbit.from_params(
        a=3.0, e=0.1, i=0.5, omega=1.0, Omega=2.0, tp=56000.0, M=1.0, plx=50.0
    )
    sol = orbitsolve(orbit, jnp.asarray(56100.0))
    m = 5 * MJUP2MSOL
    da, dd = skypath_perturbations_linear(sol, orbit, jnp.asarray(m), jnp.asarray(0.0))
    np.testing.assert_allclose(float(da), float(raoff(sol, m)), rtol=1e-12)


# ---------------------------------------------------------------------------
# synthetic Hipparcos IAD file
HIP_SOL = dict(radeg=68.0, dedeg=-51.0, plx=50.0, pm_ra=-5.0, pm_de=10.0)


def write_synth_iad(path, n_orbits=30, res_sigma=1.5, seed=0):
    rng = np.random.default_rng(seed)
    lines = [
        "# synthetic IAD",
        "#",
        "#",
        "#",
        "#",
        "#",
        f"HIP    99999  99999  {2 * n_orbits}  1  5      0    0.00  0",
        "#",
        f"Hp      5.000  0.100  0      {2 * n_orbits} 0",
        "#",
        (
            f"radeg   {HIP_SOL['radeg']}  {HIP_SOL['dedeg']}  {HIP_SOL['plx']}"
            f"  {HIP_SOL['pm_ra']}  {HIP_SOL['pm_de']}"
            + "  0.50" * 18
        ),
        "#",
    ]
    for iorb in range(1, n_orbits + 1):
        ep = -1.5 + 3.0 * (iorb - 1) / (n_orbits - 1)
        for k in range(2):
            ang = rng.uniform(0, 2 * np.pi)
            parf = rng.uniform(-0.7, 0.7)
            res = rng.standard_normal() * res_sigma
            lines.append(
                f"{iorb} {ep + 0.003 * k:.4f} {parf:.3f} {math.cos(ang):.4f} "
                f"{math.sin(ang):.4f} {res:.3f} {res_sigma:.2f}"
            )
    with open(path, "w") as f:
        f.write("\n".join(lines))
    return path


def hip_system(iad_path, mass_prior=None):
    hip = HipparcosIADObs(iad_file=iad_path)
    b = oc.Planet(
        name="b",
        basis="AbsoluteVisual{KepOrbit}",
        variables=dict(
            a=3.0, e=0.1, i=0.5, omega=1.0, Omega=2.0, tp=48000.0,
            mass=mass_prior if mass_prior is not None else 0.0,
        ),
    )
    system = oc.System(
        name="hiptest",
        variables=dict(
            M=1.0,
            plx=HIP_SOL["plx"],
            pmra=HIP_SOL["pm_ra"],
            pmdec=HIP_SOL["pm_de"],
            ra=HIP_SOL["radeg"],
            dec=HIP_SOL["dedeg"],
            rv=0.0,
            ref_epoch=HIPPARCOS_EPOCH_MJD,
        ),
        companions=[b],
        observations=[hip],
    )
    return system, hip


def test_hipparcos_iad_catalog_consistency(tmp_path):
    """With a zero-mass companion and barycentric params equal to the
    catalog solution, each abscissa residual equals the published `res`,
    so ln_like = sum logpdf(Normal(0, sres), res)."""
    path = write_synth_iad(os.path.join(tmp_path, "synth.d"))
    system, hip = hip_system(path)
    # mass has no prior -> model has zero free params; give plx tiny prior
    system.var_specs[1].kind = "prior"
    system.var_specs[1].value = dist.truncated(
        dist.Normal(HIP_SOL["plx"], 1e-6), lower=1.0
    )
    model = LogDensityModel(system, verbosity=0)
    flat = jnp.asarray([HIP_SOL["plx"]])
    ll = float(model.ln_like_nt(model.arr2nt(flat)))
    res = hip.table["res"]
    sres = hip.table["sres_renorm"]
    expected = np.sum(
        -0.5 * (res / sres) ** 2 - np.log(sres) - 0.5 * np.log(2 * np.pi)
    )
    np.testing.assert_allclose(ll, expected, rtol=1e-3)


def test_hipparcos_massive_companion_changes_ll(tmp_path):
    path = write_synth_iad(os.path.join(tmp_path, "synth.d"))
    system, hip = hip_system(path, mass_prior=dist.Uniform(0.0, 100.0))
    model = LogDensityModel(system, verbosity=0)
    ll0 = float(model.ln_like_nt(model.arr2nt(jnp.asarray([0.0]))))
    ll50 = float(model.ln_like_nt(model.arr2nt(jnp.asarray([50.0]))))
    assert ll50 < ll0  # injecting a massive companion worsens the fit
    val, grad = model.ln_post_and_grad(model.link(jnp.asarray([10.0])))
    assert np.isfinite(float(val)) and np.all(np.isfinite(np.asarray(grad)))


def test_iad_corruption_detection():
    from octofitter_tpu.astrom import detect_corruption

    table = dict(
        iorb=np.array([1, 1, 2, 2, 3, 3, 3, 3]),
        sres_renorm=np.array([1.0, 1.1, 1.2, 1.3, 2.0, 1.5, 1.55, 2.0]),
        epoch_yrs=np.linspace(-1, 1, 8),
        parf=np.zeros(8),
        cosphi=np.ones(8),
        sinphi=np.zeros(8),
        res=np.zeros(8),
        sres=np.ones(8),
        reject=np.zeros(8, bool),
    )
    assert detect_corruption(table) == 3
    table2 = dict(table)
    table2["sres_renorm"] = np.array([1.0, 1.1, 1.2, 1.3, 2.0, 1.5, 1.55, 1.9])
    assert detect_corruption(table2) == 0


# ---------------------------------------------------------------------------
def synth_gost_csv(tmp_path, n=40):
    rng = np.random.default_rng(1)
    jd = np.sort(rng.uniform(2456900.0, 2457900.0, n))
    angle = rng.uniform(-np.pi, np.pi, n)
    parf = rng.uniform(-0.7, 0.7, n)
    path = os.path.join(tmp_path, "gost.csv")
    with open(path, "w") as f:
        f.write(
            "Target, ra[rad], dec[rad], ObservationTimeAtGaia[UTC], scanAngle[rad],"
            " parallaxFactorAlongScan, parallaxFactorAcrossScan,"
            " ObservationTimeAtBarycentre[BarycentricJulianDateInTCB]\n"
        )
        for i in range(n):
            f.write(
                f"t,1.0,0.5,2015-01-01T00:00:00,{angle[i]},{parf[i]},0.0,{jd[i]}\n"
            )
    return path


GAIA_SOL = dict(
    ra=68.0, dec=-51.0, parallax=50.0, pmra=-5.0, pmdec=10.0,
    parallax_error=0.05, ra_error=0.03, dec_error=0.03,
    pmra_error=0.05, pmdec_error=0.05,
)


def test_gaia_catalog_fit_obs_construction(tmp_path):
    csv = synth_gost_csv(tmp_path)
    g = GaiaCatalogFitObs(gaia_sol=GAIA_SOL, scanlaw=csv)
    assert g.A_prepared_5.shape[1] == 5
    assert g.catalog_cov.shape == (5, 5)
    assert len(g.table["epoch"]) == 40


# ---------------------------------------------------------------------------
def hgca_linfit_model(tmp_path, true_mass=30.0, include_iad=False):
    iad = write_synth_iad(os.path.join(tmp_path, "synth.d"), res_sigma=1.5)
    csv = synth_gost_csv(tmp_path)
    hip = HipparcosIADObs(iad_file=iad)
    gaia = GaiaCatalogFitObs(gaia_sol=GAIA_SOL, scanlaw=csv)
    row = dict(
        pmra_hip=0.0, pmdec_hip=0.0, pmra_hip_error=0.4, pmdec_hip_error=0.4,
        pmra_pmdec_hip=0.1,
        pmra_gaia=0.0, pmdec_gaia=0.0, pmra_gaia_error=0.03,
        pmdec_gaia_error=0.03, pmra_pmdec_gaia=-0.1,
        pmra_hg=0.0, pmdec_hg=0.0, pmra_hg_error=0.03, pmdec_hg_error=0.03,
        pmra_pmdec_hg=0.0,
        epoch_ra_hip=1991.25, epoch_dec_hip=1991.25,
        epoch_ra_gaia=2016.0, epoch_dec_gaia=2016.0,
        nonlinear_dpmra=0.0, nonlinear_dpmdec=0.0,
        parallax_gaia=50.0, parallax_gaia_error=0.05,
    )
    hgca = HGCAObs(hgca=row, hip_like=hip, gaia_like=gaia, include_iad=include_iad)

    b = oc.Planet(
        name="b",
        basis="Visual{KepOrbit}",
        variables=dict(
            a=6.0, e=0.1, i=0.6, omega=1.0, Omega=2.0, tp=50000.0,
            mass=dist.Uniform(0.0, 100.0),
        ),
    )
    system = oc.System(
        name="hgcalinfit",
        variables=dict(
            M=1.1, plx=50.0,
            pmra=dist.Normal(0.0, 100.0), pmdec=dist.Normal(0.0, 100.0),
        ),
        companions=[b],
        observations=[hgca],
    )
    model = LogDensityModel(system, verbosity=0)
    return model, hgca, true_mass


def test_hgca_linfit_injection_recovery(tmp_path):
    model, hgca, true_mass = hgca_linfit_model(tmp_path)
    names = model.parameter_names
    truth = {"pmra": -5.0, "pmdec": 10.0, "b_mass": true_mass}
    flat_true = jnp.asarray([truth[n] for n in names])

    # generate a synthetic catalog from the model at truth, then refit
    nt = model.arr2nt(flat_true)
    newsys = generate_from_params(model, nt, add_noise=False)
    newmodel = LogDensityModel(newsys, verbosity=0)

    # at truth, ll equals the max (residuals vanish)
    ll_true = float(newmodel.ln_like_nt(newmodel.arr2nt(flat_true)))
    h = newsys.observations[0].hgca
    expected = 0.0
    for block in ("hip", "hg", "gaia"):
        s1, s2 = h[f"pmra_{block}_error"], h[f"pmdec_{block}_error"]
        r = h[f"pmra_pmdec_{block}"]
        expected += -np.log(2 * np.pi) - 0.5 * np.log(s1**2 * s2**2 * (1 - r**2))
    np.testing.assert_allclose(ll_true, expected, rtol=1e-6)

    # changing the mass lowers the likelihood; gradient flows
    flat_off = jnp.asarray([truth["pmra"], truth["pmdec"], true_mass + 20.0])
    assert float(newmodel.ln_like_nt(newmodel.arr2nt(flat_off))) < ll_true
    val, grad = newmodel.ln_post_and_grad(newmodel.link(flat_true))
    assert np.all(np.isfinite(np.asarray(grad)))


def test_hgca_linfit_quick_fit(tmp_path):
    model, hgca, true_mass = hgca_linfit_model(tmp_path)
    names = model.parameter_names
    flat_true = jnp.asarray([-5.0, 10.0, true_mass])
    newsys = generate_from_params(model, model.arr2nt(flat_true), add_noise=False)
    newmodel = LogDensityModel(newsys, verbosity=0)
    chain = oc.octofit(
        newmodel,
        key=jax.random.PRNGKey(0),
        chains=4,
        adaptation=300,
        iterations=300,
        max_depth=8,
        verbosity=0,
        starting_points=np.asarray(newmodel.link(flat_true)),
    )
    mass = chain.flat("b_mass")
    pull = (mass.mean() - true_mass) / max(mass.std(), 1e-9)
    assert abs(pull) < 4, f"mass {mass.mean():.2f}+-{mass.std():.2f}"


# ---------------------------------------------------------------------------
def test_gaia_dr4_roundtrip():
    rng = np.random.default_rng(0)
    n = 50
    epochs = np.sort(rng.uniform(57000, 58500, n))
    psi = rng.uniform(0, 2 * np.pi, n)
    parf = rng.uniform(-0.7, 0.7, n)
    obs = GaiaDR4AstromObs(
        dict(
            epoch=epochs,
            centroid_pos_al=np.zeros(n),
            centroid_pos_error_al=np.full(n, 0.05),
            scan_pos_angle=psi,
            parallax_factor_al=parf,
        ),
        gaia_sol=dict(ra=68.0, dec=-51.0),
        variables=dict(astrometric_jitter=dist.LogUniform(1e-4, 1.0)),
    )
    b = oc.Planet(
        name="b",
        basis="Visual{KepOrbit}",
        variables=dict(
            a=2.0, e=0.1, i=0.5, omega=1.0, Omega=2.0, tp=57000.0,
            mass=dist.Uniform(0.0, 50.0),
        ),
    )
    system = oc.System(
        name="dr4",
        variables=dict(
            M=1.0, plx=50.0, pmra=0.0, pmdec=0.0,
        ),
        companions=[b],
        observations=[obs],
    )
    model = LogDensityModel(system, verbosity=0)
    names = model.parameter_names
    # truth: jitter tiny, mass 10
    truth = {"GaiaDR4_astrometric_jitter": 1e-3, "b_mass": 10.0}
    flat_true = jnp.asarray([truth[n] for n in names])
    newsys = generate_from_params(model, model.arr2nt(flat_true), add_noise=False)
    newmodel = LogDensityModel(newsys, verbosity=0)
    ll_true = float(newmodel.ln_like_nt(newmodel.arr2nt(flat_true)))
    ll_off = float(
        newmodel.ln_like_nt(
            newmodel.arr2nt(jnp.asarray([truth["GaiaDR4_astrometric_jitter"], 30.0]))
        )
    )
    assert ll_true > ll_off
    val, grad = newmodel.ln_post_and_grad(newmodel.link(flat_true))
    assert np.all(np.isfinite(np.asarray(grad)))


REFERENCE_IAD = (
    "/root/reference/test/hipparcos_iad_testdata/"
    "ResRec_JavaTool_2014/H021/H021547.d"
)


@pytest.mark.skipif(
    not os.path.exists(REFERENCE_IAD),
    reason="reference IAD fixture not available",
)
def test_hipparcos_iad_reference_format_file():
    """Parse the reference's van Leeuwen Java-Tool-format IAD fixture
    (authoritative header layout: HIP / Hp / radeg lines + scan table,
    `hipparcos.jl:129-390`) and evaluate a model on it."""
    hip = HipparcosIADObs(iad_file=REFERENCE_IAD)
    # header solution parsed exactly
    assert hip.hip_sol["hip"] == 21547
    assert hip.hip_sol["plx"] == 50.0
    assert abs(hip.hip_sol["radeg"] - 68.0795833) < 1e-6
    assert abs(hip.hip_sol["dedeg"] - (-51.066667)) < 1e-6
    assert hip.hip_sol["pm_ra"] == -5.0
    assert hip.hip_sol["pm_de"] == 10.0
    assert len(hip.table["epoch"]) == 26
    # scan-line geometry columns exist and are unit-normalized
    c, s = hip.table["cosphi"], hip.table["sinphi"]
    assert np.all(np.abs(np.hypot(c, s) - 1.0) < 0.02)

    # a minimal model over the real-format file evaluates finitely
    b = oc.Planet(
        name="b", basis="AbsoluteVisual{KepOrbit}",
        variables=dict(a=3.0, e=0.1, i=0.6, omega=1.0, Omega=2.0,
                       tp=48000.0, mass=dist.Uniform(0.0, 200.0)),
    )
    system = oc.System(
        name="hip21547",
        variables=dict(
            M=1.0,
            plx=dist.truncated(dist.Normal(50.0, 1.0), lower=0.1),
            pmra=dist.Normal(-5.0, 10.0), pmdec=dist.Normal(10.0, 10.0),
            ra=hip.hip_sol["radeg"], dec=hip.hip_sol["dedeg"],
            rv=0.0, ref_epoch=HIPPARCOS_EPOCH_MJD,
        ),
        companions=[b], observations=[hip],
    )
    m = LogDensityModel(system, verbosity=0)
    theta_t = m.link(m.sample_priors(jax.random.PRNGKey(0)))
    lp, grad = jax.value_and_grad(m._ln_post_py)(theta_t)
    assert np.isfinite(float(lp))
    assert np.all(np.isfinite(np.asarray(grad)))


GAIA4_CSV = "/root/reference/docs/src/gaia4_epoch_astrometry.csv"


@pytest.mark.skipif(
    not os.path.exists(GAIA4_CSV),
    reason="Gaia-4 DR4 pre-release CSV not available",
)
def test_gaia_dr4_real_gaia4_data():
    """REAL Gaia DR4 pre-release epoch astrometry of Gaia-4 (ESA/DPAC;
    reference `docs/src/gaia-dr4-prerelease.md`): the CCD->transit
    median reduction reproduces the tutorial's 93 transits / 4.94 yr,
    the no-planet 5-parameter linear fit recovers a physical parallax,
    and the full model evaluates with finite posterior + gradient.
    The full sampled recovery (P = 571 d, m = 11.8 Mjup) runs in
    examples/07_gaia4_dr4_real_data.py."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ex07",
        os.path.join(os.path.dirname(__file__), os.pardir, "examples",
                     "07_gaia4_dr4_real_data.py"),
    )
    ex07 = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ex07)

    t = ex07.load_transit_level()
    assert len(t["epoch"]) == 93  # tutorial: "93 transits"
    span_yr = (t["epoch"].max() - t["epoch"].min()) / 365.25
    assert abs(span_yr - 4.94) < 0.02

    seed = ex07.linear_5param_seed(t)
    # Gaia-4 is a nearby M dwarf: the epoch astrometry alone pins a
    # physical parallax and proper motion
    assert 10.0 < seed["plx"] < 20.0
    assert abs(seed["pmra"]) > 50.0

    model = ex07.build_model(t)
    theta_t = model.link(model.sample_priors(jax.random.PRNGKey(0)))
    lp, grad = jax.value_and_grad(model._ln_post_py)(theta_t)
    assert np.isfinite(float(lp))
    assert np.all(np.isfinite(np.asarray(grad)))


BH3_ASTROM = "/root/reference/docs/src/astrom.dat"
BH3_RV = "/root/reference/docs/src/epochrv.dat"


@pytest.mark.skipif(
    not (os.path.exists(BH3_ASTROM) and os.path.exists(BH3_RV)),
    reason="Gaia BH3 published data not available",
)
def test_gaia_bh3_real_data():
    """REAL Gaia BH3 DR4 astrometry + epoch RVs (ESA; reference
    `docs/src/gaia-iad.md`): the CCD->transit reduction and the
    5-parameter linear seed recover BH3's published halo-star proper
    motion, and the joint model evaluates finitely. Full sampled
    recovery (M_BH = 33 Msun, e = 0.729) runs in
    examples/08_gaia_bh3_joint_fit.py."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ex08",
        os.path.join(os.path.dirname(__file__), os.pardir, "examples",
                     "08_gaia_bh3_joint_fit.py"),
    )
    ex08 = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ex08)

    t = ex08.load_bh3_astrom()
    assert 60 <= len(t["centroid_pos_al"]) <= 80  # ~70 transits
    rv = ex08.load_bh3_rv()
    assert len(rv["rv"]) == 17
    # systemic velocity ~ -357 km/s (published)
    assert -370e3 < np.mean(rv["rv"]) < -320e3

    seed = ex08.linear_5param_seed(t)
    # published DR3 proper motion: (-28.3, -155) mas/yr
    assert abs(seed["pmra"] - (-28.3)) < 10.0
    assert abs(seed["pmdec"] - (-155.0)) < 15.0

    model = ex08.build_model()
    theta_t = model.link(model.sample_priors(jax.random.PRNGKey(0)))
    lp, grad = jax.value_and_grad(model._ln_post_py)(theta_t)
    assert np.isfinite(float(lp))
    assert np.all(np.isfinite(np.asarray(grad)))


def test_initialize_guess_steering(tmp_path):
    """`initialize(guess=...)` (the reference's `initialize!(model, nt)`)
    pins named parameters across the multistart so the mode search
    lands at the guessed solution's basin."""
    rng = np.random.default_rng(0)
    from octofitter_tpu.orbits import VisualOrbit, orbitsolve, raoff, decoff

    true = dict(a=7.0, e=0.2, i=0.6, omega=1.0, Omega=2.0, tp=57000.0,
                M=1.2, plx=50.0)
    epochs = np.linspace(55000.0, 59500.0, 8)
    sol = orbitsolve(VisualOrbit.from_params(**true), jnp.asarray(epochs))
    astrom = oc.PlanetRelAstromObs(
        dict(epoch=epochs,
             ra=np.asarray(raoff(sol)) + rng.standard_normal(8) * 2.0,
             dec=np.asarray(decoff(sol)) + rng.standard_normal(8) * 2.0,
             σ_ra=np.full(8, 2.0), σ_dec=np.full(8, 2.0)),
        name="d",
    )
    b = oc.Planet(
        name="b", basis="Visual{KepOrbit}",
        variables=dict(a=dist.Uniform(0.001, 100.0),
                       e=dist.Uniform(0.0, 0.99), i=dist.Sine(),
                       omega=dist.Uniform(0.0, 2 * np.pi),
                       Omega=dist.Uniform(0.0, 2 * np.pi),
                       tp=dist.Uniform(55000.0, 60000.0)),
        observations=[astrom],
    )
    system = oc.System(
        name="guesstest",
        variables=dict(M=dist.truncated(dist.Normal(1.2, 0.1), lower=0.1),
                       plx=dist.truncated(dist.Normal(50.0, 0.02), lower=0.1)),
        companions=[b],
    )
    model = LogDensityModel(system, verbosity=0)
    mode = model.initialize(
        jax.random.PRNGKey(0),
        guess=dict(b_a=true["a"], b_e=true["e"], b_i=true["i"]),
        verbosity=0, n_prior_samples=5000, n_multistart=64,
        n_opt_steps=300, n_draws=64,
    )
    nat = np.asarray(model.invlink(mode))
    names = model.parameter_names
    assert abs(nat[names.index("b_a")] - true["a"]) < 1.0
    # unknown names error clearly
    with pytest.raises(KeyError):
        model.initialize(jax.random.PRNGKey(0), guess=dict(nope=1.0),
                         n_prior_samples=100, n_multistart=8,
                         n_opt_steps=10, n_draws=8, verbosity=0)
