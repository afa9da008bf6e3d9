"""G23H composite likelihood tests (reference `test/test_g23h_simulation.jl`
style: simulate at truth, check pulls and recovery)."""

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import octofitter_tpu as oc
from octofitter_tpu import distributions as dist
from octofitter_tpu.astrom import G23HObs, GaiaCatalogFitObs, HipparcosIADObs, noncentral_chi2_logpdf
from octofitter_tpu.model.generate import generate_from_params
from octofitter_tpu.model.logdensity import LogDensityModel

from test_astrom import GAIA_SOL, HIP_SOL, write_synth_iad


def synth_gost_dr23(tmp_path, n=80):
    """GOST-style csv spanning both the DR2 and DR3 AGIS windows."""
    from octofitter_tpu.astrom.scanlaw import GAIA_AGIS_SPAN_DR2, GAIA_AGIS_SPAN_DR3
    from octofitter_tpu.constants import mjd2jd

    rng = np.random.default_rng(2)
    mjd = np.sort(
        rng.uniform(
            GAIA_AGIS_SPAN_DR2["start_mjd"] + 5,
            GAIA_AGIS_SPAN_DR3["stop_mjd"] - 5,
            n,
        )
    )
    jd = mjd2jd(mjd)
    angle = rng.uniform(-np.pi, np.pi, n)
    parf = rng.uniform(-0.7, 0.7, n)
    path = os.path.join(tmp_path, "gost_dr23.csv")
    with open(path, "w") as f:
        f.write(
            "Target, scanAngle[rad], parallaxFactorAlongScan,"
            " ObservationTimeAtBarycentre[BarycentricJulianDateInTCB]\n"
        )
        for i in range(n):
            f.write(f"t,{angle[i]},{parf[i]},{jd[i]}\n")
    return path


def g23h_catalog_row():
    return dict(
        pmra_hip=0.0, pmdec_hip=0.0, pmra_hip_error=0.5, pmdec_hip_error=0.5,
        pmra_pmdec_hip=0.1,
        pmra_hg=0.0, pmdec_hg=0.0, pmra_hg_error=0.03, pmdec_hg_error=0.03,
        pmra_pmdec_hg=0.0,
        pmra_dr2=0.0, pmdec_dr2=0.0, pmra_dr2_error=0.06, pmdec_dr2_error=0.06,
        pmra_pmdec_dr2=-0.1,
        pmra_dr32=0.0, pmdec_dr32=0.0, pmra_dr32_error=0.05, pmdec_dr32_error=0.05,
        pmra_pmdec_dr32=0.0,
        pmra_dr3=0.0, pmdec_dr3=0.0, pmra_dr3_error=0.03, pmdec_dr3_error=0.03,
        pmra_pmdec_dr3=-0.2,
        epoch_ra_hip=1991.25, epoch_dec_hip=1991.25,
        epoch_ra_dr2_mjd=57205.875, epoch_dec_dr2_mjd=57205.875,
        epoch_ra_dr3_mjd=57388.5, epoch_dec_dr3_mjd=57388.5,
        nonlinear_dpmra=0.0, nonlinear_dpmdec=0.0,
        astrometric_chi2_al_dr3=500.0,
        astrometric_n_good_obs_al_dr3=400,
        astrometric_matched_transits_dr3=50,
        astrometric_params_solved_dr3=31,
        ruwe_dr3=1.05,
        rho_dr2_dr3=0.3,
        radial_velocity_error=0.5,
        rv_nb_transits=10,
    )


def g23h_model(tmp_path, ueva_mode="RUWE", include_rv=True):
    iad = write_synth_iad(os.path.join(tmp_path, "synth_g23h.d"), res_sigma=1.5)
    hip = HipparcosIADObs(iad_file=iad)
    gaia = GaiaCatalogFitObs(gaia_sol=GAIA_SOL, scanlaw=synth_gost_dr23(tmp_path))
    obs_vars = dict(
        σ_att=dist.LogUniform(0.01, 1.0),
        σ_AL=dist.LogUniform(0.01, 1.0),
        σ_calib=dist.LogUniform(0.01, 1.0),
        iad_Δra=dist.Normal(0.0, 10.0),
        iad_Δdec=dist.Normal(0.0, 10.0),
        iad_pmra=dist.Normal(0.0, 10.0),
        iad_pmdec=dist.Normal(0.0, 10.0),
        iad_Δplx=dist.Normal(0.0, 1.0),
        hip_iad_jitter=dist.LogUniform(0.01, 10.0),
    )
    if include_rv:
        obs_vars["σ_rv_per_transit"] = dist.LogUniform(0.01, 10.0)
    g23h = G23HObs(
        catalog=g23h_catalog_row(),
        gaia_like=gaia,
        hip_like=hip,
        ueva_mode=ueva_mode,
        include_rv=include_rv,
        variables=obs_vars,
    )
    b = oc.Planet(
        name="b",
        basis="Visual{KepOrbit}",
        variables=dict(
            a=6.0, e=0.1, i=0.6, omega=1.0, Omega=2.0, tp=50000.0,
            mass=dist.Uniform(0.0, 100.0),
        ),
    )
    system = oc.System(
        name="g23htest",
        variables=dict(
            M=1.1, plx=50.0,
            pmra=dist.Normal(0.0, 100.0),
            pmdec=dist.Normal(0.0, 100.0),
        ),
        companions=[b],
        observations=[g23h],
    )
    return LogDensityModel(system, verbosity=0), g23h


def test_noncentral_chi2_logpdf():
    from scipy.stats import ncx2

    for x, df, nc in [(5.0, 4, 2.0), (20.0, 9, 10.0), (1.0, 3, 0.01)]:
        got = float(noncentral_chi2_logpdf(jnp.asarray(x), df, jnp.asarray(nc)))
        want = float(ncx2.logpdf(x, df, nc))
        np.testing.assert_allclose(got, want, rtol=1e-6)


def test_g23h_builds_and_evaluates(tmp_path):
    model, g23h = g23h_model(tmp_path)
    assert "ueva_dr3" in g23h.kinds and "ra_hip" in g23h.kinds
    theta_t = model.link(model.sample_priors(jax.random.PRNGKey(0)))
    lp = float(model.ln_post(theta_t))
    assert np.isfinite(lp)
    val, grad = model.ln_post_and_grad(theta_t)
    assert np.all(np.isfinite(np.asarray(grad)))


def test_g23h_mass_sensitivity(tmp_path):
    model, _ = g23h_model(tmp_path, include_rv=False)
    names = model.parameter_names

    def ll_at(mass):
        vals = {
            "pmra": 0.0, "pmdec": 0.0, "b_mass": mass,
            "G23H_σ_att": 0.1, "G23H_σ_AL": 0.1, "G23H_σ_calib": 0.1,
            "G23H_iad_Δra": 0.0, "G23H_iad_Δdec": 0.0,
            "G23H_iad_pmra": 0.0, "G23H_iad_pmdec": 0.0, "G23H_iad_Δplx": 0.0,
            "G23H_hip_iad_jitter": 0.5,
        }
        flat = jnp.asarray([vals[n] for n in names])
        return float(model.ln_like_nt(model.arr2nt(flat)))

    # a massive companion makes the zero-PM catalog much less likely
    assert ll_at(50.0) < ll_at(0.1) - 10


def test_g23h_generate_and_recover(tmp_path):
    model, _ = g23h_model(tmp_path, include_rv=False)
    names = model.parameter_names
    true_mass = 30.0
    vals = {
        "pmra": -5.0, "pmdec": 10.0, "b_mass": true_mass,
        "G23H_σ_att": 0.1, "G23H_σ_AL": 0.1, "G23H_σ_calib": 0.1,
        "G23H_iad_Δra": 0.0, "G23H_iad_Δdec": 0.0,
        "G23H_iad_pmra": 0.0, "G23H_iad_pmdec": 0.0, "G23H_iad_Δplx": 0.0,
        "G23H_hip_iad_jitter": 0.5,
    }
    flat_true = jnp.asarray([vals[n] for n in names])
    newsys = generate_from_params(model, model.arr2nt(flat_true), add_noise=False)
    newmodel = LogDensityModel(newsys, verbosity=0)
    ll_true = float(newmodel.ln_like_nt(newmodel.arr2nt(flat_true)))
    # at truth the PM channels have zero residual; moving the mass away
    # decreases the likelihood
    vals_off = dict(vals, b_mass=60.0)
    flat_off = jnp.asarray([vals_off[n] for n in names])
    assert float(newmodel.ln_like_nt(newmodel.arr2nt(flat_off))) < ll_true
    val, grad = newmodel.ln_post_and_grad(newmodel.link(flat_true))
    assert np.all(np.isfinite(np.asarray(grad)))


def test_g23h_ueva_none_mode(tmp_path):
    """`ueva_mode="none"` drops the UEVA channel (reference
    `test_g23h_ueva_none.jl`)."""
    model, g23h = g23h_model(tmp_path, ueva_mode="none", include_rv=False)
    assert "ueva_dr3" not in g23h.kinds
    theta_t = model.link(model.sample_priors(jax.random.PRNGKey(1)))
    assert np.isfinite(float(model.ln_post(theta_t)))
