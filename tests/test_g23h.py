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


# --------------------------------------------------------------------------
# Per-sample epoch-selection marginalization (weight masks)
# --------------------------------------------------------------------------

def g23h_catalog_row_full():
    """Catalog row with the sidecar fields the auto-variables path uses."""
    row = g23h_catalog_row()
    row.update(
        astrometric_matched_observations_dr2=30,
        phot_g_mean_mag_dr3=5.5,  # bright -> duplicate marginalization
        sig_AL=0.132, sig_AL_sigma=0.01,
        sig_att_radec=0.0779, sig_att_radec_sigma=0.01,
        sig_cal=0.0795, sig_cal_sigma=0.01,
        ra_error_central_dr3=0.02, dec_error_central_dr3=0.02,
        ra_dec_corr_central_dr3=0.1,
        ra_error_central_dr2=0.04, dec_error_central_dr2=0.04,
        ra_dec_corr_central_dr2=-0.05,
        rv_ln_uncert_dr3=-1.0, rv_ln_uncert_err_dr3=0.2,
    )
    return row


def test_g23h_selection_weights_match_reference_semantics():
    """_dr3_weights/_dr2_weights reproduce the reference's top-k +
    duplicate-wrap selection (`g23h.jl:233-241,819-823`) as weights."""
    from octofitter_tpu.astrom.g23h import (
        _dr2_weights,
        _dr3_weights,
        _EpochPools,
    )

    rng = np.random.default_rng(0)
    n = 40
    p = rng.standard_normal(n)
    pools = _EpochPools()
    pools.n_epochs = n
    pools.dr3_win = np.arange(0, 25)
    pools.dr3_tail = np.arange(25, 40)
    pools.dr2_pool = np.arange(0, 20)
    pools.n2_win = 10
    pools.n_tail = 5
    pools.n_dr2_total = 13

    w3 = np.asarray(_dr3_weights(jnp.asarray(p), pools))
    # numpy reference: top-10 of win pool, top-5 of tail pool
    sel_win = pools.dr3_win[np.argsort(-p[pools.dr3_win])[:10]]
    sel_tail = pools.dr3_tail[np.argsort(-p[pools.dr3_tail])[:5]]
    expect = np.zeros(n)
    expect[sel_win] = 1
    expect[sel_tail] = 1
    np.testing.assert_array_equal(w3, expect)
    assert w3.sum() == 15

    # DR2 with duplicates: 13 total over 8 distinct -> 5 repeats wrap
    # the top-5 of the selection (reference `sel[mod1.(1:5, 8)]`)
    n_distinct = 8
    w2 = np.asarray(_dr2_weights(jnp.asarray(p), n_distinct, pools))
    order = pools.dr2_pool[np.argsort(-p[pools.dr2_pool])]
    sel = order[:n_distinct]
    expect2 = np.zeros(n)
    expect2[sel] = 1
    for j in range(pools.n_dr2_total - n_distinct):
        expect2[sel[j % n_distinct]] += 1
    np.testing.assert_array_equal(w2, expect2)
    assert w2.sum() == pools.n_dr2_total
    # multiplicity >= 3 wrap case
    w2b = np.asarray(_dr2_weights(jnp.asarray(p), 4, pools))
    assert w2b.sum() == pools.n_dr2_total
    assert w2b.max() == 4  # 13 = 4*3 + 1 -> top rank gets 1+3


def g23h_model_marg(tmp_path, freeze=False):
    iad = write_synth_iad(os.path.join(tmp_path, "synth_g23h_m.d"), res_sigma=1.5)
    hip = HipparcosIADObs(iad_file=iad)
    gaia = GaiaCatalogFitObs(gaia_sol=GAIA_SOL, scanlaw=synth_gost_dr23(tmp_path))
    g23h = G23HObs(
        catalog=g23h_catalog_row_full(),
        gaia_like=gaia,
        hip_like=hip,
        freeze_epochs=freeze,
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
        name="g23hmarg",
        variables=dict(
            M=1.1, plx=50.0,
            pmra=dist.Normal(0.0, 100.0),
            pmdec=dist.Normal(0.0, 100.0),
        ),
        companions=[b],
        observations=[g23h],
    )
    return LogDensityModel(system, verbosity=0), g23h


def test_g23h_epoch_marginalization_builds(tmp_path):
    """Auto-variables path: transit priorities + duplicate-count
    marginalization sampled per draw; weights hit the target counts."""
    model, g23h = g23h_model_marg(tmp_path)
    assert g23h.pools.marginalize_dup  # bright star, n_dr2_lo < n_dr2_hi
    names = model.parameter_names
    assert any(n.startswith("G23H_transit_priorities_") for n in names)
    assert "G23H_u_dup_dr2" in names
    assert "G23H_σ_AL" in names and "G23H_hip_iad_jitter" in names

    theta_t = model.link(model.sample_priors(jax.random.PRNGKey(0)))
    lp = float(model.ln_post(theta_t))
    assert np.isfinite(lp)
    _, grad = model.ln_post_and_grad(theta_t)
    assert np.all(np.isfinite(np.asarray(grad)))

    # two different priority draws give different likelihoods (the
    # selection genuinely enters) but both finite
    t2 = model.link(model.sample_priors(jax.random.PRNGKey(3)))
    assert np.isfinite(float(model.ln_post(t2)))

    # weight invariants at a prior draw
    from octofitter_tpu.astrom.g23h import _dr2_weights, _dr3_weights

    nt = model.arr2nt(model.invlink(theta_t))
    pr = np.asarray(nt.observations["G23H"]["transit_priorities"])
    w3 = np.asarray(_dr3_weights(jnp.asarray(pr), g23h.pools))
    assert w3.sum() == g23h.pools.n2_win + g23h.pools.n_tail
    w2 = np.asarray(_dr2_weights(jnp.asarray(pr), g23h.pools.n_dr2_hi, g23h.pools))
    assert w2.sum() == g23h.pools.n_dr2_total


def test_g23h_frozen_epochs(tmp_path):
    """freeze_epochs=True draws the selection once as constants — no
    extra sampled dimensions (`g23h.jl:804-817`)."""
    model, g23h = g23h_model_marg(tmp_path, freeze=True)
    names = model.parameter_names
    assert not any(n.startswith("G23H_transit_priorities_") for n in names)
    theta_t = model.link(model.sample_priors(jax.random.PRNGKey(0)))
    assert np.isfinite(float(model.ln_post(theta_t)))


def test_g23h_pulls_standard_normal_at_truth(tmp_path):
    """Statistical gate (reference `_G23H_DEBUG_PULLS`, `g23h.jl:96-100`):
    generate catalogs at truth with noise, whitened pulls ~ N(0, 1)."""
    model, g23h = g23h_model_marg(tmp_path, freeze=True)
    names = model.parameter_names
    vals = {n: 0.0 for n in names}
    vals.update({
        "b_mass": 20.0, "pmra": -3.0, "pmdec": 7.0,
        "G23H_σ_AL": 0.132, "G23H_σ_att": 0.0779, "G23H_σ_calib": 0.0795,
        "G23H_hip_iad_jitter": 0.5,
        "G23H_σ_rv_per_transit": 0.4,
    })
    flat_true = jnp.asarray([vals[n] for n in names])
    nt = model.arr2nt(flat_true)

    from octofitter_tpu.model.variables import SystemObservationContext
    from octofitter_tpu.orbits import orbitsolve

    orbits = model.construct_orbits(nt)
    epochs = jnp.asarray(model._all_epochs)
    sols = tuple(orbitsolve(o, epochs) for o in orbits)
    ctx = SystemObservationContext(
        theta_system=nt,
        theta_obs=nt.observations["G23H"],
        orbits=orbits,
        solutions=sols,
        epoch_start=model._epoch_start[id(g23h)],
    )

    rng = np.random.default_rng(0)
    whitened = []
    for _ in range(60):
        noisy = g23h.generate_from_params(ctx, rng, add_noise=True)
        out = noisy.debug_pulls(ctx)
        w = np.asarray(out["whitened"])
        # drop the UEVA row: its data is not re-drawn by the generator
        pm = [i for i, k in enumerate(out["kinds"]) if k != "ueva_dr3"]
        whitened.append(w[pm])
    W = np.stack(whitened)
    assert np.all(np.isfinite(W))
    # ~600 samples of N(0,1): mean within 0.15, std within [0.85, 1.15]
    assert abs(W.mean()) < 0.15
    assert 0.85 < W.std() < 1.15


def test_g23h_injection_recovery_sampled(tmp_path):
    """Sampled injection-recovery (reference
    `test/test_g23h_simulation.jl:1-113`): inject a massive companion
    through generate_from_params, refit with ChEES, assert the mass
    posterior concentrates near the truth."""
    from octofitter_tpu.model.generate import generate_from_params

    model, g23h = g23h_model_marg(tmp_path, freeze=True)
    names = model.parameter_names
    true_mass = 40.0
    vals = {n: 0.0 for n in names}
    vals.update({
        "b_mass": true_mass, "pmra": -3.0, "pmdec": 7.0,
        "G23H_σ_AL": 0.132, "G23H_σ_att": 0.0779, "G23H_σ_calib": 0.0795,
        "G23H_hip_iad_jitter": 0.5,
        "G23H_σ_rv_per_transit": 0.4,
    })
    flat_true = jnp.asarray([vals[n] for n in names])
    newsys = generate_from_params(
        model, model.arr2nt(flat_true), add_noise=True,
        rng=np.random.default_rng(5),
    )
    newmodel = LogDensityModel(newsys, verbosity=0)

    chain = oc.octofit(
        newmodel, chains=16, adaptation=400, iterations=300,
        sampler="chees", verbosity=0, key=jax.random.PRNGKey(1),
    )
    summ = chain.summary()
    m = summ["b_mass"]
    # the injected mass must be recovered: pull within 5 sigma (one
    # noise realization shifts the MLE by ~1-2 sigma) and the relative
    # error small in absolute terms
    pull = abs(m["mean"] - true_mass) / max(m["std"], 1e-6)
    assert pull < 5.0
    assert abs(m["mean"] - true_mass) / true_mass < 0.05
    assert summ["b_mass"]["rhat"] < 1.1


def test_g23h_catalog_feather_ingestion(tmp_path):
    """Arrow/feather catalog + DR2 sidecar ingestion feeding G23HObs
    end-to-end (reference keeps a feather test-subset fixture,
    `test/G23H-test-subset.feather`; loader `g23h.jl:146-241`)."""
    import pyarrow as pa
    import pyarrow.feather as feather

    from octofitter_tpu.astrom import load_g23h_catalog_row

    # two-source catalog; target is row 1; one masked (NaN) field
    base = g23h_catalog_row_full()
    base.pop("astrometric_matched_observations_dr2")
    cols = {k: [v * 0.5, v] for k, v in base.items()}
    cols["gaia_id"] = [111, 222]
    cols["hip_id"] = [71, 72]
    cols["radial_velocity_error"] = [np.nan, base["radial_velocity_error"]]
    cat_path = os.path.join(tmp_path, "g23h-subset.feather")
    feather.write_feather(pa.table(cols), cat_path)

    sidecar_path = os.path.join(tmp_path, "g23h-dr2-transits.feather")
    feather.write_feather(
        pa.table({
            "gaia_id": [111, 222],
            "astrometric_matched_observations_dr2": [12, 30],
        }),
        sidecar_path,
    )

    row = load_g23h_catalog_row(
        cat_path, gaia_id=222, dr2_transits_catalog=sidecar_path
    )
    assert row["pmra_dr3_error"] == base["pmra_dr3_error"]
    assert row["astrometric_matched_observations_dr2"] == 30
    assert row["gaia_id"] == 222

    # the loaded row constructs a working marginalized G23HObs
    iad = write_synth_iad(os.path.join(tmp_path, "synth_cat.d"), res_sigma=1.5)
    hip = HipparcosIADObs(iad_file=iad)
    gaia = GaiaCatalogFitObs(gaia_sol=GAIA_SOL, scanlaw=synth_gost_dr23(tmp_path))
    g23h = G23HObs(catalog=row, gaia_like=gaia, hip_like=hip, freeze_epochs=True)
    assert g23h.pools.n_dr2_total == 30

    b = oc.Planet(
        name="b", basis="Visual{KepOrbit}",
        variables=dict(a=6.0, e=0.1, i=0.6, omega=1.0, Omega=2.0,
                       tp=50000.0, mass=dist.Uniform(0.0, 100.0)),
    )
    system = oc.System(
        name="g23hcat",
        variables=dict(M=1.1, plx=50.0, pmra=dist.Normal(0.0, 100.0),
                       pmdec=dist.Normal(0.0, 100.0)),
        companions=[b], observations=[g23h],
    )
    m = LogDensityModel(system, verbosity=0)
    theta_t = m.link(m.sample_priors(jax.random.PRNGKey(0)))
    assert np.isfinite(float(m.ln_post(theta_t)))

    # masked NaN fields are dropped -> RV channel disabled for source 111
    row0 = load_g23h_catalog_row(cat_path, gaia_id=111)
    assert "radial_velocity_error" not in row0
    # missing source errors clearly
    import pytest as _pytest
    with _pytest.raises(KeyError):
        load_g23h_catalog_row(cat_path, gaia_id=999)


REAL_G23H_FIXTURE = "/root/reference/test/G23H-test-subset.feather"
# the reference docs ship the REAL GOST scan-law forecast for this
# star (filename embeds catalog ra/dec in degrees)
REAL_G23H_GOST = (
    "/root/reference/docs/src/"
    "GOST-1.1927097109938027-1.5368044203832403-dr3.csv"
)


@pytest.mark.skipif(
    not os.path.exists(REAL_G23H_FIXTURE),
    reason="reference G23H catalog subset not available",
)
def test_g23h_real_catalog_ingestion(tmp_path):
    """Ingest a row of the REAL G23H catalog (the reference's
    `test/G23H-test-subset.feather` fixture, read at runtime) and build
    a working G23HObs from it — validates the production column schema
    (`gaia_source_id` key, Julian-year epochs, MSMS sidecar columns)
    against our loader, not just synthetic fixtures."""
    from octofitter_tpu.astrom import load_g23h_catalog_row
    from octofitter_tpu.astrom.scanlaw import (
        GAIA_AGIS_SPAN_DR2,
        GAIA_AGIS_SPAN_DR3,
    )

    row = load_g23h_catalog_row(REAL_G23H_FIXTURE, hip_id=384)
    # the same row resolves by Gaia DR3 source id (g23h.jl:274)
    row2 = load_g23h_catalog_row(
        REAL_G23H_FIXTURE, gaia_id=row["gaia_source_id"]
    )
    assert row2["pmra_dr3"] == row["pmra_dr3"]
    # 19-digit source ids survive ingestion exactly (beyond float64)
    assert isinstance(row["gaia_source_id"], int)
    assert row["gaia_source_id"] == 2738776816458107136

    # Julian-year epochs converted to MJD inside each AGIS span
    for dr, span in (("dr2", GAIA_AGIS_SPAN_DR2), ("dr3", GAIA_AGIS_SPAN_DR3)):
        for axis in ("ra", "dec"):
            mjd = row[f"epoch_{axis}_{dr}_mjd"]
            assert span["start_mjd"] < mjd < span["stop_mjd"], (dr, axis, mjd)

    # every channel's required fields are present and sane
    for k in (
        "pmra_hip", "pmra_hg", "pmra_dr2", "pmra_dr32", "pmra_dr3",
        "ruwe_dr3", "sig_AL", "sig_att_radec", "sig_cal",
        "rho_dr2_dr3", "radial_velocity_error",
    ):
        assert k in row, k
    for k in row:
        if k.endswith("_error"):
            assert row[k] > 0, (k, row[k])

    # the real row constructs a full G23HObs (all channels active:
    # hip + hg + dr2 + dr32 + dr3 + ueva) with finite posterior+gradient
    iad = write_synth_iad(os.path.join(tmp_path, "real_cat.d"), res_sigma=1.5)
    hip = HipparcosIADObs(iad_file=iad)
    gaia_sol = dict(
        ra=row["ra"], dec=row["dec"], parallax=row["parallax"],
        pmra=row["pmra_dr3"], pmdec=row["pmdec_dr3"],
        ra_error=row["ra_error"], dec_error=row["dec_error"],
        parallax_error=row["parallax_error"],
        pmra_error=row["pmra_dr3_error"], pmdec_error=row["pmdec_dr3_error"],
    )
    scanlaw = (
        REAL_G23H_GOST if os.path.exists(REAL_G23H_GOST)
        else synth_gost_dr23(tmp_path)
    )
    gaia = GaiaCatalogFitObs(gaia_sol=gaia_sol, scanlaw=scanlaw)
    g23h = G23HObs(catalog=row, gaia_like=gaia, hip_like=hip, freeze_epochs=True)
    assert g23h.has_hip and g23h.include_rv
    assert "ueva_dr3" in g23h.kinds

    b = oc.Planet(
        name="b", basis="Visual{KepOrbit}",
        variables=dict(a=6.0, e=0.1, i=0.6, omega=1.0, Omega=2.0,
                       tp=50000.0, mass=dist.Uniform(0.0, 100.0)),
    )
    system = oc.System(
        name="g23hreal",
        variables=dict(
            M=1.1,
            plx=dist.truncated(
                dist.Normal(row["parallax"], 10 * row["parallax_error"]),
                lower=0.1,
            ),
            pmra=dist.Normal(row["pmra_dr3"], 10.0),
            pmdec=dist.Normal(row["pmdec_dr3"], 10.0),
        ),
        companions=[b], observations=[g23h],
    )
    m = LogDensityModel(system, verbosity=0)
    theta_t = m.link(m.sample_priors(jax.random.PRNGKey(0)))
    lp, grad = jax.value_and_grad(m._ln_post_py)(theta_t)
    assert np.isfinite(float(lp))
    assert np.all(np.isfinite(np.asarray(grad)))
