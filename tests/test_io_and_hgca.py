"""Tests: minimal FITS module, chain save/load round-trip, and the HGCA
instantaneous PM-anomaly likelihood (reference `test/unit/io.jl` and
`test/integration/joint_fitting.jl`)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import octofitter_tpu as oc
from octofitter_tpu import distributions as dist
from octofitter_tpu.constants import JULIAN_YEAR_DAYS, J2000_MJD, MJUP2MSOL
from octofitter_tpu.io import loadchain, read_bintable, savechain, write_bintable
from octofitter_tpu.likelihoods.hgca import HGCAInstantaneousObs, gaia_plx
from octofitter_tpu.orbits import VisualOrbit, orbitsolve, pmra, pmdec, raoff, decoff


def test_fits_roundtrip(tmp_path):
    path = os.path.join(tmp_path, "t.fits")
    table = {
        "x": np.linspace(0, 1, 7),
        "n": np.arange(7, dtype=np.int64),
        "s": np.array(["aa", "b", "ccc", "d", "e", "f", "g"]),
        "flag": np.array([True, False, True, False, True, False, True]),
    }
    write_bintable(path, table, header_cards={"FOO": 42})
    out = read_bintable(path)
    np.testing.assert_allclose(out["x"], table["x"])
    np.testing.assert_array_equal(out["n"], table["n"])
    assert list(out["s"]) == list(table["s"])
    np.testing.assert_array_equal(out["flag"], table["flag"])


def test_chain_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    data = {"a": rng.standard_normal((4, 100)), "b_e": rng.random((4, 100))}
    internals = {"logpost": rng.standard_normal((4, 100))}
    ch = oc.Chains(data, internals, {"sampler": "nuts", "model_name": "m"})
    path = os.path.join(tmp_path, "chain.fits")
    savechain(path, ch)
    ch2 = loadchain(path)
    assert ch2.n_chains == 4 and ch2.n_draws == 100
    np.testing.assert_allclose(ch2["a"], data["a"])
    np.testing.assert_allclose(ch2.internals["logpost"], internals["logpost"])
    assert ch2.info["sampler"] == "nuts"


# ---------------------------------------------------------------------------
TRUE_PM = dict(pmra=50.0, pmdec=-30.0)
TRUE_ORB = dict(a=5.0, e=0.1, i=0.7, omega=0.5, Omega=1.5, tp=55000.0, M=1.1, plx=60.0)
TRUE_MASS = 30.0  # Mjup: big companion -> strong PM anomaly


def synth_hgca():
    """Build a synthetic HGCA row consistent with TRUE_ORB + TRUE_MASS."""
    orbit = VisualOrbit.from_params(**TRUE_ORB)
    m = TRUE_MASS * MJUP2MSOL

    ep_hip = 1991.25
    ep_gaia = 2016.0
    t_hip = (ep_hip - 2000.0) * JULIAN_YEAR_DAYS + J2000_MJD
    t_gaia = (ep_gaia - 2000.0) * JULIAN_YEAR_DAYS + J2000_MJD
    s_h = orbitsolve(orbit, jnp.asarray(t_hip))
    s_g = orbitsolve(orbit, jnp.asarray(t_gaia))

    pmra_hip = TRUE_PM["pmra"] + float(pmra(s_h, m))
    pmdec_hip = TRUE_PM["pmdec"] + float(pmdec(s_h, m))
    pmra_gaia = TRUE_PM["pmra"] + float(pmra(s_g, m))
    pmdec_gaia = TRUE_PM["pmdec"] + float(pmdec(s_g, m))
    pmra_hg = TRUE_PM["pmra"] + (
        float(raoff(s_g, m)) - float(raoff(s_h, m))
    ) / (t_gaia - t_hip) * JULIAN_YEAR_DAYS
    pmdec_hg = TRUE_PM["pmdec"] + (
        float(decoff(s_g, m)) - float(decoff(s_h, m))
    ) / (t_gaia - t_hip) * JULIAN_YEAR_DAYS

    return dict(
        pmra_hip=pmra_hip, pmdec_hip=pmdec_hip,
        pmra_hip_error=0.5, pmdec_hip_error=0.5, pmra_pmdec_hip=0.1,
        pmra_gaia=pmra_gaia, pmdec_gaia=pmdec_gaia,
        pmra_gaia_error=0.05, pmdec_gaia_error=0.05, pmra_pmdec_gaia=-0.2,
        pmra_hg=pmra_hg, pmdec_hg=pmdec_hg,
        pmra_hg_error=0.05, pmdec_hg_error=0.05, pmra_pmdec_hg=0.0,
        epoch_ra_hip=ep_hip, epoch_dec_hip=ep_hip,
        epoch_ra_gaia=ep_gaia, epoch_dec_gaia=ep_gaia,
        parallax_gaia=TRUE_ORB["plx"], parallax_gaia_error=0.1,
        nonlinear_dpmra=0.0, nonlinear_dpmdec=0.0,
    )


def hgca_model():
    row = synth_hgca()
    hgca_obs = HGCAInstantaneousObs(hgca=row, N_ave=1)
    b = oc.Planet(
        name="b",
        basis="Visual{KepOrbit}",
        variables=dict(
            a=TRUE_ORB["a"],
            e=TRUE_ORB["e"],
            i=TRUE_ORB["i"],
            omega=TRUE_ORB["omega"],
            Omega=TRUE_ORB["Omega"],
            tp=TRUE_ORB["tp"],
            mass=dist.Uniform(0.0, 100.0),
        ),
    )
    system = oc.System(
        name="hgcatest",
        variables=dict(
            M=TRUE_ORB["M"],
            plx=gaia_plx(hgca_row=row),
            pmra=dist.Normal(0, 200),
            pmdec=dist.Normal(0, 200),
        ),
        companions=[b],
        observations=[hgca_obs],
    )
    return oc.LogDensityModel(system, verbosity=0), row


def test_hgca_loglike_max_at_truth():
    model, row = hgca_model()
    # truth vector: mass, pmra, pmdec in the flat ordering
    names = model.parameter_names
    truth = {"pmra": TRUE_PM["pmra"], "pmdec": TRUE_PM["pmdec"],
             "plx": TRUE_ORB["plx"], "b_mass": TRUE_MASS}
    flat = np.asarray([truth[n] for n in names])
    nt = model.arr2nt(jnp.asarray(flat))
    ll_true = float(model.ln_like_nt(nt))
    # at exact truth all residuals vanish: ll equals the normalization
    h = row
    expected = 0.0
    for block in ("hip", "hg", "gaia"):
        s1, s2 = h[f"pmra_{block}_error"], h[f"pmdec_{block}_error"]
        rho = h[f"pmra_pmdec_{block}"]
        expected += -np.log(2 * np.pi) - 0.5 * np.log(
            s1**2 * s2**2 * (1 - rho**2)
        )
    np.testing.assert_allclose(ll_true, expected, rtol=1e-8)
    # perturbing the mass lowers the likelihood
    flat2 = flat.copy()
    flat2[names.index("b_mass")] += 5.0
    assert float(model.ln_like_nt(model.arr2nt(jnp.asarray(flat2)))) < ll_true


def test_hgca_mass_recovery_fit():
    model, _ = hgca_model()
    chain = oc.octofit(
        model,
        key=jax.random.PRNGKey(0),
        chains=4,
        adaptation=300,
        iterations=300,
        max_depth=8,
        verbosity=0,
    )
    mass = chain.flat("b_mass")
    pull = (mass.mean() - TRUE_MASS) / max(mass.std(), 1e-9)
    assert abs(pull) < 4, f"mass {mass.mean():.2f} +- {mass.std():.2f}"
    assert abs(chain.flat("pmra").mean() - TRUE_PM["pmra"]) < 0.5


def test_hgca_n_ave_averaging():
    row = synth_hgca()
    obs1 = HGCAInstantaneousObs(hgca=row, N_ave=1)
    obs5 = HGCAInstantaneousObs(hgca=row, N_ave=5)
    assert len(obs1.epochs) == 4
    assert len(obs5.epochs) == 20
