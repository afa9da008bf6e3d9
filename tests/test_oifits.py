"""OIFITS ingestion tests: synthesize an OIFITS file with the package's
own FITS codec, construct InterferometryObs from `filename` rows, and
check parity against direct array construction (reference
`OctofitterInterferometry.jl:32-118`)."""

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import octofitter_tpu as oc
from octofitter_tpu.interferometry import (
    InterferometryObs,
    cp_indices,
    load_oifits,
)
from octofitter_tpu.io.fits import write_bintables


def _synth_oifits(path, n_wave=3, zero_cp_err=False):
    """3-station array: 3 baselines, 1 closure triangle, one exposure."""
    rng = np.random.default_rng(0)
    eff_wave = np.linspace(1.5e-6, 2.4e-6, n_wave)
    # station pairs for baselines (1,2), (1,3), (2,3); triangle (1,2,3)
    sta_vis2 = np.array([[1, 2], [1, 3], [2, 3]])
    sta_t3 = np.array([[1, 2, 3]])
    ucoord = np.array([30.0, -12.0, 55.0])
    vcoord = np.array([10.0, 70.0, -25.0])
    vis2 = rng.uniform(0.4, 1.0, (3, n_wave))
    vis2_err = np.full((3, n_wave), 0.05)
    t3phi = rng.uniform(-20.0, 20.0, (1, n_wave))
    t3phierr = np.zeros((1, n_wave)) if zero_cp_err else np.full((1, n_wave), 3.0)
    mjd3 = np.full(3, 59000.0)

    write_bintables(
        path,
        [
            ({"EFF_WAVE": eff_wave}, {"EXTNAME": "OI_WAVELENGTH"}),
            (
                {
                    "UCOORD": ucoord,
                    "VCOORD": vcoord,
                    "VIS2DATA": vis2,
                    "VIS2ERR": vis2_err,
                    "STA_INDEX": sta_vis2,
                    "MJD": mjd3,
                },
                {"EXTNAME": "OI_VIS2"},
            ),
            (
                {
                    "T3PHI": t3phi,
                    "T3PHIERR": t3phierr,
                    "STA_INDEX": sta_t3,
                    "MJD": np.full(1, 59000.0),
                },
                {"EXTNAME": "OI_T3"},
            ),
        ],
    )
    return dict(
        eff_wave=eff_wave, ucoord=ucoord, vcoord=vcoord, vis2=vis2,
        vis2_err=vis2_err, t3phi=t3phi, t3phierr=t3phierr,
    )


def test_load_oifits_roundtrip(tmp_path):
    path = os.path.join(tmp_path, "synth.oifits")
    truth = _synth_oifits(path)
    row = load_oifits(path)
    assert row["epoch"] == 59000.0
    np.testing.assert_allclose(
        row["u"], truth["ucoord"][:, None] / truth["eff_wave"][None, :]
    )
    np.testing.assert_allclose(
        row["v"], truth["vcoord"][:, None] / truth["eff_wave"][None, :]
    )
    np.testing.assert_allclose(row["vis2_data"], truth["vis2"])
    np.testing.assert_allclose(row["cps_data"], truth["t3phi"])
    np.testing.assert_allclose(row["dcps"], np.maximum(2.0, truth["t3phierr"]))
    # closure triangle (1,2,3): baselines (1,2)+(2,3)-(1,3) -> rows 0,2,1
    np.testing.assert_array_equal(row["index_cps1"], [0])
    np.testing.assert_array_equal(row["index_cps2"], [2])
    np.testing.assert_array_equal(row["index_cps3"], [1])


def test_load_oifits_wavelength_window_and_clamp(tmp_path):
    path = os.path.join(tmp_path, "synth2.oifits")
    truth = _synth_oifits(path, n_wave=5, zero_cp_err=True)
    with pytest.warns(UserWarning):
        row = load_oifits(
            path,
            wavelength_min_meters=1.6e-6,
            wavelength_max_meters=2.3e-6,
        )
    keep = (truth["eff_wave"] > 1.6e-6) & (truth["eff_wave"] < 2.3e-6)
    assert row["u"].shape[1] == keep.sum()
    assert np.all(row["dcps"] >= 2.0)  # zero errors clamped
    with pytest.raises(ValueError):
        load_oifits(path, wavelength_min_meters=1e-5)


def test_cp_indices_multi_exposure():
    """Two exposure blocks: matches stay within their own block."""
    sta_vis2 = np.array([[1, 2], [1, 3], [2, 3]] * 2)
    sta_t3 = np.array([[1, 2, 3]] * 2)
    i1, i2, i3 = cp_indices(sta_vis2, sta_t3)
    np.testing.assert_array_equal(i1, [0, 3])
    np.testing.assert_array_equal(i2, [2, 5])
    np.testing.assert_array_equal(i3, [1, 4])


def test_interferometry_obs_from_filename_matches_arrays(tmp_path):
    """InterferometryObs(filename=...) gives the same log-likelihood as
    direct array construction."""
    path = os.path.join(tmp_path, "synth3.oifits")
    _synth_oifits(path)
    row = load_oifits(path, use_vis2=True)

    obs_file = InterferometryObs(
        [dict(filename=path, use_vis2=True)],
        variables=dict(flux=lambda s, p, o: jnp.asarray([1e-2])),
        name="vlti",
    )
    obs_arrays = InterferometryObs(
        [row],
        variables=dict(flux=lambda s, p, o: jnp.asarray([1e-2])),
        name="vlti",
    )

    from octofitter_tpu import distributions as dist

    def build(obs):
        b = oc.Planet(
            name="b", basis="Visual{KepOrbit}",
            variables=dict(
                a=dist.Uniform(0.5, 50.0), e=0.1, i=0.5, omega=1.0,
                Omega=2.0, tp=58000.0,
            ),
            observations=[obs],
        )
        sysm = oc.System(
            name="ifsys",
            variables=dict(M=1.0, plx=20.0),
            companions=[b],
        )
        return oc.LogDensityModel(sysm, verbosity=0)

    m1 = build(obs_file)
    m2 = build(obs_arrays)
    theta_t = m1.link(jnp.asarray([8.0]))
    l1 = float(m1.ln_post(theta_t))
    l2 = float(m2.ln_post(theta_t))
    assert np.isfinite(l1)
    np.testing.assert_allclose(l1, l2, rtol=1e-12)
