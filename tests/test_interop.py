"""NSS warm starts, Orbitize! HDF5 interop, RV archive loaders."""

import os

import jax
import numpy as np
import pytest

import octofitter_tpu as oc
from octofitter_tpu import distributions as dist
from octofitter_tpu.nss import (
    initialize_from_nss,
    nss_to_model_chain,
    nss_to_starting_point,
    query_nss,
    ti_to_campbell,
)
from octofitter_tpu.io.orbitize import loadhdf5, savehdf5
from octofitter_tpu.rv.data_sources import HARPS_RVBank_rvs, radvel_posterior

from test_model import quickstart_model, TRUE


NSS_ROW = dict(
    source_id=123,
    period=2000.0,
    eccentricity=0.25,
    t_periastron=100.0,
    a_thiele_innes=120.0,
    b_thiele_innes=-80.0,
    f_thiele_innes=60.0,
    g_thiele_innes=150.0,
    parallax=50.0,
    a_thiele_innes_error=5.0,
    b_thiele_innes_error=5.0,
    f_thiele_innes_error=5.0,
    g_thiele_innes_error=5.0,
    eccentricity_error=0.02,
    period_error=50.0,
    t_periastron_error=10.0,
    parallax_error=0.05,
)


def test_query_nss_row_passthrough():
    row = query_nss(row=NSS_ROW)
    assert row["period"] == 2000.0
    with pytest.raises(RuntimeError):
        query_nss(123)


def test_ti_to_campbell_roundtrip():
    import math

    i0, O0, w0, alpha0 = 0.7, 2.0, 1.1, 200.0
    A = alpha0 * (math.cos(O0) * math.cos(w0) - math.sin(O0) * math.sin(w0) * math.cos(i0))
    B = alpha0 * (math.sin(O0) * math.cos(w0) + math.cos(O0) * math.sin(w0) * math.cos(i0))
    F = alpha0 * (-math.cos(O0) * math.sin(w0) - math.sin(O0) * math.cos(w0) * math.cos(i0))
    G = alpha0 * (-math.sin(O0) * math.sin(w0) + math.cos(O0) * math.cos(w0) * math.cos(i0))
    i, O, w, alpha = ti_to_campbell(A, B, F, G)
    assert abs(alpha - alpha0) < 1e-8
    assert abs(i - i0) < 1e-8
    # node degeneracy: angles match mod pi
    assert abs((O - O0) % np.pi) < 1e-6 or abs(((O - O0) % np.pi) - np.pi) < 1e-6


def test_nss_to_starting_point_and_init():
    model = quickstart_model()
    mapped = nss_to_starting_point(NSS_ROW, model, planet_key="b")
    assert "b_e" in mapped and abs(mapped["b_e"] - 0.25) < 1e-12
    assert "b_a" in mapped  # from alpha/plx
    assert "b_omegax" in mapped  # UniformCircular mapping
    initialize_from_nss(model, NSS_ROW, verbosity=0)
    assert model.starting_points is not None


def test_nss_pseudo_chain():
    model = quickstart_model()
    ch = nss_to_model_chain(NSS_ROW, model, n_draws=2000)
    assert "b_i" in ch.data and "b_e" in ch.data
    assert abs(ch.flat("b_e").mean() - 0.25) < 0.01


def test_orbitize_roundtrip(tmp_path):
    model = quickstart_model()
    # build a small synthetic chain
    rng = np.random.default_rng(0)
    n = 500
    data = {
        "M": rng.normal(1.2, 0.05, n)[None],
        "plx": rng.normal(50.0, 0.02, n)[None],
        "b_a": rng.normal(10, 0.5, n)[None],
        "b_e": rng.uniform(0.1, 0.3, n)[None],
        "b_i": rng.uniform(0.5, 0.7, n)[None],
        "b_omega": rng.uniform(0, 2 * np.pi, n)[None],
        "b_Omega": rng.uniform(0, 2 * np.pi, n)[None],
        "b_tp": rng.uniform(56900, 57100, n)[None],
    }
    chain = oc.Chains(data, {}, {})
    path = os.path.join(tmp_path, "orbitize.hdf5")
    savehdf5(path, model, chain)
    back = loadhdf5(path)
    np.testing.assert_allclose(back.flat("b_a"), data["b_a"][0], rtol=1e-6)
    np.testing.assert_allclose(back.flat("b_e"), data["b_e"][0], rtol=1e-6)
    # tp reconstructed up to a period ambiguity
    P = np.sqrt(data["b_a"][0] ** 3 / data["M"][0]) * 365.2568983
    dtp = (back.flat("b_tp") - data["b_tp"][0]) / P
    np.testing.assert_allclose(dtp - np.round(dtp), 0.0, atol=1e-4)


def test_harps_loader(tmp_path):
    import pandas as pd

    path = os.path.join(tmp_path, "HARPS_RVBank_ver02.csv")
    pd.DataFrame(
        dict(
            target=["HD1", "HD1", "HD2"],
            BJD=[2455000.5, 2455001.5, 2455002.5],
            RV_mlc_nzp=[10.0, 12.0, -5.0],
            e_RV_mlc_nzp=[1.0, 1.1, 0.9],
        )
    ).to_csv(path, index=False)
    tab = HARPS_RVBank_rvs("HD1", path)
    assert len(tab["epoch"]) == 2
    np.testing.assert_allclose(tab["epoch"][0], 55000.0)
    with pytest.raises(KeyError):
        HARPS_RVBank_rvs("HD99", path)


def test_radvel_posterior():
    table = dict(
        per1=np.full(100, 1000.0),
        k1=np.full(100, 30.0),
        e1=np.full(100, 0.1),
        w1=np.full(100, 0.5),
    )
    ch = radvel_posterior(
        table, dist.Normal(1.0, 0.001), dist.Normal(50.0, 0.001)
    )
    msini = ch.flat("b_msini")
    assert np.all(np.isfinite(msini))
    # K=30 m/s, P=1000 d, M=1 -> roughly a Jupiter-and-a-half
    assert 0.5 < msini.mean() < 5.0
