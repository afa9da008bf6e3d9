"""Tests: interferometry, celerite GP, atmosphere grids, completeness."""

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import octofitter_tpu as oc
from octofitter_tpu import distributions as dist
from octofitter_tpu.interferometry import (
    InterferometryObs,
    closure_phases_deg,
    cvis_point_sources,
)
from octofitter_tpu.rv.celerite import RealTerm, SHOTerm, celerite_loglike
from octofitter_tpu.orbits import VisualOrbit, orbitsolve, raoff, decoff
from octofitter_tpu.constants import RAD2AS


# ---------------------------------------------------------------------------
# interferometry
def test_cvis_analytic_binary():
    # single companion: V = (1 + f e^{-2pi i (u dra + v ddec)}) / (1+f)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.uniform(1e6, 1e8, (6, 3)))
    v = jnp.asarray(rng.uniform(1e6, 1e8, (6, 3)))
    dra, ddec, f = 5.0, -3.0, 0.01
    cvis = cvis_point_sources(u, v, [jnp.asarray(dra)], [jnp.asarray(ddec)], [jnp.asarray(f)])
    mas2rad = 1 / (RAD2AS * 1000)
    arg = -2 * np.pi * (np.asarray(u) * dra + np.asarray(v) * ddec) * mas2rad
    expected = (1 + f * np.exp(1j * arg)) / (1 + f)
    np.testing.assert_allclose(np.asarray(cvis), expected, rtol=1e-10)


def test_closure_phase_triangle_consistency():
    # closure phase of a point source at the phase centre is zero
    u = jnp.asarray(np.random.default_rng(1).uniform(1e6, 1e8, (3, 2)))
    v = jnp.asarray(np.random.default_rng(2).uniform(1e6, 1e8, (3, 2)))
    cvis = cvis_point_sources(u, v, [jnp.asarray(0.0)], [jnp.asarray(0.0)], [jnp.asarray(0.3)])
    cp = closure_phases_deg(cvis, np.array([0]), np.array([1]), np.array([2]))
    np.testing.assert_allclose(np.asarray(cp), 0.0, atol=1e-10)


TRUE_VIS = dict(a=8.0, e=0.1, i=0.4, omega=1.0, Omega=2.0, tp=57000.0, M=1.3, plx=40.0)
TRUE_CONTRAST = 0.02


def _interf_epoch(epoch, seed):
    rng = np.random.default_rng(seed)
    n_base, n_wave = 6, 3
    u = rng.uniform(-1e8, 1e8, (n_base, n_wave))
    v = rng.uniform(-1e8, 1e8, (n_base, n_wave))
    i1, i2, i3 = np.array([0, 1, 2, 3]), np.array([1, 2, 3, 4]), np.array([2, 3, 4, 5])
    sol = orbitsolve(VisualOrbit.from_params(**TRUE_VIS), jnp.asarray(epoch))
    cvis = cvis_point_sources(
        jnp.asarray(u), jnp.asarray(v),
        [jnp.asarray(float(raoff(sol)))], [jnp.asarray(float(decoff(sol)))],
        [jnp.asarray(TRUE_CONTRAST)],
    )
    cps = np.asarray(closure_phases_deg(cvis, i1, i2, i3))
    return dict(
        epoch=epoch, u=u, v=v,
        cps_data=cps + rng.standard_normal(cps.shape) * 0.5,
        dcps=np.full(cps.shape, 0.5),
        vis2_data=np.abs(np.asarray(cvis)) ** 2,
        dvis2=np.full(u.shape, 0.01),
        index_cps1=i1, index_cps2=i2, index_cps3=i3,
        use_vis2=True,
    )


def test_interferometry_likelihood_peaks_at_truth():
    obs = InterferometryObs(
        [_interf_epoch(57000.0, 1), _interf_epoch(57100.0, 2)],
        variables=dict(flux=dist.Uniform(0.0, 0.2)),
        name="GRAVITY",
    )
    b = oc.Planet(
        name="b",
        basis="Visual{KepOrbit}",
        variables={k: v for k, v in TRUE_VIS.items() if k not in ("M", "plx")},
    )
    system = oc.System(
        name="vistest",
        variables=dict(M=TRUE_VIS["M"], plx=TRUE_VIS["plx"]),
        companions=[b],
        observations=[obs],
    )
    model = oc.LogDensityModel(system, verbosity=0)
    lls = []
    grid = np.linspace(0.005, 0.05, 19)
    for f in grid:
        lls.append(float(model.ln_like_nt(model.arr2nt(jnp.asarray([f])))))
    best = grid[int(np.argmax(lls))]
    assert abs(best - TRUE_CONTRAST) < 0.005
    val, grad = model.ln_post_and_grad(model.link(jnp.asarray([TRUE_CONTRAST])))
    assert np.isfinite(float(val)) and np.all(np.isfinite(np.asarray(grad)))


# ---------------------------------------------------------------------------
# celerite
def test_celerite_matches_dense():
    rng = np.random.default_rng(0)
    t = jnp.asarray(np.sort(rng.uniform(0, 100, 50)))
    y = jnp.asarray(rng.standard_normal(50))
    var = jnp.asarray(rng.uniform(0.5, 2.0, 50))
    for term in [
        SHOTerm(S0=2.0, w0=0.5, Q=3.0),
        RealTerm(a=1.5, c=0.1),
        SHOTerm(1.0, 0.3, 1.0) + RealTerm(0.5, 0.05),
    ]:
        K = np.asarray(term.matrix(t, t)) + np.diag(np.asarray(var))
        _, logdet = np.linalg.slogdet(K)
        ll_ref = (
            -0.5 * np.asarray(y) @ np.linalg.solve(K, np.asarray(y))
            - 0.5 * logdet - 25 * np.log(2 * np.pi)
        )
        ll = float(celerite_loglike(term, t, y, var))
        np.testing.assert_allclose(ll, ll_ref, rtol=1e-9)


def test_celerite_gradients():
    rng = np.random.default_rng(1)
    t = jnp.asarray(np.sort(rng.uniform(0, 50, 30)))
    y = jnp.asarray(rng.standard_normal(30))
    var = jnp.asarray(np.full(30, 1.0))

    def f(S0):
        return celerite_loglike(SHOTerm(S0, 0.5, 3.0), t, y, var)

    g = float(jax.grad(f)(2.0))
    fd = (float(f(2.0 + 1e-5)) - float(f(2.0 - 1e-5))) / 2e-5
    np.testing.assert_allclose(g, fd, rtol=1e-4)


def test_celerite_in_rv_model():
    from test_rv import make_rv_data

    gp = lambda theta_obs: SHOTerm(
        S0=theta_obs.gp_S0, w0=theta_obs.gp_w0, Q=3.0
    )
    from octofitter_tpu.rv import StarAbsoluteRVObs

    data = make_rv_data(n=30)
    rvobs = StarAbsoluteRVObs(
        data,
        dict(
            offset=dist.Normal(0, 100.0),
            jitter=dist.LogUniform(0.01, 30.0),
            gp_S0=dist.LogUniform(0.1, 100.0),
            gp_w0=dist.LogUniform(0.01, 1.0),
        ),
        name="inst",
        gaussian_process=gp,
    )
    b = oc.Planet(
        name="b",
        basis="RadialVelocityOrbit",
        variables=dict(
            a=dist.Uniform(0.01, 1.0), e=0.1, omega=0.5,
            tp=57000.0, mass=dist.Uniform(0.0, 20.0),
        ),
    )
    model = oc.LogDensityModel(
        oc.System(name="rvcel", variables=dict(M=1.0), companions=[b],
                  observations=[rvobs]),
        verbosity=0,
    )
    theta_t = model.link(model.sample_priors(jax.random.PRNGKey(0)))
    val, grad = model.ln_post_and_grad(theta_t)
    assert np.isfinite(float(val)) and np.all(np.isfinite(np.asarray(grad)))


# ---------------------------------------------------------------------------
# atmosphere grids
def test_sonora_interpolator(tmp_path):
    # synthetic mag_table: mag = 10 - 3*log10(Teff/1000) + 0.05*mass
    path = os.path.join(tmp_path, "mag_table+0.0")
    rng = np.random.default_rng(0)
    lines = ["header"] * 5
    for _ in range(300):
        teff = rng.uniform(300, 2400)
        mass = rng.uniform(1, 80)
        mag = 10 - 3 * np.log10(teff / 1000) + 0.05 * mass
        row = [teff, 4.5, mass, 0.1, 0.28, 2.0] + [mag] * 25
        lines.append("  ".join(f"{x:9.3f}" for x in row))
    with open(path, "w") as f:
        f.write("\n".join(lines))

    from octofitter_tpu.atmosphere import sonora_photometry_interpolator

    itp = sonora_photometry_interpolator("MKO_K", path)
    got = float(itp(1000.0, 30.0))
    want = 10 - 3 * np.log10(1.0) + 0.05 * 30
    assert abs(got - want) < 0.1
    # differentiable
    g = float(jax.grad(lambda m: itp(1000.0, m))(30.0))
    assert abs(g - 0.05) < 0.02
    # outside domain -> NaN
    assert np.isnan(float(itp(10000.0, 30.0)))


# ---------------------------------------------------------------------------
# completeness
def test_completeness_map_tiny():
    from octofitter_tpu.analysis.completeness import completeness_map
    from test_generate_and_cv import plain_model

    base = plain_model(n=6)
    # add a mass variable so we can inject one
    import octofitter_tpu as oc

    astrom = base.system.planets[0].observations[0]
    b = oc.Planet(
        name="b",
        basis="Visual{KepOrbit}",
        variables=dict(
            a=dist.Uniform(0.001, 100.0),
            e=0.2, i=0.6, omega=1.0, Omega=2.0,
            tp=dist.Uniform(56000.0, 58000.0),
            mass=dist.Uniform(0.0, 100.0),
        ),
        observations=[astrom],
    )
    system = oc.System(
        name="comp",
        variables=dict(
            M=dist.truncated(dist.Normal(1.2, 0.1), lower=0.1),
            plx=dist.truncated(dist.Normal(50.0, 0.02), lower=0.1),
        ),
        companions=[b],
    )
    model = oc.LogDensityModel(system, verbosity=0)

    def sampler(m):
        return oc.octofit(m, chains=2, adaptation=150, iterations=100,
                          max_depth=7, verbosity=0)

    cmap, results = completeness_map(
        model,
        sampler,
        # detection: posterior sma well constrained near injected value
        lambda chain, theta: chain.flat("b_a").std() < 5.0,
        inject=lambda m, s: {"b_mass": m, "b_a": s},
        masses=[10.0],
        separations=[10.0],
        n_trials=2,
        verbosity=0,
    )
    assert cmap.n_total.sum() == 2
    assert cmap.completeness.shape == (1, 1)
    assert 0.0 <= cmap.completeness[0, 0] <= 1.0


# ---------------------------------------------------------------------------
# GRAVITY wide kernel phases
def test_gravity_kp_likelihood():
    from octofitter_tpu.interferometry import GRAVITYWideKPObs, fiber_coupling_fraction

    # fiber coupling: ~1 at zero offset, decreasing with offset
    c = fiber_coupling_fraction([0.0, 20.0, 60.0], 2.2e-6, n_grid=200)
    assert c[0] > 0.95
    assert c[0] > c[1] > c[2]

    rng = np.random.default_rng(0)
    n_wave = 4
    eff_wave = np.linspace(2.0e-6, 2.4e-6, n_wave)
    # 6 baselines, 4 triangles (VLTI)
    u = rng.uniform(-1e8, 1e8, (6, n_wave))
    v = rng.uniform(-1e8, 1e8, (6, n_wave))
    i1, i2, i3 = np.array([0, 0, 1, 3]), np.array([3, 4, 5, 4]), np.array([1, 2, 2, 5])

    sol = orbitsolve(VisualOrbit.from_params(**TRUE_VIS), jnp.asarray(57000.0))
    cvis = cvis_point_sources(
        jnp.asarray(u), jnp.asarray(v),
        [jnp.asarray(float(raoff(sol)))], [jnp.asarray(float(decoff(sol)))],
        [jnp.asarray(TRUE_CONTRAST)],
    )
    cps = np.asarray(closure_phases_deg(cvis, i1, i2, i3))
    row = dict(
        epoch=57000.0, u=u, v=v, eff_wave=eff_wave,
        cps_data=cps + 0.2 * rng.standard_normal(cps.shape),
        dcps=np.full(cps.shape, 0.2),
        index_cps1=i1, index_cps2=i2, index_cps3=i3,
    )
    obs = GRAVITYWideKPObs([row], variables=dict(
        flux=dist.Uniform(0.0, 0.2),
        kp_jitter=dist.LogUniform(1e-3, 1.0),
        kp_Cy=dist.Uniform(0.0, 0.9),
    ), name="GRAV")
    b = oc.Planet(
        name="b", basis="Visual{KepOrbit}",
        variables={k: v for k, v in TRUE_VIS.items() if k not in ("M", "plx")},
    )
    model = oc.LogDensityModel(
        oc.System(name="grav", variables=dict(M=TRUE_VIS["M"], plx=TRUE_VIS["plx"]),
                  companions=[b], observations=[obs]),
        verbosity=0,
    )
    names = model.parameter_names
    def ll_at(f):
        flat = np.zeros(model.D)
        flat[names.index("GRAV_flux")] = f
        flat[names.index("GRAV_kp_jitter")] = 0.05
        flat[names.index("GRAV_kp_Cy")] = 0.1
        return float(model.ln_like_nt(model.arr2nt(jnp.asarray(flat))))
    lls = [ll_at(f) for f in np.linspace(0.005, 0.05, 10)]
    best = np.linspace(0.005, 0.05, 10)[int(np.argmax(lls))]
    assert abs(best - TRUE_CONTRAST) < 0.01
    theta_t = model.link(jnp.asarray([0.02, 0.05, 0.1])[np.argsort([names.index(n) for n in ["GRAV_flux","GRAV_kp_jitter","GRAV_kp_Cy"]])])
    val, grad = model.ln_post_and_grad(theta_t)
    assert np.isfinite(float(val)) and np.all(np.isfinite(np.asarray(grad)))


def test_typed_config_env_overrides(monkeypatch):
    """Typed config dataclass + OCTOFITTER_* env overrides (SURVEY
    section 5 config/flag system)."""
    from octofitter_tpu.config import config_from_env, get_config, set_config

    cfg = config_from_env(env={})
    assert cfg.sampler == "chees" and cfg.chains == 4

    cfg = config_from_env(env={
        "OCTOFITTER_SAMPLER": "hmc",
        "OCTOFITTER_CHAINS": "128",
        "OCTOFITTER_TARGET_ACCEPT": "0.9",
        "OCTOFITTER_ENABLE_X64": "true",
        "OCTO_GOST_CATALOG": "/data/gost.csv",
    })
    assert cfg.sampler == "hmc"
    assert cfg.chains == 128
    assert abs(cfg.target_accept - 0.9) < 1e-12
    assert cfg.enable_x64 is True
    assert cfg.gost_catalog == "/data/gost.csv"

    # programmatic override round-trip on the global config
    old = get_config().verbosity
    try:
        assert set_config(verbosity=3).verbosity == 3
        import pytest as _p
        with _p.raises(AttributeError):
            set_config(nonsense=1)
    finally:
        set_config(verbosity=old)


def test_timing_probe_and_profile_trace(tmp_path):
    """Profiler hooks: timing probe + a real jax.profiler trace."""
    import jax.numpy as jnp
    from octofitter_tpu.utils import profile_trace, timing_probe

    def f(x):
        return jnp.sum(x * x)

    out = timing_probe(f, jnp.arange(1000.0), n_iter=5)
    assert out["compile_s"] > 0 and out["per_iter_s"] > 0
    assert out["compile_s"] > out["per_iter_s"]

    logdir = str(tmp_path / "prof")
    with profile_trace(logdir):
        jax.block_until_ready(jax.jit(f)(jnp.arange(100.0)))
    import os as _os
    found = []
    for root, dirs, files in _os.walk(logdir):
        found += files
    assert found  # trace files were written


def test_native_fasttable_parser(tmp_path):
    """C++ fasttable parser: numeric parity with numpy/pandas, NaN for
    strings, ragged-row detection, GOST loader fast path equivalence."""
    from octofitter_tpu import native

    assert native.available(), "native parser must build in this environment"

    # whitespace table with comments
    p = tmp_path / "tab.txt"
    p.write_text("# comment\n1 2.5 3e-2\n-4 5 6\n\n7 8 9.25\n")
    arr = native.parse_numeric_table(str(p))
    np.testing.assert_allclose(
        arr, [[1, 2.5, 0.03], [-4, 5, 6], [7, 8, 9.25]]
    )

    # csv with a string column -> NaN
    c = tmp_path / "tab.csv"
    c.write_text("name, x, y\nalpha,1.5,2\nbeta,-3,4e1\n")
    cols = native.read_csv_columns(str(c))
    assert set(cols) == {"name", "x", "y"}
    assert np.isnan(cols["name"]).all()
    np.testing.assert_allclose(cols["x"], [1.5, -3])
    np.testing.assert_allclose(cols["y"], [2, 40])

    # ragged rows error
    r = tmp_path / "ragged.txt"
    r.write_text("1 2 3\n4 5\n")
    import pytest as _p
    with _p.raises(RuntimeError):
        native.parse_numeric_table(str(r))

    # GOST loader: native fast path == pandas fallback
    from octofitter_tpu.astrom.scanlaw import load_gost_csv
    import pandas as pd

    g = tmp_path / "gost.csv"
    rng = np.random.default_rng(0)
    n = 500
    jd = 2457000 + np.sort(rng.uniform(0, 1000, n))
    ang = rng.uniform(-np.pi, np.pi, n)
    parf = rng.uniform(-0.7, 0.7, n)
    with open(g, "w") as f:
        f.write("Target, scanAngle[rad], parallaxFactorAlongScan,"
                " ObservationTimeAtBarycentre[BarycentricJulianDateInTCB]\n")
        for i in range(n):
            f.write(f"star,{ang[i]:.17g},{parf[i]:.17g},{jd[i]:.17g}\n")
    t_native = load_gost_csv(str(g))
    # force the pandas path by passing a parsed dict
    df = pd.read_csv(g)
    t_pandas = load_gost_csv({c: df[c] for c in df.columns if c != "Target"})
    for k in ("epoch", "cosphi", "sinphi", "parallaxFactorAlongScan"):
        np.testing.assert_allclose(t_native[k], t_pandas[k], rtol=1e-12)


def test_dataset_registry(tmp_path, monkeypatch):
    """Zero-egress DataDeps equivalent (`Octofitter.jl:166-343`):
    registry resolution order and staging-instruction errors."""
    from octofitter_tpu import datadeps

    ds = datadeps.list_datasets()
    assert {d.name for d in ds} >= {
        "HGCA_eDR3", "Hipparcos_IAD", "DE440_ephemeris", "Sonora_Bobcat",
        "BHAC15", "G23H_catalog", "G23H_DR2Transits", "whereistheplanet",
    }

    # staged file under the data root resolves
    monkeypatch.setenv("OCTOFITTER_DATA_DIR", str(tmp_path))
    f = tmp_path / "HGCA_vEDR3.fits"
    f.write_bytes(b"x")
    assert datadeps.resolve_dataset("HGCA_eDR3") == str(f)

    # per-dataset env var wins
    g = tmp_path / "elsewhere.fits"
    g.write_bytes(b"y")
    monkeypatch.setenv("OCTOFITTER_DATA_HGCA_EDR3", str(g))
    assert datadeps.resolve_dataset("HGCA_eDR3") == str(g)

    # explicit path wins over everything
    assert datadeps.resolve_dataset("HGCA_eDR3", path=str(f)) == str(f)

    # missing dataset: error mentions the upstream URL and loader
    import pytest as _p
    with _p.raises(FileNotFoundError) as ei:
        datadeps.resolve_dataset("BHAC15")
    assert "perso.ens-lyon.fr" in str(ei.value)
    with _p.raises(KeyError):
        datadeps.resolve_dataset("nope")


def test_dataset_fetch(tmp_path, monkeypatch):
    """The downloader path (DataDeps `download` step): fetch over a
    file:// URL into the data root, atomic rename, checksum gate,
    cache hit on the second call."""
    import hashlib

    from octofitter_tpu import datadeps

    src = tmp_path / "upstream" / "HGCA_vEDR3.fits"
    src.parent.mkdir()
    payload = b"hgca-bytes" * 100
    src.write_bytes(payload)
    url = "file://" + str(src)

    root = tmp_path / "data"
    monkeypatch.setenv("OCTOFITTER_DATA_DIR", str(root))

    # checksum mismatch: nothing lands in the cache
    import pytest as _p
    with _p.raises(IOError):
        datadeps.fetch_dataset("HGCA_eDR3", url=url, sha256="0" * 64)
    assert not (root / "HGCA_vEDR3.fits").exists()
    assert not list(root.glob(".*part*"))  # temp file cleaned up

    # good checksum: file lands under data_dir and resolves
    sha = hashlib.sha256(payload).hexdigest()
    p = datadeps.fetch_dataset("HGCA_eDR3", url=url, sha256=sha)
    assert p == str(root / "HGCA_vEDR3.fits")
    assert open(p, "rb").read() == payload
    assert datadeps.resolve_dataset("HGCA_eDR3") == p

    # second call is a cache hit: no re-download (delete the source)
    src.unlink()
    assert datadeps.fetch_dataset("HGCA_eDR3", url=url) == p

    # force re-download against a dead source raises but keeps cache
    with _p.raises(Exception):
        datadeps.fetch_dataset("HGCA_eDR3", url=url, force=True)
    assert open(p, "rb").read() == payload

    # datasets without a fetchable URL give staging instructions
    with _p.raises(ValueError) as ei:
        datadeps.fetch_dataset("G23H_catalog", force=True)
    assert "stage" in str(ei.value)


def test_dr4_completeness_example_fast(tmp_path, monkeypatch):
    """examples/11_dr4_completeness.py (reference
    examples/completeness_dr4/ workflow) in --fast mode: real GOST
    DR4-baseline scan law, injection-recovery over a 2x2 grid, both
    heavy-companion cells recovered."""
    pytest.importorskip("pandas")
    import importlib.util

    ex_path = os.path.join(os.path.dirname(__file__), os.pardir,
                           "examples", "11_dr4_completeness.py")
    gost = "/root/reference/docs/src/GOST-42.03733343244703--31.42348623214663-dr4.csv"
    if not os.path.exists(gost):
        pytest.skip("GOST DR4 CSV not available")
    monkeypatch.setenv("OCTOFITTER_TEST_MODE", "unit")  # forces FAST grid
    monkeypatch.chdir(tmp_path)
    spec = importlib.util.spec_from_file_location("ex11", ex_path)
    ex11 = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ex11)
    assert ex11.FAST
    cmap = ex11.main()
    # 2 and 20 Mjup at 0.07 mas AL noise are unmissable
    assert np.all(cmap.n_total == 1)
    assert float(cmap.completeness[1, 1]) == 1.0
    assert os.path.exists(tmp_path / "dr4_completeness.png")
