"""Convention regression tests.

1. northangle sign convention between the (sep, pa) and (ra, dec)
   branches of PlanetRelAstromObs (reference regression for issue #141,
   `test/unit/likelihoods.jl:32-60`).
2. Earth-ephemeris accuracy bound against recorded DE-grade positions
   (the reference uses DE440 via SPICE, `gaia-utils.jl:101-181`; our
   analytic almanac series must stay within a stated bound, which maps
   to a sub-mas parallax-factor error).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

import octofitter_tpu as oc
from octofitter_tpu import distributions as dist
from octofitter_tpu.likelihoods.relastrom import PlanetRelAstromObs
from octofitter_tpu.orbits import VisualOrbit, orbitsolve, raoff, decoff


def _northangle_ll(table_kwargs, northangle_value):
    obs = PlanetRelAstromObs(
        table_kwargs,
        variables=dict(northangle=dist.Uniform(-0.5, 0.5)),
        name="astromna",
    )
    b = oc.Planet(
        name="b", basis="Visual{KepOrbit}",
        variables=dict(a=15.0, e=0.2, i=0.6, omega=0.3, Omega=1.1,
                       tp=50000.0),
        observations=[obs],
    )
    system = oc.System(
        name="nasys", variables=dict(M=1.2, plx=50.0), companions=[b],
    )
    m = oc.LogDensityModel(system, verbosity=0)
    i_na = m.parameter_names.index("b_astromna_northangle")
    flat = np.zeros(m.D)
    flat[i_na] = northangle_value
    return float(m.ln_like_nt(m.arr2nt(jnp.asarray(flat))))


def test_northangle_consistent_between_seppa_and_radec():
    """The northangle nuisance must rotate the data the same way on the
    sky whether astrometry is (sep, pa) or (ra, dec) (issue #141)."""
    epochs = np.array([50000.0, 50300.0, 50600.0, 50900.0, 51200.0])
    orb = VisualOrbit.from_params(
        plx=50.0, M=1.2, a=15.0, e=0.2, i=0.6, omega=0.3, Omega=1.1,
        tp=50000.0,
    )
    sol = orbitsolve(orb, jnp.asarray(epochs))
    ra_m = np.asarray(raoff(sol))
    dec_m = np.asarray(decoff(sol))
    pa_m = np.arctan2(ra_m, dec_m)      # North through East
    sep_m = np.hypot(ra_m, dec_m)

    eps = 0.05  # rotate the data by a known PA offset
    pa_d = pa_m + eps
    ra_d = sep_m * np.sin(pa_d)
    dec_d = sep_m * np.cos(pa_d)
    n = len(epochs)

    tab_seppa = dict(epoch=epochs, sep=sep_m, pa=pa_d,
                     σ_sep=np.full(n, 1.0), σ_pa=np.full(n, 0.001))
    tab_radec = dict(epoch=epochs, ra=ra_d, dec=dec_d,
                     σ_ra=np.full(n, 0.05), σ_dec=np.full(n, 0.05))

    # The correct northangle value must (a) maximize both branches and
    # (b) do so at the SAME sign.
    for na_good, na_bad in [(-eps, eps)]:
        ll_sp_good = _northangle_ll(tab_seppa, na_good)
        ll_rd_good = _northangle_ll(tab_radec, na_good)
        ll_sp_bad = _northangle_ll(tab_seppa, na_bad)
        ll_rd_bad = _northangle_ll(tab_radec, na_bad)
        # at the compensating angle both branches recover the unrotated
        # model: likelihood near its maximum
        assert ll_sp_good > ll_sp_bad + 10, (ll_sp_good, ll_sp_bad)
        assert ll_rd_good > ll_rd_bad + 10, (ll_rd_good, ll_rd_bad)

    # scan northangle: the argmax of the two branches must agree
    nas = np.linspace(-0.2, 0.2, 81)
    lls_sp = [_northangle_ll(tab_seppa, v) for v in nas]
    lls_rd = [_northangle_ll(tab_radec, v) for v in nas]
    assert abs(nas[np.argmax(lls_sp)] - nas[np.argmax(lls_rd)]) < 0.011
    assert abs(nas[np.argmax(lls_sp)] - (-eps)) < 0.011


def test_earth_ephemeris_accuracy_bound():
    """Analytic Earth ephemeris vs recorded barycentric positions.

    Recorded values (equatorial J2000, AU) from the JPL DE ephemerides:
      J2000.0 (MJD 51544.5):   (-0.1771,  0.8875,  0.3848)
    plus geometric gates at the 2019 equinox/solstice. Tolerance
    1.5e-2 AU: for a plx = 100 mas source this bounds the
    parallax-factor error at ~1.5 mas worst case, and ~0.15 mas for a
    typical 10 mas-parallax target — documented accuracy of the
    ephemeris path (reference uses DE440, `gaia-utils.jl:101-181`).
    """
    from octofitter_tpu.astrom.ephemeris import earth_position_au

    p = earth_position_au(51544.5)
    got = np.array([p["x"], p["y"], p["z"]])
    want = np.array([-0.1771, 0.8875, 0.3848])
    assert np.abs(got - want).max() < 1.5e-2

    # heliocentric radius stays within Earth's perihelion/aphelion over
    # a full orbit (earth_position_au is BARYCENTRIC — the Sun's ~5e-3
    # AU barycentric wobble must be removed before this geometric gate)
    from octofitter_tpu.astrom.vsop87 import sun_barycentric_xyz

    mjd = np.linspace(51544.5, 51544.5 + 366, 500)
    p = earth_position_au(mjd)
    sx, sy, sz = sun_barycentric_xyz(mjd)
    r = np.sqrt((p["x"] - sx) ** 2 + (p["y"] - sy) ** 2 + (p["z"] - sz) ** 2)
    assert r.min() > 0.982 and r.max() < 1.018

    # 2019 March equinox (MJD 58562.4): Sun at RA~0 -> Earth x ~ -1 AU
    p = earth_position_au(58562.4)
    assert p["x"] < -0.975
    assert abs(p["y"]) < 0.05 and abs(p["z"]) < 0.03

    # 2019 June solstice (MJD 58655.7): Sun at RA 6h, dec +23.4 deg ->
    # Earth y,z negative with z/y ~ tan(obliquity-projected)
    p = earth_position_au(58655.7)
    assert p["y"] < -0.8 and p["z"] < -0.3

    # annual periodicity: one Julian year later the position returns
    p1 = earth_position_au(51544.5)
    p2 = earth_position_au(51544.5 + 365.25)
    d = np.hypot(p1["x"] - p2["x"], p1["y"] - p2["y"])
    assert d < 0.03
