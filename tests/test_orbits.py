"""Orbit element / accessor golden tests.

Checks the solution accessors against independent closed-form formulas
(Orbitize!/PlanetOrbits conventions, reference `docs/src/kepler.md` and
`src/parameterizations.jl:34-37,207-211`).
"""

import jax
import jax.numpy as jnp
import numpy as np

from octofitter_tpu.constants import (
    AUDAY_TO_MS,
    JULIAN_YEAR_DAYS,
    KEPLER_YEAR_DAYS,
)
from octofitter_tpu.orbits import (
    KepOrbit,
    RadialVelocityOrbit,
    ThieleInnesOrbit,
    VisualOrbit,
    decoff,
    eccanom,
    orbitsolve,
    period,
    pmdec,
    pmra,
    posangle,
    posx,
    posy,
    posz,
    projectedseparation,
    radvel,
    raoff,
    semimajoraxis,
    thiele_innes_to_campbell,
    trueanom,
)


def mk_visual(a=7.0, e=0.3, i=0.6, omega=1.1, Omega=2.2, tp=55000.0, M=1.4, plx=40.0):
    return VisualOrbit.from_params(a=a, e=e, i=i, omega=omega, Omega=Omega, tp=tp, M=M, plx=plx)


def test_period_and_kepler3():
    o = mk_visual(a=1.0, M=1.0)
    # 1 AU, 1 Msun -> one Kepler year
    assert abs(float(period(o)) - KEPLER_YEAR_DAYS) < 1e-9


def test_position_against_rotation_formula():
    o = mk_visual()
    t = jnp.linspace(55000.0, 58000.0, 17)
    sol = orbitsolve(o, t)

    # Independent computation via the r/nu rotation formulas quoted at
    # reference parameterizations.jl:207-211
    nu = np.asarray(trueanom(sol))
    a, e, inc, w, O = 7.0, 0.3, 0.6, 1.1, 2.2
    r = a * (1 - e**2) / (1 + e * np.cos(nu))
    x_au = r * (np.cos(nu + w) * np.sin(O) + np.sin(nu + w) * np.cos(inc) * np.cos(O))
    y_au = r * (np.cos(nu + w) * np.cos(O) - np.sin(nu + w) * np.cos(inc) * np.sin(O))
    z_au = r * (np.sin(nu + w) * np.sin(inc))

    np.testing.assert_allclose(np.asarray(posx(sol)), x_au, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(posy(sol)), y_au, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(posz(sol)), z_au, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(raoff(sol)), x_au * 40.0, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(decoff(sol)), y_au * 40.0, rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(projectedseparation(sol)), np.hypot(x_au, y_au) * 40.0, rtol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(posangle(sol)), np.arctan2(x_au, y_au), rtol=1e-10
    )


def test_velocities_against_finite_difference():
    o = mk_visual()
    t0 = 56123.0
    dt = 0.001  # days
    s0 = orbitsolve(o, jnp.asarray(t0 - dt))
    s1 = orbitsolve(o, jnp.asarray(t0 + dt))
    sol = orbitsolve(o, jnp.asarray(t0))
    # pmra/pmdec in mas/yr
    pmra_fd = (raoff(s1) - raoff(s0)) / (2 * dt) * JULIAN_YEAR_DAYS
    pmdec_fd = (decoff(s1) - decoff(s0)) / (2 * dt) * JULIAN_YEAR_DAYS
    assert abs(float(pmra(sol) - pmra_fd)) < 1e-4
    assert abs(float(pmdec(sol) - pmdec_fd)) < 1e-4
    # radvel in m/s = d(posz)/dt
    rv_fd = (posz(s1) - posz(s0)) / (2 * dt) * AUDAY_TO_MS
    assert abs(float(radvel(sol) - rv_fd)) < 1e-3


def test_rv_semi_amplitude():
    # RV-only orbit: K = 2 pi a / (P sqrt(1-e^2)) with sin(i)=1
    a, e, M = 1.5, 0.2, 1.0
    o = RadialVelocityOrbit.from_params(a=a, e=e, omega=0.7, tp=55000.0, M=M)
    t = jnp.linspace(55000.0, 55000.0 + float(period(o)), 4001)
    rv = np.asarray(radvel(orbitsolve(o, t)))
    P_days = float(period(o))
    K_expected = (
        2 * np.pi * a / (P_days * np.sqrt(1 - e**2)) * AUDAY_TO_MS
    )
    amp = (rv.max() - rv.min()) / 2
    # max-min/2 equals K for an RV curve K(cos(nu+w)+e cos w)
    np.testing.assert_allclose(amp, K_expected, rtol=1e-5)


def test_reflex_sign_and_scale():
    o = mk_visual(M=1.0)
    sol = orbitsolve(o, jnp.asarray(56000.0))
    m = 0.01  # Msun companion
    # Host reflex is opposite sign, scaled by m/Mtot
    assert float(raoff(sol, m)) == -0.01 * float(raoff(sol))
    assert float(radvel(sol, m)) == -0.01 * float(radvel(sol))


def test_thiele_innes_matches_campbell():
    # Build TI constants from Campbell elements; the two orbit types
    # must produce identical on-sky tracks.
    a, e, inc, w, O, tp, M, plx = 7.0, 0.3, 0.6, 1.1, 2.2, 55000.0, 1.4, 40.0
    alpha = a * plx  # mas
    A = alpha * (np.cos(O) * np.cos(w) - np.sin(O) * np.sin(w) * np.cos(inc))
    B = alpha * (np.sin(O) * np.cos(w) + np.cos(O) * np.sin(w) * np.cos(inc))
    F = alpha * (-np.cos(O) * np.sin(w) - np.sin(O) * np.cos(w) * np.cos(inc))
    G = alpha * (-np.sin(O) * np.sin(w) + np.cos(O) * np.cos(w) * np.cos(inc))

    ovis = mk_visual(a=a, e=e, i=inc, omega=w, Omega=O, tp=tp, M=M, plx=plx)
    oti = ThieleInnesOrbit.from_params(e=e, A=A, B=B, F=F, G=G, tp=tp, M=M, plx=plx)

    assert abs(float(semimajoraxis(oti)) - a) < 1e-10

    t = jnp.linspace(55000.0, 60000.0, 13)
    s1 = orbitsolve(ovis, t)
    s2 = orbitsolve(oti, t)
    np.testing.assert_allclose(np.asarray(raoff(s1)), np.asarray(raoff(s2)), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(decoff(s1)), np.asarray(decoff(s2)), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(pmra(s1)), np.asarray(pmra(s2)), rtol=1e-9)
    # TI elements are invariant under (w,O) -> (w+pi,O+pi) which flips the
    # line of sight: radvel from TI is defined up to that branch choice.
    rv1, rv2 = np.asarray(radvel(s1)), np.asarray(radvel(s2))
    assert np.allclose(rv1, rv2, rtol=1e-6) or np.allclose(rv1, -rv2, rtol=1e-6)

    # Round-trip TI -> Campbell
    alpha2, i2, w2, O2 = thiele_innes_to_campbell(A, B, F, G)
    np.testing.assert_allclose(float(alpha2), alpha, rtol=1e-12)
    np.testing.assert_allclose(float(i2), inc, rtol=1e-10)
    np.testing.assert_allclose(
        np.mod(float(w2), np.pi), np.mod(w, np.pi), rtol=1e-9
    )
    np.testing.assert_allclose(
        np.mod(float(O2), np.pi), np.mod(O, np.pi), rtol=1e-9
    )


def test_orbit_gradients_flow():
    def f(a):
        o = mk_visual(a=a)
        sol = orbitsolve(o, jnp.asarray(56000.0))
        return raoff(sol)

    g = jax.grad(f)(7.0)
    assert np.isfinite(float(g))
    h = 1e-6
    fd = (f(7.0 + h) - f(7.0 - h)) / (2 * h)
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-5)


def test_vmap_over_chains():
    # a batch of 32 orbits solved at 100 epochs each in one fused call
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    n = 32
    a = jax.random.uniform(ks[0], (n,), minval=1, maxval=20)
    e = jax.random.uniform(ks[1], (n,), minval=0, maxval=0.9)
    t = jnp.linspace(55000.0, 60000.0, 100)

    def solve_one(a, e):
        o = VisualOrbit.from_params(a=a, e=e, i=0.5, omega=1.0, Omega=2.0, tp=55000.0, M=1.2, plx=25.0)
        return raoff(orbitsolve(o, t))

    out = jax.jit(jax.vmap(solve_one))(a, e)
    assert out.shape == (n, 100)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_fixed_position_orbit():
    from octofitter_tpu.orbits import FixedPositionOrbit

    fp = FixedPositionOrbit.from_params(sep=500.0, pa=0.8, plx=50.0)
    sol = orbitsolve(fp, jnp.asarray([56000.0, 57000.0]))
    np.testing.assert_allclose(
        np.hypot(np.asarray(sol.raoff_mas), np.asarray(sol.decoff_mas)),
        500.0, rtol=1e-12,
    )
    np.testing.assert_allclose(np.asarray(posangle(sol)), 0.8, rtol=1e-12)
    # velocities are zero; time-independent
    assert float(jnp.max(jnp.abs(sol.pmra_masyr))) == 0.0


def test_cartesian_orbit_roundtrip():
    from octofitter_tpu.orbits import CartesianOrbit

    rng = np.random.default_rng(1)
    for _ in range(5):
        true = dict(
            a=rng.uniform(2, 15), e=rng.uniform(0, 0.8), i=rng.uniform(0.05, 3.1),
            omega=rng.uniform(0, 2 * np.pi), Omega=rng.uniform(0, 2 * np.pi),
            tp=56500.0, M=rng.uniform(0.5, 2), plx=40.0,
        )
        vis = VisualOrbit.from_params(**true)
        tref = 57000.0
        s0 = orbitsolve(vis, jnp.asarray(tref))
        cart = CartesianOrbit(
            x=s0.posx, y=s0.posy, z=s0.posz, vx=s0.vx, vy=s0.vy, vz=s0.vz,
            M=jnp.asarray(true["M"]), tref=jnp.asarray(tref),
            plx=jnp.asarray(true["plx"]),
        )
        for t in [55500.0, 58000.0]:
            sv = orbitsolve(vis, jnp.asarray(t))
            sc = orbitsolve(cart, jnp.asarray(t))
            np.testing.assert_allclose(float(raoff(sv)), float(raoff(sc)), atol=1e-7)
            np.testing.assert_allclose(float(decoff(sv)), float(decoff(sc)), atol=1e-7)
            np.testing.assert_allclose(float(radvel(sv)), float(radvel(sc)), atol=1e-4)


def test_hyperbolic_orbit_invariants():
    """Hyperbolic basis (e > 1, a < 0; `docs/src/index.md:34`): conic
    equation, vis-viva, solver residual, accessor surface, gradients."""
    from octofitter_tpu.orbits import HyperbolicOrbit, projectedseparation
    from octofitter_tpu.constants import GAUSSIAN_GRAV_CONST

    a, e = -5.0, 1.5
    elem = HyperbolicOrbit.from_params(
        a=a, e=e, i=0.5, omega=0.7, Omega=1.2, tp=57000.0, M=1.3, plx=40.0
    )
    ts = jnp.linspace(56000.0, 58000.0, 9)
    sol = orbitsolve(elem, ts)
    mu = GAUSSIAN_GRAV_CONST**2 * 1.3

    # conic equation r = a(1-e^2)/(1+e cos nu)
    p = a * (1 - e**2)
    r_conic = p / (1 + e * np.cos(np.asarray(sol.nu)))
    np.testing.assert_allclose(np.asarray(sol.r), r_conic, rtol=1e-12)
    assert np.all(np.asarray(sol.r) > 0)

    # vis-viva v^2 = mu (2/r - 1/a)
    v2 = np.asarray(sol.vx) ** 2 + np.asarray(sol.vy) ** 2 + np.asarray(sol.vz) ** 2
    np.testing.assert_allclose(v2, mu * (2 / np.asarray(sol.r) - 1 / a), rtol=1e-12)

    # solver residual e sinh H - H = M
    H = np.asarray(sol.EA)
    n = np.sqrt(mu / (-a) ** 3)
    M = n * (np.asarray(ts) - 57000.0)
    np.testing.assert_allclose(e * np.sinh(H) - H, M, atol=1e-10)

    # accessors finite; separation grows along the outbound asymptote
    seps = np.asarray(projectedseparation(sol))
    assert np.all(np.isfinite(seps))
    assert np.all(np.isfinite(np.asarray(raoff(sol))))
    assert np.all(np.isfinite(np.asarray(sol.radvel_ms)))

    # differentiable through the hyperbolic solver
    def f(ee):
        el = HyperbolicOrbit.from_params(
            a=a, e=ee, i=0.5, omega=0.7, Omega=1.2, tp=57000.0, M=1.3,
            plx=40.0,
        )
        return orbitsolve(el, jnp.asarray(56500.0)).raoff_mas

    g = float(jax.grad(f)(1.5))
    g_fd = (float(f(1.5 + 1e-6)) - float(f(1.5 - 1e-6))) / 2e-6
    np.testing.assert_allclose(g, g_fd, rtol=1e-5)


def test_hyperbolic_basis_in_model():
    """The Hyperbolic{KepOrbit} basis string resolves and samples."""
    import octofitter_tpu as oc
    from octofitter_tpu import distributions as dist

    b = oc.Planet(
        name="b", basis="Hyperbolic{KepOrbit}",
        variables=dict(
            a=-5.0, e=dist.Uniform(1.1, 3.0), i=0.5, omega=0.7,
            Omega=1.2, tp=57000.0,
        ),
    )
    sysm = oc.System(name="hyp", variables=dict(M=1.3, plx=40.0), companions=[b])
    m = oc.LogDensityModel(sysm, verbosity=0)
    theta_t = m.link(m.sample_priors(jax.random.PRNGKey(0)))
    assert np.isfinite(float(m.ln_post(theta_t)))
