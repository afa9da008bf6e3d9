"""RV likelihood tests (reference: `OctofitterRadialVelocity/test/runtests.jl`)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import octofitter_tpu as oc
from octofitter_tpu import distributions as dist
from octofitter_tpu.constants import AUDAY_TO_MS, MJUP2MSOL
from octofitter_tpu.orbits import RadialVelocityOrbit, orbitsolve, period, radvel
from octofitter_tpu.rv import (
    MarginalizedStarAbsoluteRVObs,
    QuasiPeriodicKernel,
    SqExponentialKernel,
    StarAbsoluteRVObs,
    gp_loglike,
)

TRUE_RV = dict(a=0.1, e=0.1, omega=0.5, tp=57000.0, M=1.0)
TRUE_MASS_MJUP = 2.0  # Jupiter masses


def make_rv_data(n=40, sigma=2.0, offset=15.0, jitter=0.0, seed=0):
    rng = np.random.default_rng(seed)
    orbit = RadialVelocityOrbit.from_params(**TRUE_RV)
    P = float(period(orbit))
    epochs = np.sort(rng.uniform(57000, 57000 + 3 * P, n))
    sol = orbitsolve(orbit, jnp.asarray(epochs))
    rv_star = np.asarray(radvel(sol, TRUE_MASS_MJUP * MJUP2MSOL))
    rv = rv_star + offset + rng.standard_normal(n) * math.hypot(sigma, jitter)
    return dict(epoch=epochs, rv=rv, σ_rv=np.full(n, sigma))


def rv_model(marginalized=False, gp=None, data=None):
    data = data or make_rv_data()
    if marginalized:
        rvobs = MarginalizedStarAbsoluteRVObs(
            data, dict(jitter=dist.LogUniform(0.01, 30.0)), name="inst"
        )
    else:
        rvobs = StarAbsoluteRVObs(
            data,
            dict(
                offset=dist.Normal(0, 100.0),
                jitter=dist.LogUniform(0.01, 30.0),
            ),
            name="inst",
            gaussian_process=gp,
        )
    b = oc.Planet(
        name="b",
        basis="RadialVelocityOrbit",
        variables=dict(
            a=dist.Uniform(0.01, 1.0),
            e=dist.Uniform(0.0, 0.9),
            omega=oc.UniformCircular(),
            tp=dist.Uniform(56994.0, 57006.0),  # ~one period wide: tp is periodic-multimodal
            mass=dist.Uniform(0.0, 20.0),
        ),
    )
    system = oc.System(
        name="rvtest",
        variables=dict(M=dist.truncated(dist.Normal(1.0, 0.05), lower=0.1)),
        companions=[b],
        observations=[rvobs],
    )
    return oc.LogDensityModel(system, verbosity=0)


def test_rv_semiamplitude_of_reflex():
    # star reflex amplitude K = 2 pi a sin(i) m/(Mtot) / (P sqrt(1-e^2))
    orbit = RadialVelocityOrbit.from_params(**TRUE_RV)
    P = float(period(orbit))
    t = jnp.linspace(57000.0, 57000.0 + P, 2001)
    m = TRUE_MASS_MJUP * MJUP2MSOL
    rv = np.asarray(radvel(orbitsolve(orbit, t), m))
    K_expected = (
        2 * math.pi * TRUE_RV["a"] / (P * math.sqrt(1 - TRUE_RV["e"] ** 2))
        * (m / TRUE_RV["M"]) * AUDAY_TO_MS
    )
    np.testing.assert_allclose((rv.max() - rv.min()) / 2, K_expected, rtol=1e-4)


def test_rv_logdensity_finite_and_grad():
    model = rv_model()
    theta_t = model.link(model.sample_priors(jax.random.PRNGKey(0)))
    val, grad = model.ln_post_and_grad(theta_t)
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(np.asarray(grad)))


def test_marginalized_matches_numerical_integral():
    """The marginalized RV formula must match the reference's exact
    expression (`rv-absolute-margin.jl:164-181`)."""
    data = make_rv_data(n=12)
    model = rv_model(marginalized=True, data=data)
    theta = model.sample_priors(jax.random.PRNGKey(1))
    nt = model.arr2nt(theta)
    ll = float(model.ln_like_nt(nt))

    # recompute by hand with the reference formula
    from octofitter_tpu.model.params import Params
    from octofitter_tpu.model.variables import SystemObservationContext
    from octofitter_tpu.orbits import orbitsolve as osolve

    orbits = model.construct_orbits(nt)
    epochs = jnp.asarray(data["epoch"])
    sols = tuple(osolve(o, epochs) for o in orbits)
    m = float(nt.planets.b.mass) * MJUP2MSOL
    rvm = np.asarray(radvel(sols[0], m))
    resid = data["rv"] - rvm
    jitter = float(nt.observations.inst.jitter)
    var = data["σ_rv"] ** 2 + jitter**2
    A = (1 / var).sum()
    B = (-2 * resid / var).sum()
    C = (resid**2 / var).sum()
    ll_ref = -(np.log(2 * np.pi * var)).sum() - (-(B**2) / (4 * A) + C + np.log(A))
    # ln_like_nt also includes the UniformCircular unit-length
    # pseudo-likelihood for omega (`variables.jl:309-323`)
    r_unit = float(np.hypot(nt.planets.b.omegax, nt.planets.b.omegay))
    ll_ref += float(dist.LogNormal(0.0, 0.1).logpdf(jnp.asarray(r_unit)))
    np.testing.assert_allclose(ll, ll_ref, rtol=1e-10)


def test_gp_loglike_matches_dense_mvnormal():
    rng = np.random.default_rng(0)
    t = jnp.asarray(np.sort(rng.uniform(0, 100, 30)))
    resid = jnp.asarray(rng.standard_normal(30))
    var = jnp.asarray(rng.uniform(0.5, 2.0, 30))
    k = QuasiPeriodicKernel(eta1=2.0, eta2=20.0, eta3=7.0, eta4=0.5)
    ll = float(gp_loglike(k, t, resid, var))
    K = np.asarray(k.matrix(t, t)) + np.diag(np.asarray(var))
    sign, logdet = np.linalg.slogdet(K)
    ll_ref = (
        -0.5 * np.asarray(resid) @ np.linalg.solve(K, np.asarray(resid))
        - 0.5 * logdet
        - 0.5 * 30 * np.log(2 * np.pi)
    )
    np.testing.assert_allclose(ll, ll_ref, rtol=1e-9)


def test_gp_model_gradient():
    gp = lambda theta_obs: SqExponentialKernel(
        amplitude=theta_obs.gp_amp, lengthscale=theta_obs.gp_len
    )
    data = make_rv_data(n=25)
    rvobs = StarAbsoluteRVObs(
        data,
        dict(
            offset=dist.Normal(0, 100.0),
            jitter=dist.LogUniform(0.01, 30.0),
            gp_amp=dist.LogUniform(0.1, 30.0),
            gp_len=dist.LogUniform(1.0, 100.0),
        ),
        name="inst",
        gaussian_process=gp,
    )
    b = oc.Planet(
        name="b",
        basis="RadialVelocityOrbit",
        variables=dict(
            a=dist.Uniform(0.01, 1.0),
            e=dist.Uniform(0.0, 0.9),
            omega=oc.UniformCircular(),
            tp=dist.Uniform(56994.0, 57006.0),  # ~one period wide: tp is periodic-multimodal
            mass=dist.Uniform(0.0, 20.0),
        ),
    )
    system = oc.System(
        name="rvgp",
        variables=dict(M=dist.truncated(dist.Normal(1.0, 0.05), lower=0.1)),
        companions=[b],
        observations=[rvobs],
    )
    model = oc.LogDensityModel(system, verbosity=0)
    theta_t = model.link(model.sample_priors(jax.random.PRNGKey(2)))
    val, grad = model.ln_post_and_grad(theta_t)
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(np.asarray(grad)))


def test_rv_fit_recovers_mass():
    """Quick NUTS fit: recover the injected companion mass."""
    model = rv_model(marginalized=True)
    chain = oc.octofit(
        model,
        key=jax.random.PRNGKey(0),
        chains=4,
        adaptation=400,
        iterations=400,
        max_depth=9,
        verbosity=0,
    )
    mass = chain.flat("b_mass")
    pull = (mass.mean() - TRUE_MASS_MJUP) / max(mass.std(), 1e-9)
    assert abs(pull) < 4, f"mass mean {mass.mean():.3f} pull {pull:.2f}"
    e = chain.flat("b_e")
    assert abs(e.mean() - TRUE_RV["e"]) < 0.3


# ---------------------------------------------------------------------------
def test_celerite_assoc_matches_scan():
    """The associative-scan (parallel Kalman) celerite path
    (`rv/celerite.py:celerite_loglike_assoc`) is exact: it matches the
    sequential-scan factorization and the dense log-density, values and
    gradients, for every supported term family."""
    import scipy.stats as sps

    from octofitter_tpu.rv.celerite import (
        ComplexTerm,
        RealTerm,
        SHOTerm,
        celerite_loglike,
        celerite_loglike_assoc,
    )

    rng = np.random.default_rng(0)
    n = 64
    t = np.sort(rng.uniform(0, 100, n))
    var = rng.uniform(0.5, 2.0, n)
    y = rng.standard_normal(n)
    tj, yj, vj = jnp.asarray(t), jnp.asarray(y), jnp.asarray(var)

    terms = [
        RealTerm(a=2.0, c=0.3),
        SHOTerm(S0=1.5, w0=0.5, Q=2.0),
        SHOTerm(S0=1.5, w0=0.5, Q=2.0) + RealTerm(a=1.0, c=0.1),
        ComplexTerm(a=1.0, b=0.5, c=0.2, d=0.7),
    ]
    for term in terms:
        K = np.asarray(term.matrix(tj, tj)) + np.diag(var)
        ll_dense = sps.multivariate_normal(np.zeros(n), K).logpdf(y)
        ll_scan = float(celerite_loglike(term, tj, yj, vj))
        ll_assoc = float(celerite_loglike_assoc(term, tj, yj, vj))
        assert abs(ll_scan - ll_dense) < 1e-7, term
        assert abs(ll_assoc - ll_dense) < 1e-7, term

    g_scan = jax.grad(
        lambda s0: celerite_loglike(SHOTerm(S0=s0, w0=0.5, Q=2.0), tj, yj, vj)
    )(1.5)
    g_assoc = jax.grad(
        lambda s0: celerite_loglike_assoc(SHOTerm(S0=s0, w0=0.5, Q=2.0), tj, yj, vj)
    )(1.5)
    assert abs(float(g_scan) - float(g_assoc)) < 1e-9


def test_rv_gp_method_associative():
    """gp_method='associative' on StarAbsoluteRVObs produces the same
    posterior density as the default scan path."""
    from octofitter_tpu.rv import SHOTerm, StarAbsoluteRVObs

    rng = np.random.default_rng(1)
    n = 40
    epochs = np.sort(rng.uniform(58000, 59000, n))
    rv = rng.standard_normal(n) * 5.0
    models = []
    for method in ("scan", "associative"):
        obs = StarAbsoluteRVObs(
            dict(epoch=epochs, rv=rv, σ_rv=np.full(n, 3.0)),
            name="inst",
            variables=dict(
                offset=dist.Normal(0.0, 10.0),
                jitter=dist.LogUniform(0.01, 10.0),
                eta1=dist.LogUniform(0.1, 20.0),
            ),
            gaussian_process=lambda th: SHOTerm(
                S0=th.eta1**2, w0=0.3, Q=2.0
            ),
            gp_method=method,
        )
        system = oc.System(
            name=f"gp_{method}",
            variables=dict(M=1.0, plx=50.0),
            observations=[obs],
            companions=[],
        )
        models.append(oc.LogDensityModel(system, verbosity=0))
    m_scan, m_assoc = models
    theta = m_scan.sample_priors(jax.random.PRNGKey(2))
    lt = m_scan.link(theta)
    np.testing.assert_allclose(
        float(m_scan._ln_post_py(lt)), float(m_assoc._ln_post_py(lt)),
        rtol=1e-10,
    )
