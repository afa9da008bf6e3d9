"""ChEES-HMC cross-chain adaptive sampler tests.

The trajectory-length adaptation replaces the reference's NUTS
GeneralisedNoUTurn criterion (`/root/reference/src/sampling.jl:376-394`)
with the accelerator-native ChEES criterion (Hoffman et al. 2021).
"""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from octofitter_tpu.chains import ess_rhat
from octofitter_tpu.samplers.chees import (
    halton_sequence,
    run_chees,
    welford_update_batch,
)
from octofitter_tpu.samplers.nuts import welford_init, welford_sigma


def test_halton_sequence():
    h = halton_sequence(8)
    assert np.all((h > 0) & (h < 1))
    # van der Corput base 2: 1/2, 1/4, 3/4, 1/8, ...
    np.testing.assert_allclose(h[:4], [0.5, 0.25, 0.75, 0.125])


def test_welford_batch_matches_numpy():
    rng = np.random.default_rng(0)
    X1 = rng.standard_normal((16, 3))
    X2 = rng.standard_normal((16, 3)) * 2 + 1
    w = welford_init(3, jnp.float64, dense=True)
    w = welford_update_batch(w, jnp.asarray(X1))
    w = welford_update_batch(w, jnp.asarray(X2))
    allx = np.concatenate([X1, X2])
    cov = np.cov(allx.T)
    m2 = np.asarray(w.m2) / (allx.shape[0] - 1)
    np.testing.assert_allclose(m2, cov, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(w.mean), allx.mean(axis=0), rtol=1e-10)
    # shrinkage estimate stays close for n=32
    sig = np.asarray(welford_sigma(w))
    assert np.abs(sig - cov).max() < 0.6


@pytest.mark.integration
def test_chees_correlated_gaussian_moments():
    """Dense-metric ChEES recovers mean/cov of a correlated Gaussian and
    adapts the trajectory length away from its initial value."""
    D = 4
    rng = np.random.default_rng(0)
    A = rng.standard_normal((D, D))
    cov = A @ A.T + 0.5 * np.eye(D)
    prec = jnp.asarray(np.linalg.inv(cov))

    def lp(x):
        return -0.5 * x @ prec @ x

    vg = jax.value_and_grad(lp)
    theta0 = jax.random.normal(jax.random.PRNGKey(0), (32, D)) * 0.1
    samples, lps, stats, info = run_chees(
        vg, theta0, jax.random.PRNGKey(1), n_warmup=500, n_samples=500
    )
    s = np.asarray(samples)
    assert s.shape == (32, 500, D)
    emp = np.cov(s.reshape(-1, D).T)
    assert np.abs(emp - cov).max() / np.abs(cov).max() < 0.15
    assert np.abs(s.mean(axis=(0, 1))).max() < 0.15
    ess, rhat = ess_rhat(s[:, :, 0])
    assert rhat < 1.02
    assert ess > 2000
    # trajectory length moved away from init (16 * initial_step_size)
    T_trace = np.asarray(info["trajectory_length_trace"])
    assert abs(np.log(T_trace[-1] / T_trace[0])) > 0.5
    # ChEES should find multi-step trajectories on a correlated target
    assert float(np.asarray(stats.n_steps).mean()) > 2.0


@pytest.mark.integration
def test_chees_scaled_gaussian_diag_metric():
    scales = jnp.asarray([0.05, 1.0, 20.0])

    def lp(x):
        return -0.5 * jnp.sum((x / scales) ** 2)

    vg = jax.value_and_grad(lp)
    theta0 = jax.random.normal(jax.random.PRNGKey(0), (32, 3)) * 0.01
    samples, lps, stats, info = run_chees(
        vg, theta0, jax.random.PRNGKey(1), n_warmup=600, n_samples=400,
        metric="diag",
    )
    s = np.asarray(samples)
    std = s.reshape(-1, 3).std(axis=0)
    np.testing.assert_allclose(std, np.asarray(scales), rtol=0.2)
    # learned diagonal metric close to the true variances
    sig = np.asarray(info["sigma"])
    assert sig.shape == (3,)
    ratio = sig / np.asarray(scales) ** 2
    assert np.all(ratio > 0.3) and np.all(ratio < 3.0)


@pytest.mark.integration
def test_chees_stats_contract():
    """Output contract matches run_nuts: (C,S,D), (C,S), stats (C,S)."""
    def lp(x):
        return -0.5 * jnp.sum(x * x)

    vg = jax.value_and_grad(lp)
    theta0 = jax.random.normal(jax.random.PRNGKey(0), (8, 2))
    samples, lps, stats, info = run_chees(
        vg, theta0, jax.random.PRNGKey(1), n_warmup=100, n_samples=50
    )
    assert samples.shape == (8, 50, 2)
    assert lps.shape == (8, 50)
    for leaf in stats:
        assert np.asarray(leaf).shape == (8, 50)
    for k in ("step_size", "trajectory_length", "sigma"):
        assert k in info


def test_chees_n_chunks_transition_parity():
    """n_chunks splits the leapfrog body into sequential sub-batches as
    a program-shape workaround (the axon backend kernel-faults on very
    large single-kernel chain batches). A single transition with shared
    inputs must agree with the unchunked transition to reduction-order
    precision (full-run trajectories diverge chaotically from those
    ulps, so parity is checked per-transition, statistics below)."""
    from octofitter_tpu.samplers.chees import _chees_transition
    from octofitter_tpu.samplers.nuts import metric_from_sigma

    D = 3
    rng = np.random.default_rng(2)
    A = rng.standard_normal((D, D))
    prec = jnp.asarray(np.linalg.inv(A @ A.T + 0.5 * np.eye(D)))

    def lp(x):
        return -0.5 * x @ prec @ x

    vg = jax.vmap(jax.value_and_grad(lp))
    theta0 = jax.random.normal(jax.random.PRNGKey(0), (16, D),
                               jnp.float64)
    lp0, g0 = vg(theta0)
    metric = metric_from_sigma(jnp.eye(D, dtype=jnp.float64))
    args = (theta0, lp0, g0, jax.random.PRNGKey(1),
            jnp.asarray(0.12, jnp.float64), jnp.asarray(1.1, jnp.float64),
            jnp.asarray(0.7, jnp.float64), metric, 64)
    out1 = _chees_transition(vg, *args, n_chunks=1)
    out4 = _chees_transition(vg, *args, n_chunks=4)
    for a, b in zip(out1[:3] + (out4[4],), out4[:3] + (out1[4],)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-9, atol=1e-12)


@pytest.mark.integration
def test_chees_n_chunks_statistical_parity():
    """Full chunked run samples the same posterior: moments of the
    chunked and unchunked runs agree to Monte-Carlo error."""
    D = 3
    rng = np.random.default_rng(2)
    A = rng.standard_normal((D, D))
    cov = A @ A.T + 0.5 * np.eye(D)
    prec = jnp.asarray(np.linalg.inv(cov))

    def lp(x):
        return -0.5 * x @ prec @ x

    vg = jax.value_and_grad(lp)
    theta0 = jax.random.normal(jax.random.PRNGKey(0), (64, D)) * 0.1
    s4, *_ = run_chees(
        vg, theta0, jax.random.PRNGKey(1), n_warmup=300, n_samples=300,
        n_chunks=4,
    )
    flat = np.asarray(s4).reshape(-1, D)
    np.testing.assert_allclose(flat.mean(axis=0), np.zeros(D), atol=0.25)
    np.testing.assert_allclose(np.cov(flat.T), cov, atol=0.6, rtol=0.25)


@pytest.mark.integration
def test_octofit_chees_astrometry():
    """End-to-end octofit(sampler='chees') on the quick-start model
    recovers the injected semi-major axis."""
    import octofitter_tpu as oc
    from octofitter_tpu import distributions as dist
    from octofitter_tpu.orbits import VisualOrbit, orbitsolve, raoff, decoff

    true = dict(a=7.0, e=0.2, i=0.6, omega=1.0, Omega=2.0, tp=57000.0,
                M=1.2, plx=50.0)
    n = 12
    rng = np.random.default_rng(0)
    epochs = np.linspace(55000.0, 59500.0, n)
    sol = orbitsolve(VisualOrbit.from_params(**true), jnp.asarray(epochs))
    astrom = oc.PlanetRelAstromObs(
        dict(
            epoch=epochs,
            ra=np.asarray(raoff(sol)) + rng.standard_normal(n) * 2.0,
            dec=np.asarray(decoff(sol)) + rng.standard_normal(n) * 2.0,
            σ_ra=np.full(n, 2.0),
            σ_dec=np.full(n, 2.0),
        ),
        name="simdata",
    )
    b = oc.Planet(
        name="b", basis="Visual{KepOrbit}",
        variables=dict(
            a=dist.Uniform(0.001, 100.0),
            e=dist.Uniform(0.0, 0.99),
            i=dist.Sine(),
            omega=oc.UniformCircular(),
            Omega=oc.UniformCircular(),
            theta=oc.UniformCircular(),
            tp=lambda s, p: oc.theta_at_epoch_to_tperi(
                p.theta, 57000.0, M=s.M, e=p.e, a=p.a, i=p.i,
                omega=p.omega, Omega=p.Omega),
        ),
        observations=[astrom],
    )
    system = oc.System(
        name="cheesfit",
        variables=dict(
            M=dist.truncated(dist.Normal(1.2, 0.1), lower=0.1),
            plx=dist.truncated(dist.Normal(50.0, 0.02), lower=0.1),
        ),
        companions=[b],
    )
    model = oc.LogDensityModel(system, verbosity=0)
    chain = oc.octofit(
        model, chains=32, adaptation=500, iterations=400,
        sampler="chees", verbosity=0,
    )
    summ = chain.summary()
    assert abs(summ["b_a"]["mean"] - true["a"]) < 0.5
    assert summ["b_a"]["rhat"] < 1.05
    assert summ["b_a"]["ess"] > 500
    assert chain.info["sampler"] == "chees_vectorized"


def test_drop_warmup_false_prepends_identical_warmup_draws():
    """drop_warmup=False (reference octofit kwarg, sampling.jl:129)
    records the adaptation draws ahead of the kept draws without
    changing the RNG stream: the tail must equal the drop_warmup=True
    run bit-for-bit. Also covers the manual step_size seed."""
    from octofitter_tpu.samplers.chees import run_chees
    from octofitter_tpu.samplers.nuts import run_nuts

    def lp(x):
        return -0.5 * jnp.sum(x**2)

    vg = jax.value_and_grad(lp)
    theta0 = jax.random.normal(jax.random.PRNGKey(0), (8, 3))
    key = jax.random.PRNGKey(1)
    W, S = 60, 40

    for runner, kw in (
        (run_chees, dict(max_leapfrog=16)),
        (run_nuts, dict(max_depth=5, initial_step_size=0.3)),
    ):
        s_drop, lps_drop, st_drop, _ = runner(
            vg, theta0, key, n_warmup=W, n_samples=S, **kw
        )
        s_keep, lps_keep, st_keep, _ = runner(
            vg, theta0, key, n_warmup=W, n_samples=S,
            drop_warmup=False, **kw,
        )
        assert s_keep.shape == (8, W + S, 3)
        assert lps_keep.shape == (8, W + S)
        assert st_keep.acceptance_rate.shape == (8, W + S)
        np.testing.assert_array_equal(
            np.asarray(s_keep[:, W:]), np.asarray(s_drop)
        )
        np.testing.assert_array_equal(
            np.asarray(lps_keep[:, W:]), np.asarray(lps_drop)
        )
        assert np.isfinite(np.asarray(s_keep)).all()
