"""Discrete-variable support: detection + logsumexp marginalization.

The reference detects discrete priors and switches to gradient-free
sampling (`/root/reference/src/logdensitymodel.jl:38-41`,
`initialization.jl:219-263`); here small discrete domains are
marginalized so the model stays differentiable, and the discrete
variable is recovered per posterior draw from its conditional.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
from scipy.special import logsumexp as sp_logsumexp

import octofitter_tpu as oc
from octofitter_tpu import distributions as dist
from octofitter_tpu.model.variables import DirectLL


def _two_component_model(datum=2.0, sigma=1.0, p0=0.5, x_sigma=10.0):
    """x observed ~ N(mu_k, sigma), mu_0=-2, mu_1=3, k ~ Categorical."""
    sys = oc.System(
        name="disc",
        variables=dict(
            k=dist.Categorical(probs=(p0, 1 - p0)),
            x=dist.Normal(0.0, x_sigma),
            ll=lambda s, _d=datum, _s=sigma: (
                -0.5 * ((_d - (s.x + jnp.where(s.k == 0, -2.0, 3.0))) / _s) ** 2
                - math.log(_s) - 0.5 * math.log(2 * math.pi)
            ),
        ),
        companions=[],
        observations=[DirectLL("ll")],
    )
    return oc.LogDensityModel(sys, verbosity=0)


def test_discrete_detection_and_dims():
    m = _two_component_model()
    assert m.discrete_names == ["k"]
    assert m.parameter_names == ["x"]
    assert m.D == 1
    assert m._disc_combos.shape == (2, 1)
    # prior weights normalized
    np.testing.assert_allclose(float(sp_logsumexp(np.asarray(m._disc_logw))), 0.0, atol=1e-12)


def test_discrete_marginal_matches_analytic():
    """ln_post equals the analytic logsumexp mixture; gradient finite."""
    datum, sigma, p0 = 2.0, 1.0, 0.3
    m = _two_component_model(datum, sigma, p0)

    for xv in (-1.0, 0.0, 2.5):
        theta_t = m.link(jnp.asarray([xv]))
        got = float(m.ln_post(theta_t))

        def comp(mu, p):
            return (
                math.log(p)
                - 0.5 * ((datum - (xv + mu)) / sigma) ** 2
                - math.log(sigma) - 0.5 * math.log(2 * math.pi)
            )

        lprior = float(dist.Normal(0.0, 10.0).logpdf(float(xv)))
        want = lprior + sp_logsumexp([comp(-2.0, p0), comp(3.0, 1 - p0)])
        np.testing.assert_allclose(got, want, rtol=1e-10)

    val, g = m.ln_post_and_grad(m.link(jnp.asarray([0.5])))
    assert np.isfinite(float(val)) and np.all(np.isfinite(np.asarray(g)))


def test_discrete_conditional_and_sampling():
    """Posterior P(k | x) matches Bayes, and octofit chains contain the
    recovered discrete column with about the right frequency."""
    datum, sigma, p0 = 2.0, 1.0, 0.5
    # tight x prior -> k=1 (mu=3, needs x=-1) strongly beats k=0
    # (mu=-2, would need x=+4 against a N(0, 0.5) prior)
    m = _two_component_model(datum, sigma, p0, x_sigma=0.5)
    xv = 0.0
    logits = np.asarray(m.discrete_conditional_logits(m.link(jnp.asarray([xv]))))
    p = np.exp(logits - sp_logsumexp(logits))
    # analytic: k=1 (mu=3) is closer to datum 2 than k=0 (mu=-2)
    w0 = -0.5 * ((datum - (xv - 2.0)) / sigma) ** 2
    w1 = -0.5 * ((datum - (xv + 3.0)) / sigma) ** 2
    want = np.exp([w0, w1]) / (np.exp(w0) + np.exp(w1))
    np.testing.assert_allclose(p, want, rtol=1e-8)

    chain = oc.octofit(
        m, chains=8, adaptation=300, iterations=300, sampler="chees",
        verbosity=0,
    )
    assert "k" in chain.names
    ks = chain["k"].reshape(-1)
    assert set(np.unique(ks)) <= {0.0, 1.0}
    # marginal P(k=1) dominates strongly under the tight x prior
    assert ks.mean() > 0.9


def test_drawfrompriors_includes_discrete():
    m = _two_component_model(p0=0.9)
    nt = m.drawfrompriors(jax.random.PRNGKey(0))
    assert float(nt["k"]) in (0.0, 1.0)
    ks = [float(m.drawfrompriors(jax.random.PRNGKey(i))["k"]) for i in range(60)]
    assert np.mean(ks) < 0.4  # p(k=1) = 0.1


def test_discrete_uniform_domain():
    d = dist.DiscreteUniform(0, 3)
    np.testing.assert_array_equal(d.domain(), [0, 1, 2, 3])
    lp = np.asarray(d.logpmf(jnp.asarray([0.0, 3.0, 4.0])))
    np.testing.assert_allclose(lp[:2], math.log(0.25))
    assert lp[2] == -np.inf


def test_gibbs_within_hmc_large_domain():
    """Domains whose product exceeds the marginalization cap switch to
    Gibbs-within-HMC; the informative discrete variable is recovered and
    an uninformative one stays ~uniform."""
    datum = 7.3
    sys = oc.System(
        name="gibbs",
        variables=dict(
            k1=dist.DiscreteUniform(0, 19),
            k2=dist.DiscreteUniform(0, 19),
            k3=dist.DiscreteUniform(0, 19),
            x=dist.Normal(0.0, 1.0),
            ll=lambda s, _d=datum: -0.5 * ((_d - (s.k1 + 0.1 * s.x)) / 0.5) ** 2,
        ),
        companions=[],
        observations=[DirectLL("ll")],
    )
    m = oc.LogDensityModel(sys, verbosity=0)
    assert m.discrete_mode == "gibbs"
    assert m.parameter_names == ["x"]
    assert m.discrete_names == ["k1", "k2", "k3"]

    # conditional log-post + gibbs update work standalone
    disc = jnp.asarray([0.0, 3.0, 5.0])
    theta_t = m.link(jnp.asarray([0.0]))
    lp0 = float(m.ln_post_given_disc(theta_t, disc))
    assert np.isfinite(lp0)
    d2 = m.gibbs_update_disc(theta_t, disc, jax.random.PRNGKey(0))
    assert np.asarray(d2).shape == (3,)

    chain = oc.octofit(
        m, chains=8, adaptation=200, iterations=300, verbosity=0,
    )
    assert chain.info["sampler"] == "gibbs_vectorized"
    k1 = chain["k1"].reshape(-1)
    k2 = chain["k2"].reshape(-1)
    # analytic posterior over k1 (marginal over x): sigma_eff ~ 0.51,
    # P(7) ~ 0.63, P(8) ~ 0.28 — the chain should match, not collapse
    p7 = np.mean(k1 == 7.0)
    p8 = np.mean(k1 == 8.0)
    assert 0.5 < p7 < 0.8, p7
    assert 0.15 < p8 < 0.45, p8
    assert np.all(np.isin(np.unique(k1), [5.0, 6.0, 7.0, 8.0, 9.0, 10.0]))
    # the uninformative one keeps exploring its domain
    assert len(np.unique(k2)) > 10
    assert 5.0 < k2.mean() < 14.0
    # continuous conditional is sampled too
    assert np.isfinite(chain["x"]).all()
