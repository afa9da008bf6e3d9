"""End-to-end NUTS sampling on the quick-start astrometry model.

Mirrors the reference integration test (`test/integration/sampling.jl`):
synthetic 8-epoch astrometry, D == 11, assertions on divergence rate and
recovery of the generating parameters. Iteration counts are set at
documented-adequate values; the divergence gate has a small flake
budget, as in the reference.
"""

import jax
import numpy as np
import pytest

import octofitter_tpu as oc
from octofitter_tpu.samplers import octofit

from test_model import quickstart_model, TRUE


pytestmark = pytest.mark.integration

@pytest.fixture(scope="module")
def chain():
    model = quickstart_model()
    return octofit(
        model,
        key=jax.random.PRNGKey(0),
        chains=8,
        adaptation=600,
        iterations=600,
        max_depth=10,
        verbosity=0,
    )


def test_shapes_and_columns(chain):
    assert chain.n_chains == 8
    assert chain.n_draws == 600
    for col in ("M", "plx", "b_a", "b_e", "b_i", "b_omega", "b_Omega", "b_tp"):
        assert col in chain.data, col
    assert "logpost" in chain.internals
    assert "is_divergent" in chain.internals


def test_divergence_rate(chain):
    div_rate = chain.internals["is_divergent"].mean()
    # reference gate: flake <= ~1.7% at 1000/1000 over 60 seeds
    assert div_rate < 0.05, f"divergence rate {div_rate:.3f}"


def test_acceptance_near_target(chain):
    acc = chain.internals["acceptance_rate"].mean()
    assert 0.6 < acc <= 1.0


def test_parameter_recovery(chain):
    # generating values should be within ~4 posterior sigmas
    for col, true in [
        ("M", TRUE["M"]),
        ("plx", TRUE["plx"]),
        ("b_a", TRUE["a"]),
        ("b_e", TRUE["e"]),
        ("b_i", TRUE["i"]),
    ]:
        x = chain.flat(col)
        pull = (x.mean() - true) / max(x.std(), 1e-12)
        assert abs(pull) < 4.0, f"{col}: mean={x.mean():.4g} true={true} pull={pull:.2f}"


def test_mixing(chain):
    s = chain.summary()
    for col in ("M", "plx", "b_a", "b_e"):
        assert s[col]["rhat"] < 1.1, f"{col} rhat={s[col]['rhat']}"
        assert s[col]["ess"] > 100, f"{col} ess={s[col]['ess']}"


def test_logpost_consistency(chain):
    # logpost = logprior + loglike columnwise
    lp = chain.internals["logpost"]
    lpr = chain.internals["logprior"]
    ll = chain.internals["loglike"]
    np.testing.assert_allclose(lp, lpr + ll, rtol=1e-8)
