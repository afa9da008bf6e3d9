"""Checkpoint/resume: PT round-level (reference Pigeons checkpoint=true,
`OctofitterPigeonsExt.jl:81`) and ChEES sampler-state continuation."""

import pytest
import os

import jax
import jax.numpy as jnp
import numpy as np

import octofitter_tpu as oc
from octofitter_tpu import distributions as dist
from octofitter_tpu.model.variables import DirectLL
from octofitter_tpu.samplers.tempering import octofit_pigeons


pytestmark = pytest.mark.integration

def _toy_model():
    sys = oc.System(
        name="ckpt",
        variables=dict(
            x=dist.Normal(0.0, 3.0),
            y=dist.Normal(0.0, 3.0),
            ll=lambda s: -0.5 * ((s.x - 1.0) ** 2 + (s.y + 0.5) ** 2) / 0.3**2,
        ),
        companions=[],
        observations=[DirectLL("ll")],
    )
    return oc.LogDensityModel(sys, verbosity=0)


def test_pt_checkpoint_resume_bit_identical(tmp_path):
    """A run checkpointed at round 3 and resumed to 6 rounds matches an
    uninterrupted 6-round run exactly."""
    m = _toy_model()
    kw = dict(
        n_chains=6, n_walkers=8, n_rounds=6, verbosity=0,
        key=jax.random.PRNGKey(7),
    )
    chain_full, info_full = octofit_pigeons(m, **kw)

    ck = os.path.join(tmp_path, "pt_ckpt.npz")
    # phase 1: run only 3 rounds, checkpointing (simulate interruption:
    # same schedule as the 6-round run, stopped early)
    m2 = _toy_model()
    octofit_pigeons(m2, **{**kw, "n_rounds": 3, "checkpoint": ck})
    assert os.path.exists(ck)
    # phase 2: resume to the full 6 rounds
    m3 = _toy_model()
    chain_res, info_res = octofit_pigeons(m3, **{**kw, "resume": ck})

    np.testing.assert_array_equal(chain_full["x"], chain_res["x"])
    np.testing.assert_array_equal(chain_full["y"], chain_res["y"])
    np.testing.assert_allclose(
        info_full["logevidence"], info_res["logevidence"], rtol=1e-12
    )
    np.testing.assert_array_equal(info_full["betas"], info_res["betas"])
    assert info_full["n_round_trips"] == info_res["n_round_trips"]


def test_chees_warmup_state_continuation():
    """run_chees(warmup_state=...) skips warmup and keeps sampling with
    the saved tuning; moments remain correct."""
    from octofitter_tpu.samplers.chees import run_chees

    def lp(x):
        return -0.5 * jnp.sum(x * x / jnp.asarray([1.0, 4.0]))

    vg = jax.value_and_grad(lp)
    theta0 = jax.random.normal(jax.random.PRNGKey(0), (32, 2)) * 0.1
    s1, lps1, _, info1 = run_chees(
        vg, theta0, jax.random.PRNGKey(1), n_warmup=400, n_samples=200,
        metric="diag",
    )
    theta_last = s1[:, -1, :]
    ws = {
        "step_size": info1["step_size"],
        "trajectory_length": info1["trajectory_length"],
        "sigma": info1["sigma"],
    }
    s2, lps2, stats2, info2 = run_chees(
        vg, theta_last, jax.random.PRNGKey(2), n_samples=400,
        metric="diag", warmup_state=ws,
    )
    assert s2.shape == (32, 400, 2)
    assert float(info2["step_size"]) == float(info1["step_size"])
    all_draws = np.asarray(s2).reshape(-1, 2)
    np.testing.assert_allclose(all_draws.std(axis=0), [1.0, 2.0], rtol=0.2)
    assert float(np.asarray(stats2.acceptance_rate).mean()) > 0.5
