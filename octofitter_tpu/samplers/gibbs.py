"""Gibbs-within-HMC for models with large discrete domains.

When the discrete-domain product exceeds the logsumexp-marginalization
cap, LogDensityModel switches to `discrete_mode == "gibbs"` and
sampling alternates
  1. a jittered-HMC transition on the continuous parameters
     conditional on each chain's current discrete state, and
  2. a systematic-scan Gibbs sweep redrawing every discrete variable
     from its full conditional (cost = SUM of domain sizes).
This is the gradient-aware analogue of the reference's gradient-free
switch on discrete priors (`/root/reference/src/logdensitymodel.jl:38-41`,
`initialization.jl:219-263`). Vectorized over chains like every other
sampler here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .nuts import (
    NutsStats,
    build_warmup_schedule,
    da_init,
    da_update,
    metric_from_sigma,
    welford_init,
    welford_sigma,
    welford_update,
)
from .hmc import hmc_step


def run_gibbs(
    model,
    theta0_batch,
    key,
    n_warmup: int = 1000,
    n_samples: int = 1000,
    n_leapfrog: int = 32,
    target_accept: float = 0.8,
    metric: str = "diag",
    initial_sigma=None,
    disc0_batch=None,
):
    """Warmup + sample with per-chain Gibbs-within-HMC.

    Returns (samples [C,S,D], lps [C,S], stats, info) like run_nuts,
    plus info["disc_samples"] [C,S,n_disc] with the discrete draws.
    """
    theta0_batch = jnp.asarray(theta0_batch)
    C, D = theta0_batch.shape
    dtype = theta0_batch.dtype
    dense = metric == "dense"
    if initial_sigma is None:
        sigma0 = jnp.eye(D, dtype=dtype) if dense else jnp.ones((D,), dtype)
    else:
        sigma0 = jnp.asarray(initial_sigma, dtype)
    if disc0_batch is None:
        disc0_batch = model.sample_disc_priors(jax.random.PRNGKey(0), C)
    disc0_batch = jnp.asarray(disc0_batch, dtype)
    schedule = build_warmup_schedule(n_warmup)
    keys = jax.random.split(key, C)

    def vg_given(disc):
        return jax.value_and_grad(
            lambda th: model.ln_post_given_disc(th, disc)
        )

    def warmup_single(theta0, disc0, k):
        lp0, grad0 = vg_given(disc0)(theta0)
        metric0 = metric_from_sigma(sigma0)
        carry0 = {
            "theta": theta0, "disc": disc0, "lp": lp0, "grad": grad0,
            "da": da_init(jnp.asarray(0.05, dtype)),
            "welford": welford_init(D, dtype, dense),
            "metric": metric0, "key": k,
        }

        def step(carry, xs):
            slow, wend = xs
            key, k_hmc, k_gibbs = jax.random.split(carry["key"], 3)
            eps = jnp.exp(carry["da"].log_eps)
            vg = vg_given(carry["disc"])
            th, lp, g, stats = hmc_step(
                vg, carry["theta"], carry["lp"], carry["grad"], k_hmc,
                eps, carry["metric"], n_leapfrog,
            )
            disc = model.gibbs_update_disc(th, carry["disc"], k_gibbs)
            lp, g = vg_given(disc)(th)
            da = da_update(carry["da"], stats.acceptance_rate, target_accept)
            w_upd = welford_update(carry["welford"], th)
            welford = jax.tree.map(
                lambda new, old: jnp.where(slow, new, old),
                w_upd, carry["welford"],
            )
            new_metric = metric_from_sigma(welford_sigma(welford))
            metric_new = jax.tree.map(
                lambda new, old: jnp.where(wend, new, old),
                new_metric, carry["metric"],
            )
            welford = jax.tree.map(
                lambda w_, z: jnp.where(wend, z, w_),
                welford, welford_init(D, dtype, dense),
            )
            da = jax.tree.map(
                lambda a, b: jnp.where(wend, b, a),
                da, da_init(jnp.exp(da.log_eps)),
            )
            return {
                "theta": th, "disc": disc, "lp": lp, "grad": g,
                "da": da, "welford": welford, "metric": metric_new,
                "key": key,
            }, None

        carry, _ = jax.lax.scan(step, carry0, schedule)
        return carry

    def sample_single(carry):
        eps = jnp.exp(carry["da"].log_eps_avg)
        metric_f = carry["metric"]

        def step(c, _):
            theta, disc, lp, grad, key = c
            key, k_hmc, k_gibbs = jax.random.split(key, 3)
            vg = vg_given(disc)
            th, lp2, g2, stats = hmc_step(
                vg, theta, lp, grad, k_hmc, eps, metric_f, n_leapfrog
            )
            disc2 = model.gibbs_update_disc(th, disc, k_gibbs)
            lp2, g2 = vg_given(disc2)(th)
            return (th, disc2, lp2, g2, key), (th, disc2, lp2, stats)

        init = (carry["theta"], carry["disc"], carry["lp"], carry["grad"],
                carry["key"])
        _, (ths, discs, lps, stats) = jax.lax.scan(
            step, init, None, length=n_samples
        )
        return ths, discs, lps, stats, eps, metric_f.sigma

    @jax.jit
    def _run(theta0, disc0, keys):
        carries = jax.vmap(warmup_single)(theta0, disc0, keys)
        ths, discs, lps, stats, eps, sigma = jax.vmap(sample_single)(carries)
        return ths, discs, lps, stats, eps, sigma

    ths, discs, lps, stats, eps, sigma = _run(theta0_batch, disc0_batch, keys)
    info = {
        "step_size": eps,
        "sigma": sigma,
        "disc_samples": discs,
        "warmup_divergences": jnp.asarray(0),
    }
    return ths, lps, stats, info
