"""Batched nested sampling.

TPU-native replacement for the reference's Dynesty integration
(`/root/reference/ext/OctofitterDynestyHypercubeTransformExt.jl`):
static nested sampling with vectorized constrained-prior MCMC
replacement. Where Dynesty replaces one live point at a time on the
CPU, here a whole batch of the worst points is replaced per iteration
— every constrained-MCMC walker runs as one vmapped device program —
so the device stays saturated.

Live points evolve under Metropolis moves that leave the *prior*
invariant (proposals in unconstrained space, prior-density ratio
acceptance) subject to the hard likelihood constraint ll > L*, which is
the standard constrained-prior sampling step of nested sampling.
Evidence accumulates with the usual shrinkage estimate
ln X_i ≈ -i / n_live.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..chains import Chains, flatten_params_batch


def octofit_nested(
    model,
    *,
    key=None,
    n_live: int = 1000,
    batch_frac: float = 0.25,
    n_mcmc_steps: int = 20,
    dlogz_tol: float = 0.05,
    max_iterations: int = 100_000,
    verbosity: int = 1,
):
    """Nested sampling; returns (Chains, info) with info['logz'].

    Parameters follow Dynesty-ish conventions: `n_live` live points,
    replacement in batches of `batch_frac * n_live`, `n_mcmc_steps`
    constrained-prior Metropolis steps per replacement.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    D = model.D
    K = max(1, int(batch_frac * n_live))

    # --- likelihood + prior in natural space ---------------------------
    def loglike(theta):
        nt = model.arr2nt(theta)
        ll = model.ln_like_nt(nt)
        return jnp.where(jnp.isnan(ll), -jnp.inf, ll)

    ln_prior = model.ln_prior

    # --- init live points ---------------------------------------------
    key, k0 = jax.random.split(key)
    live = model.sample_priors(k0, n_live)
    live_ll = jax.jit(jax.vmap(loglike))(live)
    # resample any -inf starting points
    for _ in range(20):
        bad = ~jnp.isfinite(live_ll)
        if not bool(jnp.any(bad)):
            break
        key, k1 = jax.random.split(key)
        fresh = model.sample_priors(k1, n_live)
        fresh_ll = jax.jit(jax.vmap(loglike))(fresh)
        live = jnp.where(bad[:, None], fresh, live)
        live_ll = jnp.where(bad, fresh_ll, live_ll)

    @jax.jit
    def replace_batch(live, live_ll, key):
        """Remove the K worst points; evolve copies of survivors above
        the K-th threshold."""
        order = jnp.argsort(live_ll)
        worst_idx = order[:K]
        thresh = live_ll[order[K - 1]]
        dead = live[worst_idx]
        dead_ll = live_ll[worst_idx]

        # seeds: random survivors
        k_seed, k_mcmc = jax.random.split(key)
        surv_idx = order[K:]
        seeds = surv_idx[
            jax.random.randint(k_seed, (K,), 0, n_live - K)
        ]
        theta0 = live[seeds]
        ll0 = live_ll[seeds]

        # proposal scale from live-point spread (unconstrained space)
        live_t = jax.vmap(model.link)(live)
        scale = jnp.std(live_t, axis=0) * 0.3 + 1e-8

        def walker(theta, ll, k):
            theta_t = model.link(theta)
            lp = ln_prior(theta)

            def step(carry, k_step):
                theta_t, theta, ll, lp, n_acc = carry
                k1, k2 = jax.random.split(k_step)
                prop_t = theta_t + scale * jax.random.normal(k1, (D,))
                prop = model.invlink(prop_t)
                prop_ll = loglike(prop)
                prop_lp = ln_prior(prop)
                # prior-invariant MH in unconstrained space: the jacobian
                # terms are part of ln_prior_transformed; equivalently use
                # the transformed-prior ratio
                lp_t_old = model.ln_prior_transformed(theta_t)
                lp_t_new = model.ln_prior_transformed(prop_t)
                log_alpha = lp_t_new - lp_t_old
                u = jax.random.uniform(k2)
                ok = (
                    (jnp.log(u) < log_alpha)
                    & (prop_ll > thresh)
                    & jnp.isfinite(prop_ll)
                )
                theta_t = jnp.where(ok, prop_t, theta_t)
                theta = jnp.where(ok, prop, theta)
                ll = jnp.where(ok, prop_ll, ll)
                lp = jnp.where(ok, prop_lp, lp)
                return (theta_t, theta, ll, lp, n_acc + ok), None

            ks = jax.random.split(k, n_mcmc_steps)
            (theta_t, theta, ll, lp, n_acc), _ = jax.lax.scan(
                step, (theta_t, theta, ll, lp, 0), ks
            )
            return theta, ll, n_acc

        ks = jax.random.split(k_mcmc, K)
        new_theta, new_ll, n_acc = jax.vmap(walker)(theta0, ll0, ks)

        live = live.at[worst_idx].set(new_theta)
        live_ll = live_ll.at[worst_idx].set(new_ll)
        return live, live_ll, dead, dead_ll, jnp.mean(n_acc / n_mcmc_steps)

    # --- main loop ------------------------------------------------------
    dead_points = []
    dead_lls = []
    dead_log_w = []
    log_x_prev = 0.0
    logz = -np.inf
    it = 0
    while it < max_iterations:
        key, k_it = jax.random.split(key)
        live, live_ll, dead, dead_ll, acc = replace_batch(live, live_ll, k_it)
        dead_np = np.asarray(dead)
        dead_ll_np = np.asarray(dead_ll)
        # batch shrinkage: removing the j-th worst of n live points (not
        # yet replaced) shrinks the enclosed mass by E[dlogX] =
        # -1/(n - j + 1); summed over the batch this is ln(n/(n-K)),
        # NOT K/n — using K/n biases logZ high.
        for j in range(1, K + 1):
            log_x = log_x_prev - 1.0 / (n_live - j + 1)
            log_w = np.log(max(np.exp(log_x_prev) - np.exp(log_x), 1e-320))
            logz = np.logaddexp(logz, log_w + dead_ll_np[j - 1])
            dead_log_w.append(log_w)
            log_x_prev = log_x
        dead_points.append(dead_np)
        dead_lls.append(dead_ll_np)
        it += 1
        # termination: remaining evidence small
        ll_max = float(jnp.max(live_ll))
        dlogz = np.logaddexp(logz, log_x_prev + ll_max) - logz
        if verbosity >= 2 and it % 20 == 0:
            print(
                f"nested it {it}: logz={logz:.3f} dlogz={dlogz:.3f} "
                f"accept={float(acc):.2f}"
            )
        if dlogz < dlogz_tol:
            break

    # add remaining live points: each carries an equal width
    # X_final / n_live of the remaining prior mass
    live_np = np.asarray(live)
    live_ll_np = np.asarray(live_ll)
    order = np.argsort(live_ll_np)
    log_w_live = log_x_prev - math.log(n_live)
    for j in order:
        logz = np.logaddexp(logz, log_w_live + live_ll_np[j])
        dead_points.append(live_np[j : j + 1])
        dead_lls.append(live_ll_np[j : j + 1])
        dead_log_w.append(log_w_live)

    dead_all = np.concatenate(dead_points)
    dead_ll_all = np.concatenate(dead_lls)
    n_dead = len(dead_all)
    log_w = np.asarray(dead_log_w)
    log_wt = log_w + dead_ll_all
    log_wt -= log_wt.max()
    w = np.exp(log_wt)
    w /= w.sum()

    # resample to equal weights
    rng = np.random.default_rng(0)
    idx = rng.choice(n_dead, size=n_dead, p=w)
    samples = dead_all[idx]

    nts = jax.vmap(model.arr2nt)(jnp.asarray(samples))
    cols = flatten_params_batch(nts)
    data = {k: np.asarray(v)[None, :] for k, v in cols.items() if np.ndim(v) == 1}
    internals = {"loglike": dead_ll_all[idx][None, :]}
    info = {
        "sampler": "nested_batched",
        "model_name": model.system.name,
        "logz": float(logz),
        "n_iterations": it,
        "n_dead": n_dead,
    }
    if verbosity >= 1:
        print(f"octofit_nested: logz = {logz:.3f} after {it} iterations")
    return Chains(data, internals, info), info


# Dynesty-compatible alias (`ext/OctofitterDynestyHypercubeTransformExt.jl:11`)
dysample = octofit_nested
