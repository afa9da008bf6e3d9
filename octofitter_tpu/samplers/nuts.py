"""Vectorized No-U-Turn sampler.

TPU-native replacement for the reference's AdvancedHMC-based `octofit`
(`/root/reference/src/sampling.jl:317-528`). Instead of one CPU chain,
this is a pure-JAX multinomial NUTS transition (iterative tree building
with O(max_depth) checkpointing, generalized U-turn criterion, biased
progressive sampling) that `vmap`s over a chain axis — thousands of
chains per chip — and `lax.scan`s over draws. Warmup is Stan-style
window adaptation (dual-averaged step size + diagonal or dense metric
from Welford accumulators, the dense default matching the reference's
DenseEuclideanMetric choice at `sampling.jl:336-394`), implemented
branch-free so the whole warmup is one scan.

All functions take an explicit `logdensity_and_grad(theta) -> (lp, g)`
and are model-agnostic.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


MAX_DELTA_ENERGY = 1000.0  # divergence threshold, as Stan/AdvancedHMC


class NutsStats(NamedTuple):
    acceptance_rate: jax.Array
    is_divergent: jax.Array
    tree_depth: jax.Array
    n_steps: jax.Array
    energy: jax.Array
    step_size: jax.Array


# --------------------------------------------------------------------------
# Metric (Euclidean; diagonal or dense decided statically by ndim)
# --------------------------------------------------------------------------

class Metric(NamedTuple):
    """sigma = M^{-1} (posterior-covariance estimate); chol = chol(sigma)."""

    sigma: jax.Array   # (D,) diagonal or (D, D) dense
    chol: jax.Array    # sqrt(sigma) or lower-Cholesky of sigma


def metric_from_sigma(sigma):
    sigma = jnp.asarray(sigma)
    if sigma.ndim == 1:
        return Metric(sigma, jnp.sqrt(sigma))
    return Metric(sigma, jnp.linalg.cholesky(sigma))


def _velocity(metric: Metric, r):
    if metric.sigma.ndim == 1:
        return metric.sigma * r
    return metric.sigma @ r


def _kinetic(metric: Metric, r):
    return 0.5 * jnp.dot(r, _velocity(metric, r))


def _sample_momentum(metric: Metric, key, D, dtype):
    z = jax.random.normal(key, (D,), dtype)
    if metric.sigma.ndim == 1:
        return z / metric.chol
    # r ~ N(0, sigma^{-1}); with sigma = L L^T, r = L^{-T} z
    return jax.scipy.linalg.solve_triangular(metric.chol.T, z, lower=False)


# --------------------------------------------------------------------------
# Leapfrog
# --------------------------------------------------------------------------

def _leapfrog(value_and_grad, theta, r, grad, eps, metric):
    r_half = r + 0.5 * eps * grad
    theta_new = theta + eps * _velocity(metric, r_half)
    lp_new, grad_new = value_and_grad(theta_new)
    r_new = r_half + 0.5 * eps * grad_new
    return theta_new, r_new, lp_new, grad_new


# --------------------------------------------------------------------------
# Iterative subtree construction with trailing-zero checkpointing
# --------------------------------------------------------------------------

def _tz(n):
    """Number of trailing zero bits of positive int32 n."""
    return jax.lax.population_count((n & -n) - 1)


def _is_turning(v_a, v_b, rho):
    return (jnp.dot(v_a, rho) <= 0) | (jnp.dot(v_b, rho) <= 0)


def _build_subtree(
    value_and_grad,
    theta0,
    r0,
    grad0,
    depth,          # traced: build 2**depth leaves
    direction,      # +-1
    eps,
    metric,
    H0,
    key,
    max_depth,
):
    """Build a subtree of 2**depth leapfrog steps from (theta0, r0).

    Returns the far edge, the multinomial-sampled candidate, the summed
    momentum, the log weight, and termination flags. U-turn checks
    between every completed sub-subtree's endpoints use momentum
    checkpoints indexed by trailing-zero counts, so memory is
    O(max_depth * D) regardless of subtree size.
    """
    D = theta0.shape[0]
    n_leaves = jnp.asarray(1, jnp.int32) << depth
    seps = direction * eps

    ckpt_r = jnp.zeros((max_depth + 1, D), theta0.dtype)
    ckpt_rsum = jnp.zeros((max_depth + 1, D), theta0.dtype)

    def cond(state):
        k = state["k"]
        return (k < n_leaves) & (~state["turning"]) & (~state["divergent"])

    def body(state):
        k = state["k"]
        key, k_accept = jax.random.split(state["key"])

        # checkpoint the state BEFORE this leaf if this leaf starts a
        # sub-subtree: slot = tz(k) (top slot for k == 0)
        slot = jnp.where(k == 0, max_depth, _tz(jnp.maximum(k, 1)))
        theta, r, grad = state["theta"], state["r"], state["grad"]

        theta, r, lp, grad = _leapfrog(
            value_and_grad, theta, r, grad, seps, metric
        )
        H = -lp + _kinetic(metric, r)
        delta = H - H0
        delta = jnp.where(jnp.isnan(delta), jnp.inf, delta)
        divergent = delta > MAX_DELTA_ENERGY
        logw = -H

        ckpt_r_new = state["ckpt_r"].at[slot].set(r)
        ckpt_rsum_new = state["ckpt_rsum"].at[slot].set(state["rho"])
        rho = state["rho"] + r

        # multinomial progressive sampling within the subtree
        logw_tot_new = jnp.logaddexp(state["logw"], logw)
        p_accept_leaf = jnp.exp(logw - logw_tot_new)
        take = jax.random.uniform(k_accept) < p_accept_leaf
        prop_theta = jnp.where(take, theta, state["prop_theta"])
        prop_lp = jnp.where(take, lp, state["prop_lp"])
        prop_grad = jnp.where(take, grad, state["prop_grad"])

        # U-turn checks across every completed sub-subtree ending at k
        T = _tz(k + 1)

        def check(j, turning):
            s = k + 1 - (jnp.asarray(1, jnp.int32) << j)
            c = jnp.where(s == 0, max_depth, _tz(jnp.maximum(s, 1)))
            rho_span = rho - ckpt_rsum_new[c]
            v_s = _velocity(metric, ckpt_r_new[c])
            v_k = _velocity(metric, r)
            active = j <= T
            t = _is_turning(v_s, v_k, rho_span)
            return turning | (active & t)

        turning = jax.lax.fori_loop(
            1, max_depth + 1, check, state["turning"]
        )

        alpha = jnp.minimum(1.0, jnp.exp(-delta))

        return {
            "k": k + 1,
            "key": key,
            "theta": theta,
            "r": r,
            "grad": grad,
            "rho": rho,
            "logw": logw_tot_new,
            "prop_theta": prop_theta,
            "prop_lp": prop_lp,
            "prop_grad": prop_grad,
            "ckpt_r": ckpt_r_new,
            "ckpt_rsum": ckpt_rsum_new,
            "turning": turning,
            "divergent": state["divergent"] | divergent,
            "sum_alpha": state["sum_alpha"] + alpha,
        }

    init = {
        "k": jnp.asarray(0, jnp.int32),
        "key": key,
        "theta": theta0,
        "r": r0,
        "grad": grad0,
        "rho": jnp.zeros_like(theta0),
        "logw": jnp.asarray(-jnp.inf, theta0.dtype),
        "prop_theta": theta0,
        "prop_lp": jnp.asarray(-jnp.inf, theta0.dtype),
        "prop_grad": grad0,
        "ckpt_r": ckpt_r,
        "ckpt_rsum": ckpt_rsum,
        "turning": jnp.asarray(False),
        "divergent": jnp.asarray(False),
        "sum_alpha": jnp.asarray(0.0, theta0.dtype),
    }
    out = jax.lax.while_loop(cond, body, init)
    return out


# --------------------------------------------------------------------------
# One NUTS transition
# --------------------------------------------------------------------------

def nuts_step(
    value_and_grad,
    theta,
    lp,
    grad,
    key,
    eps,
    metric: Metric,
    max_depth: int = 10,
):
    """One multinomial-NUTS transition for a single chain.

    Returns (theta', lp', grad', stats). vmap over chains.
    """
    D = theta.shape[0]
    key_r, key_tree = jax.random.split(key)
    r0 = _sample_momentum(metric, key_r, D, theta.dtype)
    H0 = -lp + _kinetic(metric, r0)

    init = {
        "key": key_tree,
        "depth": jnp.asarray(0, jnp.int32),
        "theta_left": theta,
        "r_left": r0,
        "grad_left": grad,
        "theta_right": theta,
        "r_right": r0,
        "grad_right": grad,
        "prop_theta": theta,
        "prop_lp": lp,
        "prop_grad": grad,
        "logw": -H0,
        "rho": r0,
        "turning": jnp.asarray(False),
        "divergent": jnp.asarray(False),
        "sum_alpha": jnp.asarray(0.0, theta.dtype),
        "n_leaves": jnp.asarray(0, jnp.int32),
    }

    def cond(s):
        return (
            (s["depth"] < max_depth) & (~s["turning"]) & (~s["divergent"])
        )

    def body(s):
        key, k_dir, k_sub, k_merge = jax.random.split(s["key"], 4)
        go_right = jax.random.bernoulli(k_dir)
        direction = jnp.where(go_right, 1.0, -1.0)

        theta_e = jnp.where(go_right, s["theta_right"], s["theta_left"])
        r_e = jnp.where(go_right, s["r_right"], s["r_left"])
        grad_e = jnp.where(go_right, s["grad_right"], s["grad_left"])

        sub = _build_subtree(
            value_and_grad,
            theta_e,
            r_e,
            grad_e,
            s["depth"],
            direction,
            eps,
            metric,
            H0,
            k_sub,
            max_depth,
        )

        ok = (~sub["turning"]) & (~sub["divergent"])

        # biased progressive sampling between old tree and new subtree
        p_new = jnp.exp(jnp.minimum(0.0, sub["logw"] - s["logw"]))
        take = ok & (jax.random.uniform(k_merge) < p_new)
        prop_theta = jnp.where(take, sub["prop_theta"], s["prop_theta"])
        prop_lp = jnp.where(take, sub["prop_lp"], s["prop_lp"])
        prop_grad = jnp.where(take, sub["prop_grad"], s["prop_grad"])

        # update edges (only meaningful if subtree fully built; harmless
        # otherwise since we stop next iteration)
        theta_left = jnp.where(go_right, s["theta_left"], sub["theta"])
        r_left = jnp.where(go_right, s["r_left"], sub["r"])
        grad_left = jnp.where(go_right, s["grad_left"], sub["grad"])
        theta_right = jnp.where(go_right, sub["theta"], s["theta_right"])
        r_right = jnp.where(go_right, sub["r"], s["r_right"])
        grad_right = jnp.where(go_right, sub["grad"], s["grad_right"])

        rho = s["rho"] + sub["rho"]
        turning_total = _is_turning(
            _velocity(metric, r_left), _velocity(metric, r_right), rho
        )

        return {
            "key": key,
            "depth": s["depth"] + 1,
            "theta_left": theta_left,
            "r_left": r_left,
            "grad_left": grad_left,
            "theta_right": theta_right,
            "r_right": r_right,
            "grad_right": grad_right,
            "prop_theta": prop_theta,
            "prop_lp": prop_lp,
            "prop_grad": prop_grad,
            "logw": jnp.logaddexp(s["logw"], sub["logw"]),
            "rho": rho,
            "turning": sub["turning"] | sub["divergent"] | turning_total,
            "divergent": sub["divergent"],
            "sum_alpha": s["sum_alpha"] + sub["sum_alpha"],
            "n_leaves": s["n_leaves"] + sub["k"],
        }

    out = jax.lax.while_loop(cond, body, init)
    n = jnp.maximum(out["n_leaves"], 1)
    stats = NutsStats(
        acceptance_rate=out["sum_alpha"] / n,
        is_divergent=out["divergent"],
        tree_depth=out["depth"],
        n_steps=out["n_leaves"],
        energy=H0,
        step_size=eps,
    )
    return out["prop_theta"], out["prop_lp"], out["prop_grad"], stats


# --------------------------------------------------------------------------
# Step-size search + dual averaging
# --------------------------------------------------------------------------

def find_reasonable_step_size(value_and_grad, theta, lp, grad, key, metric):
    """Double/halve eps until one-leapfrog accept prob crosses 0.5
    (AdvancedHMC `find_good_stepsize` behavior, `sampling.jl:376`)."""
    D = theta.shape[0]
    r0 = _sample_momentum(metric, key, D, theta.dtype)
    H0 = -lp + _kinetic(metric, r0)

    def accept_prob(eps):
        _, r1, lp1, _ = _leapfrog(value_and_grad, theta, r0, grad, eps, metric)
        H1 = -lp1 + _kinetic(metric, r1)
        p = jnp.exp(jnp.clip(H0 - H1, -1e3, 0.0))
        return jnp.where(jnp.isnan(p), 0.0, p), jnp.isfinite(H1)

    eps0 = jnp.asarray(0.1, theta.dtype)
    p0, ok0 = accept_prob(eps0)
    dirn = jnp.where(ok0 & (p0 > 0.5), 1.0, -1.0)

    def cond(state):
        eps, i = state
        p, ok = accept_prob(eps)
        crossed = jnp.where(dirn > 0, (~ok) | (p < 0.5), ok & (p > 0.5))
        return (~crossed) & (i < 60)

    def body(state):
        eps, i = state
        return eps * jnp.where(dirn > 0, 2.0, 0.5), i + 1

    eps, _ = jax.lax.while_loop(cond, body, (eps0, jnp.asarray(0)))
    # step back once on the doubling side for safety
    return jnp.clip(eps * jnp.where(dirn > 0, 0.5, 1.0), 1e-8, 1e3)


class DualAveragingState(NamedTuple):
    log_eps: jax.Array
    log_eps_avg: jax.Array
    h_avg: jax.Array
    mu: jax.Array
    count: jax.Array


def da_init(eps):
    return DualAveragingState(
        log_eps=jnp.log(eps),
        log_eps_avg=jnp.log(eps),
        h_avg=jnp.zeros_like(eps),
        mu=jnp.log(10.0 * eps),
        count=jnp.zeros_like(eps),
    )


def da_update(state: DualAveragingState, alpha, target=0.8,
              gamma=0.05, t0=10.0, kappa=0.75):
    t = state.count + 1
    h_avg = (1 - 1 / (t + t0)) * state.h_avg + (target - alpha) / (t + t0)
    log_eps = state.mu - jnp.sqrt(t) / gamma * h_avg
    eta = t ** (-kappa)
    log_eps_avg = eta * log_eps + (1 - eta) * state.log_eps_avg
    return DualAveragingState(log_eps, log_eps_avg, h_avg, state.mu, t)


# --------------------------------------------------------------------------
# Welford accumulator for the metric (diag or dense)
# --------------------------------------------------------------------------

class WelfordState(NamedTuple):
    n: jax.Array
    mean: jax.Array
    m2: jax.Array      # (D,) for diag, (D, D) for dense


def welford_init(D, dtype, dense: bool):
    return WelfordState(
        n=jnp.zeros((), dtype),
        mean=jnp.zeros((D,), dtype),
        m2=jnp.zeros((D, D) if dense else (D,), dtype),
    )


def welford_update(w: WelfordState, x):
    n = w.n + 1
    delta = x - w.mean
    mean = w.mean + delta / n
    delta2 = x - mean
    if w.m2.ndim == 2:
        m2 = w.m2 + jnp.outer(delta, delta2)
    else:
        m2 = w.m2 + delta * delta2
    return WelfordState(n, mean, m2)


def welford_sigma(w: WelfordState):
    """Regularized covariance estimate (Stan's shrinkage to identity)."""
    var = w.m2 / jnp.maximum(w.n - 1, 1)
    shrink = w.n / (w.n + 5.0)
    if w.m2.ndim == 2:
        D = w.mean.shape[0]
        return shrink * var + 1e-3 * (1 - shrink) * jnp.eye(D, dtype=var.dtype)
    return shrink * var + 1e-3 * (1 - shrink)


# --------------------------------------------------------------------------
# Warmup schedule (host-side static arrays)
# --------------------------------------------------------------------------

def build_warmup_schedule(n_warmup: int):
    """Stan's three-stage windowed schedule: returns boolean arrays
    (is_slow[s], window_end[s]) of length n_warmup."""
    init_buffer, term_buffer, base_window = 75, 50, 25
    if n_warmup < init_buffer + term_buffer + base_window:
        # degenerate short warmup: single window covering the middle
        init_buffer = max(1, int(0.15 * n_warmup))
        term_buffer = max(1, int(0.1 * n_warmup))
        base_window = max(1, n_warmup - init_buffer - term_buffer)
    is_slow = np.zeros(n_warmup, bool)
    window_end = np.zeros(n_warmup, bool)
    slow_lo = init_buffer
    slow_hi = n_warmup - term_buffer
    is_slow[slow_lo:slow_hi] = True
    # doubling windows
    w = base_window
    pos = slow_lo
    while pos < slow_hi:
        end = pos + w
        if end + 2 * w > slow_hi:
            end = slow_hi
        window_end[min(end, slow_hi) - 1] = True
        pos = end
        w *= 2
    return jnp.asarray(is_slow), jnp.asarray(window_end)


# --------------------------------------------------------------------------
# Full warmup + sampling for a single chain (vmap over chains)
# --------------------------------------------------------------------------

def _warmup_single(
    value_and_grad,
    theta0,
    key,
    n_warmup,
    schedule,
    max_depth,
    target_accept,
    sigma0,
    transition=None,
    initial_step_size=None,
    record=False,
):
    if transition is None:
        transition = nuts_step
    D = theta0.shape[0]
    dtype = theta0.dtype
    dense = sigma0.ndim == 2
    is_slow, window_end = schedule

    lp0, grad0 = value_and_grad(theta0)
    metric0 = metric_from_sigma(sigma0)
    key, k_eps = jax.random.split(key)
    if initial_step_size is None:
        eps0 = find_reasonable_step_size(
            value_and_grad, theta0, lp0, grad0, k_eps, metric0
        )
    else:
        # manual override (reference octofit step_size= kwarg,
        # `sampling.jl:133`): seed dual averaging here instead of the
        # automatic search; adaptation still refines it
        eps0 = jnp.asarray(initial_step_size, dtype)

    carry0 = {
        "theta": theta0,
        "lp": lp0,
        "grad": grad0,
        "da": da_init(eps0),
        "welford": welford_init(D, dtype, dense),
        "metric": metric0,
        "key": key,
    }

    def step(carry, xs):
        slow, wend = xs
        key, k_step = jax.random.split(carry["key"])
        eps = jnp.exp(carry["da"].log_eps)
        theta, lp, grad, stats = transition(
            value_and_grad,
            carry["theta"],
            carry["lp"],
            carry["grad"],
            k_step,
            eps,
            carry["metric"],
            max_depth,
        )
        da = da_update(carry["da"], stats.acceptance_rate, target_accept)

        # accumulate the metric during slow windows
        w_upd = welford_update(carry["welford"], theta)
        welford = jax.tree.map(
            lambda new, old: jnp.where(slow, new, old), w_upd, carry["welford"]
        )

        # at a window end: swap in the new metric, reset welford and
        # re-initialize dual averaging around the current step size
        new_metric = metric_from_sigma(welford_sigma(welford))
        metric = jax.tree.map(
            lambda new, old: jnp.where(wend, new, old),
            new_metric,
            carry["metric"],
        )
        welford = jax.tree.map(
            lambda w, z: jnp.where(wend, z, w),
            welford,
            welford_init(D, dtype, dense),
        )
        da_reset = da_init(jnp.exp(da.log_eps))
        da = jax.tree.map(
            lambda a, b: jnp.where(wend, b, a), da, da_reset
        )

        carry_new = {
            "theta": theta,
            "lp": lp,
            "grad": grad,
            "da": da,
            "welford": welford,
            "metric": metric,
            "key": key,
        }
        out = stats.is_divergent
        if record:  # keep warmup draws (octofit drop_warmup=False)
            out = (out, (theta, lp, stats))
        return carry_new, out

    carry, scanned = jax.lax.scan(step, carry0, (is_slow, window_end))
    divs = scanned[0] if record else scanned
    eps_final = jnp.exp(carry["da"].log_eps_avg)
    out = (
        carry["theta"],
        carry["lp"],
        carry["grad"],
        eps_final,
        carry["metric"],
        carry["key"],
        jnp.sum(divs),
    )
    if record:
        out = out + (scanned[1],)
    return out


def _sample_single(
    value_and_grad,
    theta0,
    lp0,
    grad0,
    key,
    eps,
    metric,
    n_samples,
    max_depth,
    transition=None,
):
    if transition is None:
        transition = nuts_step

    def step(carry, _):
        theta, lp, grad, key = carry
        key, k_step = jax.random.split(key)
        theta, lp, grad, stats = transition(
            value_and_grad, theta, lp, grad, k_step, eps, metric, max_depth
        )
        return (theta, lp, grad, key), (theta, lp, stats)

    (_, _, _, _), (thetas, lps, stats) = jax.lax.scan(
        step, (theta0, lp0, grad0, key), None, length=n_samples
    )
    return thetas, lps, stats


def run_nuts(
    value_and_grad,
    theta0_batch,
    key,
    n_warmup: int = 1000,
    n_samples: int = 1000,
    max_depth: int = 10,
    target_accept: float = 0.8,
    metric: str = "dense",
    initial_sigma=None,
    sampler: str = "nuts",
    initial_step_size=None,
    drop_warmup: bool = True,
):
    """Warmup + sample a batch of chains; fully jitted and vmapped.

    sampler: "nuts" (multinomial NUTS) or "hmc" (jittered-trajectory
    HMC with up to 2**(max_depth//2+2) leapfrog steps — a compile-light
    program for backends with slow compilers).

    theta0_batch: (n_chains, D) initial points (unconstrained space).
    metric: "dense" (default, matching the reference's dense metric,
    `sampling.jl:336-363`) or "diag".
    initial_sigma: optional (D,)/(D,D) initial M^{-1} shared by chains,
    e.g. the covariance of the starting points.
    initial_step_size: manual initial step size (skips the automatic
    search; adaptation still refines it) — reference octofit
    `step_size=` (`sampling.jl:133`).
    drop_warmup: when False, warmup draws are recorded and prepended
    to the returned draws (reference octofit `drop_warmup`,
    `sampling.jl:129`).
    Returns (samples [chains, draws, D], lps [chains, draws], stats
    pytree with leading [chains, draws] axes, warmup info dict).
    """
    n_chains, D = theta0_batch.shape
    dtype = theta0_batch.dtype
    schedule = build_warmup_schedule(n_warmup)
    keys = jax.random.split(key, n_chains)

    if sampler == "hmc":
        from .hmc import hmc_step

        n_leap = max(2 ** (max_depth // 2 + 2), 8)

        def transition(vg, th, lp, g, k, e, m, _depth):
            return hmc_step(vg, th, lp, g, k, e, m, n_leap)
    else:
        transition = None

    if initial_sigma is None:
        sigma0 = (
            jnp.eye(D, dtype=dtype) if metric == "dense" else jnp.ones((D,), dtype)
        )
    else:
        sigma0 = jnp.asarray(initial_sigma, dtype)
        if metric == "dense" and sigma0.ndim == 1:
            sigma0 = jnp.diag(sigma0)
        if metric == "diag" and sigma0.ndim == 2:
            sigma0 = jnp.diag(sigma0)

    record = not drop_warmup

    @jax.jit
    def _run(theta0_batch, keys, sigma0):
        warm = jax.vmap(
            lambda th, k: _warmup_single(
                value_and_grad, th, k, n_warmup, schedule, max_depth,
                target_accept, sigma0, transition, initial_step_size,
                record,
            )
        )(theta0_batch, keys)
        theta_w, lp_w, grad_w, eps_f, metric_f, keys_f, wdivs = warm[:7]

        samples, lps, stats = jax.vmap(
            lambda th, lp, g, k, e, m: _sample_single(
                value_and_grad, th, lp, g, k, e, m, n_samples, max_depth,
                transition,
            )
        )(theta_w, lp_w, grad_w, keys_f, eps_f, metric_f)
        if record:
            # vmapped per-chain scans stack draws on axis 1 already
            w_thetas, w_lps, w_stats = warm[7]
            samples = jnp.concatenate([w_thetas, samples], axis=1)
            lps = jnp.concatenate([w_lps, lps], axis=1)
            stats = jax.tree.map(
                lambda a, b: jnp.concatenate([a, b], axis=1), w_stats, stats
            )
        return samples, lps, stats, {
            "step_size": eps_f,
            "sigma": metric_f.sigma,
            "warmup_divergences": wdivs,
        }

    return _run(theta0_batch, keys, sigma0)
