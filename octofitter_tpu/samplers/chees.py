"""ChEES-HMC: cross-chain adaptive-trajectory HMC.

TPU-production sampler replacing the reference's NUTS trajectory-length
adaptation (`/root/reference/src/sampling.jl:376-394`, AdvancedHMC
GeneralisedNoUTurn) with the accelerator-native equivalent: ChEES
(Change in the Estimator of the Expected Square; Hoffman, Radul &
Sountsov, AISTATS 2021). Instead of per-chain dynamic trees — whose
data-dependent nested control flow compiles slowly and runs
divergently on a TPU — all chains share one jittered trajectory length
whose maximum is tuned by gradient ascent on the ChEES criterion,
using the chain batch itself to estimate the criterion's gradient.

Design (all cross-chain, the chain axis is INSIDE each step):
- one shared Halton-jittered trajectory time t = u * T per step; the
  leapfrog count is a traced `while_loop` bound, so the compiled
  program contains exactly one batched leapfrog body (one fused
  gradient evaluation over (chains, D)) — compile-light on backends
  with slow compilers, and the dense-metric velocity product is a
  (chains, D) x (D, D) matmul that rides the MXU;
- step size: shared dual averaging on the mean Metropolis acceptance
  across chains (Stan parameters);
- trajectory length: Adam on log T maximizing ChEES, with the
  per-chain gradient estimate weighted by acceptance probability;
- metric: shared Welford covariance accumulated over (steps x chains)
  during Stan-style slow windows — thousands of chains give a
  converged dense metric within a few steps.

All functions take `value_and_grad(theta) -> (lp, grad)` operating on
a single (D,) vector; batching is internal.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .nuts import (
    Metric,
    NutsStats,
    build_warmup_schedule,
    da_init,
    da_update,
    metric_from_sigma,
    welford_init,
    welford_sigma,
    WelfordState,
)

MAX_DELTA_ENERGY = 1000.0


# --------------------------------------------------------------------------
# Batched metric ops (chains axis leading)
# --------------------------------------------------------------------------

def _velocity_batch(metric: Metric, R):
    if metric.sigma.ndim == 1:
        return R * metric.sigma[None, :]
    return R @ metric.sigma.T


def _kinetic_batch(metric: Metric, R):
    return 0.5 * jnp.sum(R * _velocity_batch(metric, R), axis=-1)


def _sample_momentum_batch(metric: Metric, key, C, D, dtype):
    Z = jax.random.normal(key, (C, D), dtype)
    if metric.sigma.ndim == 1:
        return Z / metric.chol[None, :]
    # r ~ N(0, sigma^{-1}); with sigma = L L^T, r = L^{-T} z
    return jax.scipy.linalg.solve_triangular(metric.chol.T, Z.T, lower=False).T


def _leapfrog_batch(vg_batch, Theta, R, Grad, eps, metric):
    R_half = R + 0.5 * eps * Grad
    Theta2 = Theta + eps * _velocity_batch(metric, R_half)
    lp2, Grad2 = vg_batch(Theta2)
    R2 = R_half + 0.5 * eps * Grad2
    return Theta2, R2, lp2, Grad2


def welford_update_batch(w: WelfordState, X):
    """Merge a (C, D) batch into a Welford accumulator (Chan et al.)."""
    C = X.shape[0]
    n_b = jnp.asarray(C, w.n.dtype)
    mean_b = X.mean(axis=0)
    delta = X - mean_b[None, :]
    if w.m2.ndim == 2:
        m2_b = delta.T @ delta
    else:
        m2_b = jnp.sum(delta * delta, axis=0)
    n = w.n + n_b
    d = mean_b - w.mean
    mean = w.mean + d * (n_b / jnp.maximum(n, 1))
    if w.m2.ndim == 2:
        corr = jnp.outer(d, d) * (w.n * n_b / jnp.maximum(n, 1))
    else:
        corr = d * d * (w.n * n_b / jnp.maximum(n, 1))
    return WelfordState(n, mean, w.m2 + m2_b + corr)


# --------------------------------------------------------------------------
# Halton sequence (host-side, feeds the scan as xs)
# --------------------------------------------------------------------------

def halton_sequence(n: int, base: int = 2) -> np.ndarray:
    """First n points of the van der Corput / Halton sequence in (0, 1)."""
    out = np.zeros(n)
    for i in range(n):
        f, r = 1.0, 0.0
        k = i + 1
        while k > 0:
            f /= base
            r += f * (k % base)
            k //= base
        out[i] = r
    return out


# --------------------------------------------------------------------------
# Adam on log trajectory length
# --------------------------------------------------------------------------

class AdamState(NamedTuple):
    m: jax.Array
    v: jax.Array
    t: jax.Array


def _adam_init(dtype):
    z = jnp.zeros((), dtype)
    return AdamState(z, z, z)


def _adam_step(state: AdamState, g, lr=0.025, b1=0.9, b2=0.95, eps=1e-8):
    t = state.t + 1
    m = b1 * state.m + (1 - b1) * g
    v = b2 * state.v + (1 - b2) * g * g
    mh = m / (1 - b1**t)
    vh = v / (1 - b2**t)
    return AdamState(m, v, t), lr * mh / (jnp.sqrt(vh) + eps)


# --------------------------------------------------------------------------
# One ChEES transition over the whole chain batch
# --------------------------------------------------------------------------

def _chees_transition(vg_batch, Theta, lp, Grad, key, eps, traj_len, u,
                      metric, max_leapfrog, n_chunks=1):
    """Shared-trajectory HMC step for all chains at once.

    Returns new (Theta, lp, Grad), per-chain stats, and the ChEES
    trajectory-length gradient estimate.

    n_chunks > 1 splits the chain batch into that many sequential
    sub-batches INSIDE the step (lax.map over the leapfrog while-loop),
    shrinking every per-kernel buffer by the chunk factor while keeping
    the cross-chain adaptation exact (acceptance, ChEES gradient and
    Welford all still see the full batch). This is a program-shape
    workaround for the axon backend's intermittent kernel faults on
    very large single-kernel chain batches — statistically identical
    to n_chunks=1 up to RNG-independent reduction order.
    """
    C, D = Theta.shape
    k_mom, k_acc = jax.random.split(key)
    R0 = _sample_momentum_batch(metric, k_mom, C, D, Theta.dtype)
    H0 = -lp + _kinetic_batch(metric, R0)

    t_traj = u * traj_len
    L = jnp.clip(
        jnp.ceil(t_traj / eps).astype(jnp.int32), 1, max_leapfrog
    )

    def _leapfrogs(Th0, R0_, lp0, G0):
        def cond(s):
            return s[0] < L

        def body(s):
            i, Th, R, lpv, G = s
            Th2, R2, lp2, G2 = _leapfrog_batch(vg_batch, Th, R, G, eps, metric)
            return (i + 1, Th2, R2, lp2, G2)

        _, Th1, R1, lp1, G1 = jax.lax.while_loop(
            cond, body, (jnp.asarray(0, jnp.int32), Th0, R0_, lp0, G0)
        )
        return Th1, R1, lp1, G1

    if n_chunks > 1:
        assert C % n_chunks == 0, (C, n_chunks)
        Cs = C // n_chunks
        parts = jax.lax.map(
            lambda args: _leapfrogs(*args),
            (
                Theta.reshape(n_chunks, Cs, D),
                R0.reshape(n_chunks, Cs, D),
                lp.reshape(n_chunks, Cs),
                Grad.reshape(n_chunks, Cs, D),
            ),
        )
        Theta1, R1, lp1, Grad1 = (
            p.reshape((C,) + p.shape[2:]) for p in parts
        )
    else:
        Theta1, R1, lp1, Grad1 = _leapfrogs(Theta, R0, lp, Grad)

    H1 = -lp1 + _kinetic_batch(metric, R1)
    delta = H1 - H0
    delta = jnp.where(jnp.isnan(delta), jnp.inf, delta)
    alpha = jnp.minimum(1.0, jnp.exp(-delta))
    divergent = delta > MAX_DELTA_ENERGY

    accept = jax.random.uniform(k_acc, (C,), Theta.dtype) < alpha
    acc = accept[:, None]
    Theta_new = jnp.where(acc, Theta1, Theta)
    lp_new = jnp.where(accept, lp1, lp)
    Grad_new = jnp.where(acc, Grad1, Grad)

    # --- ChEES gradient estimate (Hoffman et al. 2021, eq. 8) ---------
    # Use only non-divergent proposals; weight by acceptance prob.
    w = jnp.where(divergent, 0.0, alpha)
    mean_cur = Theta.mean(axis=0)
    # proposal mean weighted to be robust against divergent garbage
    wsum = jnp.maximum(w.sum(), 1e-12)
    mean_prop = (w[:, None] * Theta1).sum(axis=0) / wsum
    dsq_prop = jnp.sum((Theta1 - mean_prop[None, :]) ** 2, axis=1)
    dsq_cur = jnp.sum((Theta - mean_cur[None, :]) ** 2, axis=1)
    V1 = _velocity_batch(metric, R1)  # dtheta/dt at trajectory end
    proj = jnp.sum((Theta1 - mean_prop[None, :]) * V1, axis=1)
    per_chain = (dsq_prop - dsq_cur) * proj
    per_chain = jnp.where(jnp.isfinite(per_chain), per_chain, 0.0)
    # d t / d log T = t, and t = u*T shared across chains
    grad_logT = (w * per_chain).sum() / wsum * u

    stats = NutsStats(
        acceptance_rate=alpha,
        is_divergent=divergent,
        tree_depth=jnp.zeros((C,), jnp.int32),
        n_steps=jnp.full((C,), L),
        energy=H0,
        step_size=jnp.full((C,), eps),
    )
    return Theta_new, lp_new, Grad_new, stats, grad_logT


# --------------------------------------------------------------------------
# Full run
# --------------------------------------------------------------------------

def run_chees(
    value_and_grad,
    theta0_batch,
    key,
    n_warmup: int = 1000,
    n_samples: int = 1000,
    target_accept: float = 0.75,
    metric: str = "dense",
    initial_sigma=None,
    max_leapfrog: int = 1024,
    initial_step_size: float = 0.05,
    adam_lr: float = 0.025,
    warmup_state: dict | None = None,
    n_chunks: int = 1,
    drop_warmup: bool = True,
):
    """Warmup + sample with cross-chain ChEES adaptation.

    Same output contract as `run_nuts`: (samples [C, S, D], lps [C, S],
    NutsStats with [C, S] leaves, info dict). The chain batch is shared
    state: step size, trajectory length, and metric are adapted jointly
    from all chains, which converges far faster than per-chain Stan
    windows at large chain counts.

    warmup_state: dict(step_size, trajectory_length, sigma) from a
    previous run's info — skips warmup entirely and samples with the
    saved tuning (checkpoint-resume of the sampler state).
    drop_warmup: when False, the adaptation-phase draws are recorded
    and prepended to the returned draws (reference octofit
    `drop_warmup`, `sampling.jl:129`).
    """
    theta0_batch = jnp.asarray(theta0_batch)
    C, D = theta0_batch.shape
    dtype = theta0_batch.dtype
    dense = metric == "dense"

    if initial_sigma is None:
        sigma0 = jnp.eye(D, dtype=dtype) if dense else jnp.ones((D,), dtype)
    else:
        sigma0 = jnp.asarray(initial_sigma, dtype)
        if dense and sigma0.ndim == 1:
            sigma0 = jnp.diag(sigma0)
        if not dense and sigma0.ndim == 2:
            sigma0 = jnp.diag(sigma0)

    is_slow, window_end = build_warmup_schedule(n_warmup)
    halton_w = jnp.asarray(halton_sequence(n_warmup), dtype)
    halton_s = jnp.asarray(halton_sequence(n_samples), dtype)

    vg_batch = jax.vmap(value_and_grad)

    skip_warmup = warmup_state is not None
    if skip_warmup:
        ws_eps = jnp.asarray(warmup_state["step_size"], dtype)
        ws_T = jnp.asarray(warmup_state["trajectory_length"], dtype)
        ws_sigma = jnp.asarray(warmup_state["sigma"], dtype)

    @jax.jit
    def _run(theta0, key, sigma0):
        lp0, grad0 = vg_batch(theta0)
        metric0 = metric_from_sigma(sigma0)

        if skip_warmup:
            metric_f = metric_from_sigma(ws_sigma)
            lp0, grad0 = vg_batch(theta0)

            def sample_step0(carry2, u):
                Theta, lp, Grad, key = carry2
                key, k_step = jax.random.split(key)
                Theta, lp, Grad, stats, _ = _chees_transition(
                    vg_batch, Theta, lp, Grad, k_step, ws_eps, ws_T, u,
                    metric_f, max_leapfrog, n_chunks,
                )
                return (Theta, lp, Grad, key), (Theta, lp, stats)

            (_, _, _, _), (Thetas, lps, stats) = jax.lax.scan(
                sample_step0, (theta0, lp0, grad0, key), halton_s
            )
            samples = jnp.moveaxis(Thetas, 0, 1)
            lps_out = jnp.moveaxis(lps, 0, 1)
            stats_out = jax.tree.map(lambda x: jnp.moveaxis(x, 0, 1), stats)
            info = {
                "step_size": ws_eps,
                "trajectory_length": ws_T,
                "sigma": metric_f.sigma,
                "warmup_divergences": jnp.asarray(0),
                "trajectory_length_trace": jnp.zeros((0,), dtype),
            }
            return samples, lps_out, stats_out, info

        carry0 = {
            "Theta": theta0,
            "lp": lp0,
            "Grad": grad0,
            "da": da_init(jnp.asarray(initial_step_size, dtype)),
            "log_T": jnp.log(jnp.asarray(16.0 * initial_step_size, dtype)),
            "adam": _adam_init(dtype),
            "welford": welford_init(D, dtype, dense),
            "metric": metric0,
            "key": key,
        }

        def warm_step(carry, xs):
            u, slow, wend = xs
            key, k_step = jax.random.split(carry["key"])
            eps = jnp.exp(carry["da"].log_eps)
            T = jnp.exp(carry["log_T"])
            Theta, lp, Grad, stats, g_logT = _chees_transition(
                vg_batch, carry["Theta"], carry["lp"], carry["Grad"],
                k_step, eps, T, u, carry["metric"], max_leapfrog, n_chunks,
            )
            # shared dual averaging on the cross-chain mean acceptance
            mean_alpha = stats.acceptance_rate.mean()
            da = da_update(carry["da"], mean_alpha, target_accept)
            # Adam ascent on log T (normalized gradient via Adam)
            adam, delta_logT = _adam_step(carry["adam"], g_logT, adam_lr)
            log_T = carry["log_T"] + delta_logT
            # keep T within [eps, max_leapfrog * eps]
            log_T = jnp.clip(
                log_T,
                carry["da"].log_eps,
                carry["da"].log_eps + jnp.log(float(max_leapfrog)),
            )

            # cross-chain Welford in slow windows
            w_upd = welford_update_batch(carry["welford"], Theta)
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
            da_reset = da_init(jnp.exp(da.log_eps))
            da = jax.tree.map(lambda a, b: jnp.where(wend, b, a), da, da_reset)

            carry_new = {
                "Theta": Theta,
                "lp": lp,
                "Grad": Grad,
                "da": da,
                "log_T": log_T,
                "adam": adam,
                "welford": welford,
                "metric": metric_new,
                "key": key,
            }
            out = (stats.is_divergent.sum(), jnp.exp(log_T))
            if not drop_warmup:  # record adaptation draws too
                out = out + ((Theta, lp, stats),)
            return carry_new, out

        carry, warm_scanned = jax.lax.scan(
            warm_step, carry0, (halton_w, is_slow, window_end)
        )
        wdivs, T_trace = warm_scanned[:2]

        eps_f = jnp.exp(carry["da"].log_eps_avg)
        T_f = jnp.exp(carry["log_T"])
        metric_f = carry["metric"]

        def sample_step(carry2, u):
            Theta, lp, Grad, key = carry2
            key, k_step = jax.random.split(key)
            Theta, lp, Grad, stats, _ = _chees_transition(
                vg_batch, Theta, lp, Grad, k_step, eps_f, T_f, u,
                metric_f, max_leapfrog, n_chunks,
            )
            return (Theta, lp, Grad, key), (Theta, lp, stats)

        (_, _, _, _), (Thetas, lps, stats) = jax.lax.scan(
            sample_step,
            (carry["Theta"], carry["lp"], carry["Grad"], carry["key"]),
            halton_s,
        )
        if not drop_warmup:
            w_Thetas, w_lps, w_stats = warm_scanned[2]
            Thetas = jnp.concatenate([w_Thetas, Thetas], axis=0)
            lps = jnp.concatenate([w_lps, lps], axis=0)
            stats = jax.tree.map(
                lambda a, b: jnp.concatenate([a, b], axis=0), w_stats, stats
            )
        # scan stacks on axis 0 = draws; move chains first
        samples = jnp.moveaxis(Thetas, 0, 1)
        lps_out = jnp.moveaxis(lps, 0, 1)
        # every stats leaf is (S, C); put chains first
        stats_out = jax.tree.map(lambda x: jnp.moveaxis(x, 0, 1), stats)
        info = {
            "step_size": eps_f,
            "trajectory_length": T_f,
            "sigma": metric_f.sigma,
            "warmup_divergences": wdivs.sum(),
            "trajectory_length_trace": T_trace,
        }
        return samples, lps_out, stats_out, info

    return _run(theta0_batch, key, sigma0)
