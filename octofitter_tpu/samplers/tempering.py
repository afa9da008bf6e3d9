"""Non-reversible parallel tempering on device.

TPU-native replacement for the reference's Pigeons integration
(`/root/reference/ext/OctofitterPigeonsExt/OctofitterPigeonsExt.jl`):
non-reversible (deterministic even/odd, DEO) replica exchange between a
prior reference and the posterior target, round-based schedule
adaptation from swap rejection rates (Syed et al. 2021), round-trip
accounting, and stepping-stone log-evidence.

Where Pigeons runs one chain per thread / MPI rank, here the whole
replica ladder is an array axis: states are (n_walkers, n_temps, D),
the explorer (our NUTS transition on the annealed density) vmaps over
both axes, and a swap is a gather — no communication on one chip, and
`ppermute`-shaped over ICI when the ladder is sharded across a mesh.

Annealed density in unconstrained space:
    log pi_beta(theta) = ln_prior_t(theta) + beta * ln_like(theta)
with the beta=0 chain regenerated IID from the prior each sweep
(`OctofitterPigeonsExt.jl:42-50` sample_iid!).
"""

from __future__ import annotations

import time
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..chains import Chains, flatten_params_batch
from .nuts import (
    da_init,
    da_update,
    metric_from_sigma,
    nuts_step,
)


def _make_annealed_vg(model):
    """value_and_grad of log pi_beta, plus loglike as aux."""

    def annealed(theta_t, beta):
        lp_prior = model.ln_prior_transformed(theta_t)
        theta_nt = model.arr2nt(model.invlink(theta_t))
        ll = model.ln_like_nt(theta_nt)
        ll = jnp.where(jnp.isfinite(ll), ll, -jnp.inf)
        return lp_prior + beta * ll, ll

    return jax.value_and_grad(annealed, has_aux=True)


def _pt_save_checkpoint(path, state: dict):
    """Round-boundary PT checkpoint (reference: Pigeons checkpoint=true,
    `OctofitterPigeonsExt.jl:81`, `docs/src/parallel-sampling.md:14`).
    Captures every loop-carried quantity, so a resumed run is
    bit-identical to an uninterrupted one."""
    da = state["da_states"]
    da_arr = np.stack(
        [
            np.asarray(
                [d.log_eps, d.log_eps_avg, d.h_avg, d.mu, d.count], float
            )
            for d in da
        ]
    )
    np.savez(
        path,
        theta=np.asarray(state["theta"]),
        betas=np.asarray(state["betas"]),
        eps=np.asarray(state["eps"]),
        sigma_diag=np.asarray(state["sigma_diag"]),
        labels=state["labels"],
        direction=state["direction"],
        n_round_trips=state["n_round_trips"],
        sweep_counter=state["sweep_counter"],
        next_round=state["next_round"],
        da=da_arr,
        key_data=np.asarray(jax.random.key_data(state["key"])),
    )


def _pt_load_checkpoint(path):
    from .nuts import DualAveragingState

    z = np.load(path)
    da_states = [
        DualAveragingState(*(jnp.asarray(row[i]) for i in range(5)))
        for row in z["da"]
    ]
    return dict(
        theta=jnp.asarray(z["theta"]),
        betas=jnp.asarray(z["betas"]),
        eps=jnp.asarray(z["eps"]),
        sigma_diag=jnp.asarray(z["sigma_diag"]),
        labels=z["labels"],
        direction=z["direction"],
        n_round_trips=int(z["n_round_trips"]),
        sweep_counter=int(z["sweep_counter"]),
        next_round=int(z["next_round"]),
        da_states=da_states,
        key=jax.random.wrap_key_data(jnp.asarray(z["key_data"])),
    )


def octofit_pigeons(
    model,
    *,
    key=None,
    n_rounds: int = 10,
    n_chains: int = 16,
    n_walkers: int = 32,
    explorer: str = "nuts",
    explorer_max_depth: int = 8,
    explorer_n_leapfrog: int = 64,
    target_accept: float = 0.8,
    verbosity: int = 1,
    checkpoint: str | None = None,
    resume: str | None = None,
):
    """Parallel-tempered sampling; returns (Chains, pt_info dict).

    Defaults mirror the reference (`OctofitterPigeonsExt.jl:76-83`):
    n_chains temperatures between prior and posterior, rounds double in
    length; `n_walkers` independent ladders run vectorized for
    throughput (TPU-native addition).

    checkpoint: path; after every non-final round the full PT state is
    saved there (npz). resume: path of such a checkpoint; the run
    continues mid-schedule, bit-identical to an uninterrupted run with
    the same n_rounds.

    explorer: "nuts" (default; per-replica dynamic trees, best mixing
    per sweep) or "hmc" (jittered-trajectory HMC with
    explorer_n_leapfrog max steps — compile-light; use on backends
    where the NUTS tree program is slow to compile). The reference
    uses Pigeons' gradient-free SliceSampler
    (`OctofitterPigeonsExt.jl:70-72`); gradient-based explorers mix
    faster per sweep on these posteriors.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    D = model.D
    W, N = n_walkers, n_chains

    annealed_vg = _make_annealed_vg(model)

    def vg_at_beta(beta):
        def vg(theta):
            (val, ll), grad = annealed_vg(theta, beta)
            return val, grad

        return vg

    # --- initial states: prior draws (or starting points for target end)
    key, k0 = jax.random.split(key)
    draws = model.sample_priors(k0, W * N)
    theta = jax.vmap(model.link)(draws).reshape(W, N, D)

    betas = jnp.linspace(0.0, 1.0, N)

    # per-temperature explorer adaptation state (shared across walkers)
    eps = jnp.full((N,), 0.05)
    sigma_diag = jnp.ones((N, D))

    # index process bookkeeping (host-side, per walker)
    labels = np.tile(np.arange(N), (W, 1))        # replica id at each temp slot
    direction = np.zeros((W, N), int)             # +1 going up, -1 down
    direction[:, 0] = 1
    direction[:, -1] = -1
    n_round_trips = 0

    if explorer == "hmc":
        from .hmc import hmc_step

        def _transition(vg, th, lp, grad, key, e, metric):
            return hmc_step(vg, th, lp, grad, key, e, metric,
                            explorer_n_leapfrog)
    else:

        def _transition(vg, th, lp, grad, key, e, metric):
            return nuts_step(vg, th, lp, grad, key, e, metric,
                             explorer_max_depth)

    def explorer_step(theta, key, betas, eps, sigma_diag):
        """One explorer transition per (walker, temp) on the annealed
        density."""

        def one(theta_wn, key_wn, beta, e, sd):
            vg = vg_at_beta(beta)
            lp, grad = vg(theta_wn)
            metric = metric_from_sigma(sd)
            th, lp2, _, stats = _transition(
                vg, theta_wn, lp, grad, key_wn, e, metric
            )
            return th, stats.acceptance_rate

        # vmap over temps, then walkers
        f = jax.vmap(one, in_axes=(0, 0, 0, 0, 0))        # temps
        f = jax.vmap(f, in_axes=(0, 0, None, None, None))  # walkers
        return f(theta, key, betas, eps, sigma_diag)

    def loglikes(theta):
        flat = theta.reshape(-1, D)
        nts = jax.vmap(lambda t: model.arr2nt(model.invlink(t)))(flat)
        ll = jax.vmap(model.ln_like_nt)(nts)
        ll = jnp.where(jnp.isnan(ll), -jnp.inf, ll)
        return ll.reshape(theta.shape[0], theta.shape[1])

    @jax.jit
    def sweep(theta, key, betas, eps, sigma_diag, even_sweep):
        """Explore + IID-refresh beta=0 + one DEO swap pass.

        Returns new theta, per-temp mean acceptance, loglikes, and the
        per-pair swap-accept mask (W, N-1).
        """
        k_exp, k_ref, k_swap = jax.random.split(key, 3)
        keys = jax.random.split(k_exp, (W, N))
        theta, accept = explorer_step(theta, keys, betas, eps, sigma_diag)

        # regenerate the reference chain (beta=0) IID from the prior
        prior_draws = model.sample_priors(k_ref, W)
        theta = theta.at[:, 0, :].set(jax.vmap(model.link)(prior_draws))

        ll = loglikes(theta)

        # deterministic even/odd swap pass
        i0 = jnp.where(even_sweep, 0, 1)
        pair_start = jnp.arange(N - 1)
        active = (pair_start % 2) == (i0 % 2)
        dbeta = betas[1:] - betas[:-1]
        log_alpha = dbeta * (ll[:, :-1] - ll[:, 1:])  # (W, N-1)
        u = jax.random.uniform(k_swap, (W, N - 1))
        accept_swap = active[None, :] & (jnp.log(u) < log_alpha)

        # build a permutation per walker: swap i <-> i+1 where accepted.
        # active pairs never overlap, so position j pulls from j+1 when
        # pair j accepted, from j-1 when pair j-1 accepted, else j.
        base = jnp.arange(N)[None, :]
        pad_f = jnp.zeros((W, 1), bool)
        swap_right = jnp.concatenate([accept_swap, pad_f], axis=1)  # pair j
        swap_left = jnp.concatenate([pad_f, accept_swap], axis=1)   # pair j-1
        idx = jnp.where(swap_right, base + 1, jnp.where(swap_left, base - 1, base))

        theta = jnp.take_along_axis(theta, idx[:, :, None], axis=1)
        ll = jnp.take_along_axis(ll, idx, axis=1)
        return theta, accept, ll, accept_swap, idx

    # ------------------------------------------------------------------
    t_start = time.perf_counter()
    da_states = [da_init(e) for e in np.asarray(eps)]
    samples_final = []
    ll_by_temp_final = []
    rejection = np.zeros(N - 1)
    total_swaps = np.zeros(N - 1)
    barrier = None
    sweep_counter = 0
    start_round = 0

    if resume is not None:
        st = _pt_load_checkpoint(resume)
        if st["theta"].shape != (W, N, D):
            raise ValueError(
                f"checkpoint shape {st['theta'].shape} does not match "
                f"(n_walkers={W}, n_chains={N}, D={D})"
            )
        theta = st["theta"]
        betas = st["betas"]
        eps = st["eps"]
        sigma_diag = st["sigma_diag"]
        labels = st["labels"]
        direction = st["direction"]
        n_round_trips = st["n_round_trips"]
        sweep_counter = st["sweep_counter"]
        da_states = st["da_states"]
        key = st["key"]
        start_round = st["next_round"]
        if verbosity >= 1:
            print(f"octofit_pigeons: resumed at round {start_round + 1}")

    for rnd in range(start_round, n_rounds):
        n_sweeps = 2 ** (rnd + 1)
        rej_round = np.zeros(N - 1)
        att_round = np.zeros(N - 1)
        # per-temp moment accumulators over (sweeps x walkers) for the
        # explorer's diagonal metric
        s1 = np.zeros((N, D))
        s2 = np.zeros((N, D))
        s_count = 0
        record = rnd == n_rounds - 1

        for s in range(n_sweeps):
            key, k_sweep = jax.random.split(key)
            even = (sweep_counter % 2) == 0
            theta, accept, ll, accept_swap, idx = sweep(
                theta, k_sweep, betas, eps, sigma_diag, even
            )
            sweep_counter += 1

            # explorer step-size adaptation per temperature (not in the
            # final recording round)
            acc_np = np.asarray(accept.mean(axis=0))
            if not record:
                new_eps = []
                for i in range(N):
                    da_states[i] = da_update(
                        da_states[i], jnp.asarray(acc_np[i]), target_accept
                    )
                    new_eps.append(np.exp(float(da_states[i].log_eps)))
                eps = jnp.asarray(new_eps)
                th_np = np.asarray(theta)  # (W, N, D)
                s1 += np.swapaxes(th_np, 0, 1).sum(axis=1)
                s2 += np.swapaxes(th_np**2, 0, 1).sum(axis=1)
                s_count += W

            # swap statistics
            asw = np.asarray(accept_swap)
            active = np.zeros(N - 1, bool)
            active[(0 if even else 1)::2] = True
            att_round[active] += 1
            rej_round[active] += 1 - asw[:, active].mean(axis=0)

            # index process on host: track round trips
            idx_np = np.asarray(idx)
            labels = np.take_along_axis(labels, idx_np, axis=1)
            # replica at top going up completes half trip; count full trips
            top = labels[:, -1]
            bot = labels[:, 0]
            for w in range(W):
                if direction[w, top[w]] == 1:
                    direction[w, top[w]] = -1
                if direction[w, bot[w]] == -1:
                    direction[w, bot[w]] = 1
                    n_round_trips += 1

            if record:
                samples_final.append(np.asarray(theta[:, -1, :]))
                ll_by_temp_final.append(np.asarray(ll))

        # ---- between rounds: adapt schedule + explorer metric --------
        with np.errstate(invalid="ignore"):
            r = np.where(att_round > 0, rej_round / np.maximum(att_round, 1), 0.0)
        r = np.clip(r, 1e-4, 1 - 1e-4)
        rejection = r
        lam = np.concatenate([[0.0], np.cumsum(r)])
        barrier = lam[-1]
        if not record:
            # Syed et al. schedule update: equalize rejection across pairs
            targets = np.linspace(0, lam[-1], N)
            new_betas = np.interp(targets, lam, np.asarray(betas))
            new_betas[0], new_betas[-1] = 0.0, 1.0
            betas = jnp.asarray(np.sort(new_betas))
            # metric per temperature from (sweeps x walkers) spread
            if s_count > 4:
                mean = s1 / s_count
                var = s2 / s_count - mean**2
                var = np.clip(var, 1e-6, None)
                shrink = s_count / (s_count + 5.0)
                sigma_diag = jnp.asarray(shrink * var + 1e-3 * (1 - shrink))

        if verbosity >= 2:
            print(
                f"PT round {rnd + 1}/{n_rounds}: {n_sweeps} sweeps, "
                f"barrier {barrier:.2f}, round trips {n_round_trips}"
            )

        if checkpoint is not None and not record:
            _pt_save_checkpoint(
                checkpoint,
                dict(
                    theta=theta, betas=betas, eps=eps,
                    sigma_diag=sigma_diag, labels=labels,
                    direction=direction, n_round_trips=n_round_trips,
                    sweep_counter=sweep_counter, next_round=rnd + 1,
                    da_states=da_states, key=key,
                ),
            )

    t_total = time.perf_counter() - t_start

    # ------------------------------------------------------------------
    # stepping-stone log evidence from final-round loglikes
    # (`OctofitterPigeonsExt.jl:229-241` logevidence)
    lls = np.stack(ll_by_temp_final)          # (S, W, N)
    betas_np = np.asarray(betas)
    dbeta = betas_np[1:] - betas_np[:-1]
    log_z = 0.0
    for i in range(N - 1):
        x = dbeta[i] * lls[:, :, i].reshape(-1)
        x = x[np.isfinite(x)]
        if len(x):
            m = x.max()
            log_z += m + np.log(np.mean(np.exp(x - m)))

    # ------------------------------------------------------------------
    samples = np.stack(samples_final)            # (S, W, D)
    samples = np.swapaxes(samples, 0, 1)         # (W, S, D)
    Wn, S, _ = samples.shape
    flat_t = jnp.asarray(samples.reshape(-1, D))

    @jax.jit
    def post(flat_t):
        nat = jax.vmap(model.invlink)(flat_t)
        nts = jax.vmap(model.arr2nt)(nat)
        lp = jax.vmap(model.ln_prior_transformed)(flat_t)
        ll = jax.vmap(model.ln_like_nt)(nts)
        return nts, lp, ll

    nts, lp, ll = post(flat_t)
    cols = flatten_params_batch(nts)
    data = {
        k: np.asarray(v).reshape(Wn, S)
        for k, v in cols.items()
        if np.ndim(v) == 1
    }
    internals = {
        "logprior": np.asarray(lp).reshape(Wn, S),
        "loglike": np.asarray(ll).reshape(Wn, S),
        "logpost": np.asarray(lp + ll).reshape(Wn, S),
    }
    info = {
        "sampler": "pt_deo",
        "model_name": model.system.name,
        "logevidence": float(log_z),
        "global_barrier": float(barrier),
        "n_round_trips": int(n_round_trips),
        "betas": betas_np,
        "swap_rejection": rejection,
        "sampling_time_s": t_total,
    }
    if verbosity >= 1:
        print(
            f"octofit_pigeons: {n_rounds} rounds, barrier {barrier:.2f}, "
            f"{n_round_trips} round trips, log-evidence {log_z:.2f} "
            f"({t_total:.1f}s)"
        )
    return Chains(data, internals, info), info
