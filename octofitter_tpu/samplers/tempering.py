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


def apply_deo_swap(theta, ll, accept_swap, labels=None):
    """Apply one deterministic-even-odd swap pass to the ladder.

    accept_swap is the per-pair accept mask (W, NT-1); active pairs
    never overlap, so each rung either takes its right neighbor (its
    own pair accepted), its left neighbor (the previous pair accepted),
    or stays. Written as static-shift `jnp.roll` neighbor exchanges
    rather than a `take_along_axis` gather: on a device mesh with the
    rung axis sharded, XLA's SPMD partitioner lowers the unit rolls to
    `collective-permute` (ICI neighbor traffic — the Pigeons+MPI
    replacement planned in SURVEY §2.4; see
    `tests/test_parallel.py:test_deo_swap_lowers_to_collective_permute`)
    where a gather would require an all-gather of the full ladder.

    Returns (theta, ll, idx) with idx the applied permutation; when a
    replica-label array is passed, it is carried through the same
    neighbor exchange and (theta, ll, idx, labels) is returned — the
    on-device replacement for the former host-side label bookkeeping.
    """
    W, NT = ll.shape
    pad_f = jnp.zeros((W, 1), bool)
    swap_right = jnp.concatenate([accept_swap, pad_f], axis=1)  # pair j
    swap_left = jnp.concatenate([pad_f, accept_swap], axis=1)   # pair j-1
    right = jnp.roll(theta, -1, axis=1)
    left = jnp.roll(theta, 1, axis=1)
    theta = jnp.where(
        swap_right[:, :, None], right, jnp.where(swap_left[:, :, None], left, theta)
    )
    ll = jnp.where(
        swap_right, jnp.roll(ll, -1, axis=1),
        jnp.where(swap_left, jnp.roll(ll, 1, axis=1), ll),
    )
    base = jnp.arange(NT)[None, :]
    idx = jnp.where(swap_right, base + 1, jnp.where(swap_left, base - 1, base))
    if labels is None:
        return theta, ll, idx
    labels = jnp.where(
        swap_right, jnp.roll(labels, -1, axis=1),
        jnp.where(swap_left, jnp.roll(labels, 1, axis=1), labels),
    )
    return theta, ll, idx, labels


def _gauss_logpdf(theta_t, q_mean, q_log_std):
    z = (theta_t - q_mean) * jnp.exp(-q_log_std)
    return (
        -0.5 * jnp.sum(z * z)
        - jnp.sum(q_log_std)
        - 0.5 * theta_t.shape[-1] * jnp.log(2 * jnp.pi)
    )


def _make_annealed_vg(model):
    """value_and_grad of the per-rung annealed density, plus loglike.

    The rung density is a coefficient combination over the three
    components (ln_prior_t, ln_like, log q):
      fixed leg          (1, beta, 0)       prior ... target
      variational leg    (beta, beta, 1-beta)   target ... N(q_mean, q_std)
    which generalizes `log pi_beta = ln_prior + beta * ll` to the
    stabilized-variational-PT extended ladder (Surjanovic et al. 2022;
    the reference's GaussianReference leg, `OctofitterPigeonsExt.jl:83`).
    """

    def annealed(theta_t, coeffs, q_mean, q_log_std):
        lp_prior = model.ln_prior_transformed(theta_t)
        theta_nt = model.arr2nt(model.invlink(theta_t))
        ll = model.ln_like_nt(theta_nt)
        ll = jnp.where(jnp.isfinite(ll), ll, -jnp.inf)
        lq = _gauss_logpdf(theta_t, q_mean, q_log_std)
        # 0 * (-inf) would poison rungs whose coefficient is zero
        t0 = jnp.where(coeffs[0] != 0, coeffs[0] * lp_prior, 0.0)
        t1 = jnp.where(coeffs[1] != 0, coeffs[1] * ll, 0.0)
        t2 = jnp.where(coeffs[2] != 0, coeffs[2] * lq, 0.0)
        return t0 + t1 + t2, ll

    return jax.value_and_grad(annealed, has_aux=True)


def _host(x):
    """Device→host transfer that also works when the ladder mesh spans
    OS processes (`jax.distributed`): a non-fully-addressable array is
    all-gathered first so every process materializes the identical
    global value — the replacement for the reference's MPI-rank-local
    Pigeons state (`OctofitterPigeonsExt.jl:88-96`), where no process
    ever holds the full ladder. Single-process arrays take the plain
    `np.asarray` path unchanged."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def _rung_coeffs(betas_fix, betas_var, q_active: bool):
    """(N_tot, 3) density coefficients over (ln_prior, ll, log q)."""
    bf = np.asarray(betas_fix)
    c_fix = np.stack([np.ones_like(bf), bf, np.zeros_like(bf)], axis=-1)
    bv = np.asarray(betas_var)
    if bv.size == 0:
        return c_fix
    if q_active:
        c_var = np.stack([bv, bv, 1.0 - bv], axis=-1)
    else:
        # before the first tuning round the variational leg anneals to
        # the prior too (mirror of the fixed leg)
        c_var = np.stack([np.ones_like(bv), bv, np.zeros_like(bv)], axis=-1)
    return np.concatenate([c_fix, c_var], axis=0)


def _pt_save_checkpoint(path, state: dict):
    """Round-boundary PT checkpoint (reference: Pigeons checkpoint=true,
    `OctofitterPigeonsExt.jl:81`, `docs/src/parallel-sampling.md:14`).
    Captures every loop-carried quantity, so a resumed run is
    bit-identical to an uninterrupted one."""
    da = state["da"]  # DualAveragingState with stacked (NT,) leaves
    da_arr = np.stack(
        [_host(leaf).astype(float) for leaf in
         (da.log_eps, da.log_eps_avg, da.h_avg, da.mu, da.count)],
        axis=1,
    )
    adam = state["adam"]  # AdamState with stacked (NT,) leaves
    adam_arr = np.stack(
        [_host(leaf).astype(float) for leaf in (adam.m, adam.v, adam.t)],
        axis=1,
    )
    np.savez(
        path,
        theta=_host(state["theta"]),
        betas=np.asarray(state["betas"]),
        betas_var=np.asarray(state["betas_var"]),
        eps=np.asarray(state["eps"]),
        sigma_diag=np.asarray(state["sigma_diag"]),
        labels=_host(state["labels"]),
        direction=_host(state["direction"]),
        n_round_trips=state["n_round_trips"],
        sweep_counter=state["sweep_counter"],
        next_round=state["next_round"],
        da=da_arr,
        log_T=np.asarray(state["log_T"]),
        adam=adam_arr,
        q_mean=np.asarray(state["q_mean"]),
        q_log_std=np.asarray(state["q_log_std"]),
        q_active=bool(state["q_active"]),
        key_data=_host(jax.random.key_data(state["key"])),
    )


def _pt_load_checkpoint(path):
    from .chees import AdamState
    from .nuts import DualAveragingState

    z = np.load(path)
    da_arr = np.asarray(z["da"])  # (NT, 5)
    da = DualAveragingState(*(jnp.asarray(da_arr[:, i]) for i in range(5)))
    n_temps = da_arr.shape[0]
    if "adam" in z.files:
        adam_arr = np.asarray(z["adam"])  # (NT, 3)
        adam = AdamState(*(jnp.asarray(adam_arr[:, i]) for i in range(3)))
        log_T = jnp.asarray(z["log_T"])
    else:  # pre-ChEES-explorer checkpoint
        zero = jnp.zeros((n_temps,))
        adam = AdamState(zero, zero, zero)
        # derive the trajectory-length fallback from the checkpoint's
        # adapted per-rung step sizes, not the hard-coded initial eps
        log_T = jnp.asarray(np.log(16.0 * np.asarray(z["eps"], dtype=float)))
    n_dim = z["theta"].shape[-1]
    return dict(
        theta=jnp.asarray(z["theta"]),
        betas=jnp.asarray(z["betas"]),
        betas_var=(
            jnp.asarray(z["betas_var"]) if "betas_var" in z.files
            else jnp.zeros((0,))
        ),
        eps=jnp.asarray(z["eps"]),
        sigma_diag=jnp.asarray(z["sigma_diag"]),
        labels=z["labels"],
        direction=z["direction"],
        n_round_trips=int(z["n_round_trips"]),
        sweep_counter=int(z["sweep_counter"]),
        next_round=int(z["next_round"]),
        da=da,
        log_T=log_T,
        adam=adam,
        q_mean=(
            jnp.asarray(z["q_mean"]) if "q_mean" in z.files
            else jnp.zeros((n_dim,))
        ),
        q_log_std=(
            jnp.asarray(z["q_log_std"]) if "q_log_std" in z.files
            else jnp.zeros((n_dim,))
        ),
        q_active=bool(z["q_active"]) if "q_active" in z.files else False,
        key=jax.random.wrap_key_data(jnp.asarray(z["key_data"])),
    )


def octofit_pigeons(
    model,
    *,
    key=None,
    n_rounds: int = 10,
    n_chains: int = 16,
    n_chains_variational: int = 0,
    variational_first_tuning_round: int = 5,
    n_walkers: int = 32,
    explorer: str = "nuts",
    explorer_max_depth: int = 8,
    explorer_n_leapfrog: int = 64,
    target_accept: float = 0.8,
    verbosity: int = 1,
    checkpoint: str | None = None,
    resume: str | None = None,
    mesh=None,
):
    """Parallel-tempered sampling; returns (Chains, pt_info dict).

    Defaults mirror the reference (`OctofitterPigeonsExt.jl:76-83`):
    n_chains temperatures between prior and posterior, rounds double in
    length; `n_walkers` independent ladders run vectorized for
    throughput (TPU-native addition).

    n_chains_variational > 0 adds the stabilized-variational-PT leg
    (the reference's `GaussianReference(first_tuning_round=5)`,
    `OctofitterPigeonsExt.jl:83`; Surjanovic et al. 2022): the extended
    ladder is `prior <-> target | target <-> N(m, s)` where the
    diagonal Gaussian reference is moment-matched to the target-rung
    samples at the end of every round from
    `variational_first_tuning_round` on. The two target rungs swap
    deterministically (always accepted), so replicas round-trip
    between BOTH references — on posteriors much tighter than their
    prior this collapses the variational leg's barrier and multiplies
    the round-trip rate. Samples are recorded from both target rungs.
    Like the reference, prefer the fixed leg alone (the default) for
    multimodal posteriors where a Gaussian fit is meaningless.

    checkpoint: path; after every non-final round the full PT state is
    saved there (npz). resume: path of such a checkpoint; the run
    continues mid-schedule, bit-identical to an uninterrupted run with
    the same n_rounds.

    mesh: a `jax.sharding.Mesh` to distribute the ladder across chips:
    the first mesh axis shards the walker axis, a second axis (if
    present) shards the rung axis, with DEO swaps becoming
    collective-permute neighbor exchanges over ICI inside the jitted
    sweep. Sampling results are numerically identical to mesh=None.

    explorer: "nuts" (default; per-replica dynamic trees, best mixing
    per sweep), "chees" (per-temperature shared-trajectory ChEES-HMC:
    the walker batch at each temperature shares one Halton-jittered
    trajectory whose length is adapted per temperature by Adam ascent
    on the ChEES criterion — compile-light single-leapfrog body, the
    production choice on the axon TPU backend, and trajectory lengths
    self-tune per rung where "nuts"/"hmc" use one global bound), or
    "hmc" (jittered-trajectory HMC with explorer_n_leapfrog max
    steps). The reference uses Pigeons' gradient-free SliceSampler
    (`OctofitterPigeonsExt.jl:70-72`); gradient-based explorers mix
    faster per sweep on these posteriors.
    """
    if n_chains_variational == 1:
        # a single variational rung would be a recorded target rung
        # whose state is IID-refreshed from the reference every sweep
        # and always-accept-swapped into rung N-1, biasing the posterior
        raise ValueError(
            "n_chains_variational must be 0 or >= 2 (a 1-rung "
            "variational leg would record raw reference draws)"
        )
    if key is None:
        key = jax.random.PRNGKey(0)
    D = model.D
    W, N, Nv = n_walkers, n_chains, n_chains_variational
    NT = N + Nv  # total rungs in the (possibly extended) ladder

    annealed_vg = _make_annealed_vg(model)

    def vg_at_coeffs(coeffs, q_mean, q_log_std):
        def vg(theta):
            (val, ll), grad = annealed_vg(theta, coeffs, q_mean, q_log_std)
            return val, grad

        return vg

    # --- initial states: the model's starting points when initialized
    # (reference behavior: Pigeons.initialization draws every chain from
    # model.starting_points, `OctofitterPigeonsExt.jl:13-39`); prior
    # draws otherwise. The beta=0 rung is IID-refreshed every sweep
    # regardless.
    key, k0 = jax.random.split(key)
    pts = getattr(model, "starting_points", None)
    if pts is not None:
        pts = jnp.asarray(pts)
        idx0 = jax.random.choice(k0, pts.shape[0], (W * NT,), replace=True)
        theta = pts[idx0].reshape(W, NT, D)
    else:
        draws = model.sample_priors(k0, W * NT)
        theta = jax.vmap(model.link)(draws).reshape(W, NT, D)

    # --- mesh sharding of the (walkers, rungs) ladder ------------------
    # mesh: a jax.sharding.Mesh whose first axis shards the walker axis
    # and whose (optional) second axis shards the rung axis. The sweep
    # is one jitted SPMD program: explorer transitions are local, the
    # DEO swap's unit-shift neighbor exchanges lower to
    # collective-permute over the rung axis (ICI), replacing the
    # reference's one-process-per-chain MPI exchange
    # (`OctofitterPigeonsExt.jl:88-96`). Numerically identical to the
    # single-device ladder (tests/test_parallel.py).
    _theta_sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        axes = list(mesh.axis_names)
        w_ax = axes[0]
        r_ax = axes[1] if len(axes) > 1 else None
        if W % mesh.shape[w_ax] != 0:
            raise ValueError(
                f"n_walkers={W} not divisible by mesh axis "
                f"'{w_ax}'={mesh.shape[w_ax]}"
            )
        if r_ax is not None and NT % mesh.shape[r_ax] != 0:
            raise ValueError(
                f"total rungs {NT} not divisible by mesh axis "
                f"'{r_ax}'={mesh.shape[r_ax]}"
            )
        _theta_sharding = NamedSharding(mesh, P(w_ax, r_ax))
        theta = jax.device_put(theta, _theta_sharding)

    # per-leg annealing schedules (host side); rung order is
    # [prior ... target | target ... variational reference]
    betas_fix = np.linspace(0.0, 1.0, N)
    betas_var = np.linspace(1.0, 0.0, Nv) if Nv else np.zeros((0,))
    q_mean = jnp.zeros((D,))
    q_log_std = jnp.zeros((D,))
    q_active = False

    # per-temperature explorer adaptation state (shared across walkers);
    # the Laplace covariance from initialization seeds the explorer
    # metric when available (adapted per rung between rounds)
    eps = jnp.full((NT,), 0.05)
    ls = getattr(model, "laplace_sigma", None)
    if ls is not None:
        sd0 = jnp.clip(
            jnp.diag(jnp.asarray(ls)) if np.ndim(ls) == 2 else jnp.asarray(ls),
            1e-6, None,
        )
        sigma_diag = jnp.tile(sd0[None, :], (NT, 1))
    else:
        sigma_diag = jnp.ones((NT, D))

    # index process bookkeeping (host-side, per walker)
    labels = np.tile(np.arange(NT), (W, 1))       # replica id at each temp slot
    direction = np.zeros((W, NT), int)            # +1 going up, -1 down
    direction[:, 0] = 1
    direction[:, -1] = -1
    n_round_trips = 0

    if explorer == "chees":
        from .chees import _chees_transition

        def explorer_step(theta, key, coeffs, qm, qls, eps, sigma_diag,
                          log_T, u):
            """One shared-trajectory ChEES transition per temperature:
            the W walkers at each rung are the chain batch, sharing one
            jittered trajectory t = u * T_n."""

            ThetaT = jnp.swapaxes(theta, 0, 1)  # (NT, W, D)
            keys_n = jax.random.split(key, NT)

            def one_temp(Theta_w, key_n, c, e, lT, sd):
                vg_batch = jax.vmap(vg_at_coeffs(c, qm, qls))
                lp, grad = vg_batch(Theta_w)
                metric = metric_from_sigma(sd)
                Th, _, _, stats, g_logT = _chees_transition(
                    vg_batch, Theta_w, lp, grad, key_n, e,
                    jnp.exp(lT), u, metric, explorer_n_leapfrog,
                )
                return Th, stats.acceptance_rate, g_logT

            f = jax.vmap(one_temp, in_axes=(0, 0, 0, 0, 0, 0))
            ThetaT2, acc, g_logT = f(
                ThetaT, keys_n, coeffs, eps, log_T, sigma_diag
            )
            return jnp.swapaxes(ThetaT2, 0, 1), jnp.swapaxes(acc, 0, 1), g_logT
    else:
        if explorer == "hmc":
            from .hmc import hmc_step

            def _transition(vg, th, lp, grad, key, e, metric):
                return hmc_step(vg, th, lp, grad, key, e, metric,
                                explorer_n_leapfrog)
        else:

            def _transition(vg, th, lp, grad, key, e, metric):
                return nuts_step(vg, th, lp, grad, key, e, metric,
                                 explorer_max_depth)

        def explorer_step(theta, key, coeffs, qm, qls, eps, sigma_diag,
                          log_T, u):
            """One explorer transition per (walker, temp) on the
            annealed density."""
            del log_T, u
            keys = jax.random.split(key, (W, NT))

            def one(theta_wn, key_wn, c, e, sd):
                vg = vg_at_coeffs(c, qm, qls)
                lp, grad = vg(theta_wn)
                metric = metric_from_sigma(sd)
                th, lp2, _, stats = _transition(
                    vg, theta_wn, lp, grad, key_wn, e, metric
                )
                return th, stats.acceptance_rate

            # vmap over temps, then walkers
            f = jax.vmap(one, in_axes=(0, 0, 0, 0, 0))        # temps
            f = jax.vmap(f, in_axes=(0, 0, None, None, None))  # walkers
            th, acc = f(theta, keys, coeffs, eps, sigma_diag)
            return th, acc, jnp.zeros((NT,), theta.dtype)

    def components(theta, qm, qls):
        """Per-(walker, rung) density components (ln_prior, ll, log q)."""
        flat = theta.reshape(-1, D)
        lp = jax.vmap(model.ln_prior_transformed)(flat)
        nts = jax.vmap(lambda t: model.arr2nt(model.invlink(t)))(flat)
        ll = jax.vmap(model.ln_like_nt)(nts)
        ll = jnp.where(jnp.isnan(ll), -jnp.inf, ll)
        lq = jax.vmap(lambda t: _gauss_logpdf(t, qm, qls))(flat)
        shp = (theta.shape[0], theta.shape[1])
        return jnp.stack(
            [lp.reshape(shp), ll.reshape(shp), lq.reshape(shp)], axis=-1
        )  # (W, NT, 3)

    from .chees import _adam_step

    adam_lr = 0.025

    @jax.jit
    def sweep_step(carry, coeffs, qm, qls, sigma_diag, u, even_sweep,
                   use_q_ref, use_frozen, eps_frozen, log_T_frozen):
        """One full PT sweep with ALL loop-carried state on device.

        Explore + IID-refresh the reference rung(s) + one DEO pass,
        plus everything the host loop used to do between sweeps —
        per-rung dual-averaging/Adam adaptation, moment accumulation,
        swap statistics, and replica-label round-trip accounting. On
        the axon TPU backend the former host-side version cost ~1.6 s
        of tunnel round-trips per sweep (~80 tiny device calls); this
        single-dispatch form measures ~0.2 s/sweep and lets sweeps
        pipeline (no per-sweep host sync outside recording rounds).

        `use_frozen` selects the frozen explorer tuning recorded at the
        start of a recording round (shadow adaptation continues in the
        background so the ".final.npz" continuation state stays
        adapted). Returns (carry', ll).
        """
        key, k_sweep = jax.random.split(carry["key"])
        k_exp, k_ref, k_refq, k_swap = jax.random.split(k_sweep, 4)
        theta = carry["theta"]
        eps_used = jnp.where(use_frozen, eps_frozen,
                             jnp.exp(carry["da"].log_eps))
        log_T_used = jnp.where(use_frozen, log_T_frozen, carry["log_T"])
        theta, accept, g_logT = explorer_step(
            theta, k_exp, coeffs, qm, qls, eps_used, sigma_diag,
            log_T_used, u
        )

        # regenerate the reference chains IID: rung 0 from the prior,
        # the far end from the Gaussian reference once it is active
        prior_draws = model.sample_priors(k_ref, W)
        theta = theta.at[:, 0, :].set(jax.vmap(model.link)(prior_draws))
        if Nv:
            q_draws = qm[None, :] + jnp.exp(qls)[None, :] * jax.random.normal(
                k_refq, (W, D), theta.dtype
            )
            prior_draws2 = model.sample_priors(k_refq, W)
            far = jnp.where(
                use_q_ref, q_draws, jax.vmap(model.link)(prior_draws2)
            )
            theta = theta.at[:, NT - 1, :].set(far)

        F = components(theta, qm, qls)  # (W, NT, 3)
        ll = F[:, :, 1]

        # deterministic even/odd swap pass over the extended ladder;
        # log alpha = (c_{i+1} - c_i) . (F_i - F_{i+1})  — the
        # target|target boundary pair has dc = 0 so it always accepts
        i0 = jnp.where(even_sweep, 0, 1)
        pair_start = jnp.arange(NT - 1)
        active = (pair_start % 2) == (i0 % 2)
        dc = coeffs[1:] - coeffs[:-1]                  # (NT-1, 3)
        dF = F[:, :-1, :] - F[:, 1:, :]                # (W, NT-1, 3)
        terms = jnp.where(dc[None] != 0, dc[None] * dF, 0.0)
        log_alpha = terms.sum(-1)                      # (W, NT-1)
        u_sw = jax.random.uniform(k_swap, (W, NT - 1))
        accept_swap = active[None, :] & (jnp.log(u_sw) < log_alpha)

        theta, ll, _, labels = apply_deo_swap(
            theta, ll, accept_swap, labels=carry["labels"]
        )
        if mesh is not None:
            theta = jax.lax.with_sharding_constraint(theta, _theta_sharding)
            labels = jax.lax.with_sharding_constraint(
                labels, _theta_sharding
            )

        # --- explorer adaptation, stacked over rungs (da_update and
        # _adam_step are elementwise, so (NT,) leaves batch them) -----
        acc_mean = accept.mean(axis=0)
        da2 = da_update(carry["da"], acc_mean, target_accept)
        adam2 = carry["adam"]
        new_log_T = carry["log_T"]
        if explorer == "chees":
            adam2, dlt = _adam_step(carry["adam"], g_logT, adam_lr)
            le = da2.log_eps
            new_log_T = jnp.clip(
                carry["log_T"] + dlt,
                le, le + jnp.log(float(explorer_n_leapfrog)),
            )

        # --- per-round accumulators ----------------------------------
        s1 = carry["s1"] + jnp.sum(theta, axis=0)            # (NT, D)
        s2 = carry["s2"] + jnp.sum(theta * theta, axis=0)
        active_f = active.astype(s1.dtype)
        att = carry["att"] + active_f
        rej = carry["rej"] + active_f * (
            1.0 - jnp.mean(accept_swap.astype(s1.dtype), axis=0)
        )

        # --- index process: round-trip accounting (direction indexed
        # by replica id; a replica completes a trip when it returns to
        # the bottom rung while marked descending) --------------------
        direction = carry["direction"]
        rungs = jnp.arange(NT)[None, :]
        at_top = labels[:, -1:] == rungs                     # (W, NT)
        direction = jnp.where(at_top & (direction == 1), -1, direction)
        at_bot = labels[:, 0:1] == rungs
        completed = at_bot & (direction == -1)
        trips = carry["trips"] + jnp.sum(completed)
        direction = jnp.where(completed, 1, direction)

        carry = dict(
            theta=theta, key=key, da=da2, adam=adam2, log_T=new_log_T,
            labels=labels, direction=direction, trips=trips,
            s1=s1, s2=s2, att=att, rej=rej,
        )
        return carry, ll

    # ------------------------------------------------------------------
    t_start = time.perf_counter()
    from .chees import AdamState, halton_sequence

    da = da_init(jnp.asarray(eps))  # stacked (NT,) leaves
    adam = AdamState(*(jnp.zeros((NT,), theta.dtype) for _ in range(3)))
    log_T = jnp.full(
        (NT,), float(np.log(16.0 * np.asarray(eps)[0])), theta.dtype
    )
    # Halton jitter for the shared trajectory, indexed by the global
    # sweep counter so a resumed run is bit-identical
    halton = halton_sequence(2 ** (n_rounds + 1))
    samples_final = []
    ll_by_temp_final = []
    rejection = np.zeros(NT - 1)
    barrier = None
    barrier_var = None
    sweep_counter = 0
    start_round = 0
    n_round_trips = 0

    if resume is not None:
        st = _pt_load_checkpoint(resume)
        if st["theta"].shape != (W, NT, D):
            raise ValueError(
                f"checkpoint shape {st['theta'].shape} does not match "
                f"(n_walkers={W}, n_rungs={NT}, D={D})"
            )
        theta = st["theta"]
        if _theta_sharding is not None:
            theta = jax.device_put(theta, _theta_sharding)
        betas_fix = np.asarray(st["betas"])
        betas_var = np.asarray(st["betas_var"])
        sigma_diag = st["sigma_diag"]
        labels = st["labels"]
        direction = st["direction"]
        n_round_trips = st["n_round_trips"]
        sweep_counter = st["sweep_counter"]
        da = st["da"]
        log_T = jnp.asarray(st["log_T"], theta.dtype)
        adam = st["adam"]
        q_mean = st["q_mean"]
        q_log_std = st["q_log_std"]
        q_active = st["q_active"]
        key = st["key"]
        start_round = st["next_round"]
        if start_round >= n_rounds:
            raise ValueError(
                f"checkpoint has already completed {start_round} rounds; "
                f"pass n_rounds > {start_round} to escalate the run"
            )
        if verbosity >= 1:
            print(f"octofit_pigeons: resumed at round {start_round + 1}")

    # all loop-carried sweep state lives on device (see sweep_step)
    carry = dict(
        theta=theta, key=key, da=da, adam=adam, log_T=log_T,
        labels=jnp.asarray(np.asarray(labels), jnp.int32),
        direction=jnp.asarray(np.asarray(direction), jnp.int32),
        trips=jnp.asarray(int(n_round_trips), jnp.int32),
        s1=jnp.zeros((NT, D), theta.dtype),
        s2=jnp.zeros((NT, D), theta.dtype),
        att=jnp.zeros((NT - 1,), theta.dtype),
        rej=jnp.zeros((NT - 1,), theta.dtype),
    )
    if _theta_sharding is not None:
        carry["labels"] = jax.device_put(carry["labels"], _theta_sharding)
        carry["direction"] = jax.device_put(
            carry["direction"], _theta_sharding
        )

    log_T_record = carry["log_T"]
    for rnd in range(start_round, n_rounds):
        n_sweeps = 2 ** (rnd + 1)
        record = rnd == n_rounds - 1
        coeffs = jnp.asarray(_rung_coeffs(betas_fix, betas_var, q_active))
        # reset the per-round accumulators (moments for the explorer
        # metric, swap attempt/rejection counts)
        carry["s1"] = jnp.zeros((NT, D), theta.dtype)
        carry["s2"] = jnp.zeros((NT, D), theta.dtype)
        carry["att"] = jnp.zeros((NT - 1,), theta.dtype)
        carry["rej"] = jnp.zeros((NT - 1,), theta.dtype)
        # In the recording round the explorer runs with FROZEN tuning
        # (recorded samples must come from a fixed kernel) while the
        # adaptation state continues updating in the background, so the
        # "<checkpoint>.final.npz" continuation file is adapted through
        # the record round too — escalating a finished run (bench
        # partial-arc stage 2) then matches a straight longer run's
        # adaptation budget instead of losing the last round's.
        eps_frozen = jnp.exp(carry["da"].log_eps)
        log_T_frozen = carry["log_T"]
        use_frozen = jnp.asarray(record)
        if record:
            # the tuning the recorded samples are actually drawn with
            # (carry["log_T"] keeps shadow-adapting past this point)
            log_T_record = log_T_frozen

        for s in range(n_sweeps):
            even = (sweep_counter % 2) == 0
            u = jnp.asarray(halton[sweep_counter % len(halton)], theta.dtype)
            carry, ll = sweep_step(
                carry, coeffs, q_mean, q_log_std, sigma_diag, u,
                jnp.asarray(even), jnp.asarray(q_active),
                use_frozen, eps_frozen, log_T_frozen,
            )
            sweep_counter += 1

            if record:
                # target rung(s): fixed-leg target at N-1, plus the
                # variational leg's target at N when present
                th = carry["theta"]
                if Nv:
                    samples_final.append(
                        np.concatenate(
                            [_host(th[:, N - 1, :]),
                             _host(th[:, N, :])], axis=0
                        )
                    )
                else:
                    samples_final.append(_host(th[:, N - 1, :]))
                ll_by_temp_final.append(_host(ll))

        # ---- between rounds: pull the round's accumulators once, then
        # adapt schedule + explorer metric on host ---------------------
        s1 = _host(carry["s1"])
        s2 = _host(carry["s2"])
        att_round = _host(carry["att"])
        rej_round = _host(carry["rej"])
        s_count = n_sweeps * W
        with np.errstate(invalid="ignore"):
            r = np.where(att_round > 0, rej_round / np.maximum(att_round, 1), 0.0)
        r = np.clip(r, 1e-4, 1 - 1e-4)
        rejection = r
        # per-leg communication barriers (the boundary pair N-1 is the
        # deterministic target|target swap and belongs to neither leg)
        r_fix = r[: N - 1]
        lam = np.concatenate([[0.0], np.cumsum(r_fix)])
        barrier = lam[-1]
        if Nv:
            r_var = r[N:]
            lam_v = np.concatenate([[0.0], np.cumsum(r_var)])
            barrier_var = lam_v[-1]
        if record:
            # the schedule the recording round actually sampled with —
            # reported in info and used by the evidence estimator
            betas_report = np.asarray(betas_fix).copy()
            betas_var_report = np.asarray(betas_var).copy()
        # Syed et al. schedule update per leg: equalize rejection.
        # Runs after the record round too: it only affects the
        # "<checkpoint>.final.npz" continuation state (escalation
        # resumes then match a straight longer run's adaptation).
        targets = np.linspace(0, lam[-1], N)
        new_b = np.interp(targets, lam, betas_fix)
        new_b[0], new_b[-1] = 0.0, 1.0
        betas_fix = np.sort(new_b)
        if Nv:
            # var leg runs beta 1 -> 0; adapt in ascending coords
            asc = betas_var[::-1]  # 0 -> 1 toward the target
            lam_asc = np.concatenate([[0.0], np.cumsum(r_var[::-1])])
            targets_v = np.linspace(0, lam_asc[-1], Nv)
            new_v = np.interp(targets_v, lam_asc, asc)
            new_v[0], new_v[-1] = 0.0, 1.0
            betas_var = np.sort(new_v)[::-1].copy()
        # metric per temperature from (sweeps x walkers) spread
        if s_count > 4:
            with np.errstate(invalid="ignore", over="ignore"):
                mean = s1 / s_count
                var = s2 / s_count - mean**2
            # extreme unconstrained prior draws on the reference
            # rung can overflow the moment accumulators; fall back
            # to a unit-ish metric there instead of poisoning the
            # explorer with NaN scales
            var = np.nan_to_num(var, nan=1.0, posinf=1e6, neginf=1.0)
            var = np.clip(var, 1e-6, None)
            shrink = s_count / (s_count + 5.0)
            sigma_diag = jnp.asarray(shrink * var + 1e-3 * (1 - shrink))
        # moment-match the Gaussian reference to the target rung(s)
        # (GaussianReference first_tuning_round semantics)
        if Nv and rnd + 1 >= variational_first_tuning_round and s_count > 4:
            rows = [N - 1, N]
            m = (s1[rows].sum(0)) / (len(rows) * s_count)
            v = (s2[rows].sum(0)) / (len(rows) * s_count) - m**2
            v = np.clip(v, 1e-8, None)
            q_mean = jnp.asarray(m)
            q_log_std = jnp.asarray(0.5 * np.log(v))
            q_active = True

        if verbosity >= 2:
            extra = f", var barrier {barrier_var:.2f}" if Nv and barrier_var is not None else ""
            print(
                f"PT round {rnd + 1}/{n_rounds}: {n_sweeps} sweeps, "
                f"barrier {barrier:.2f}{extra}, "
                f"round trips {int(_host(carry['trips']))}"
            )

        # Interruption checkpoints are saved after every ADAPTING round:
        # resuming one replays the remaining schedule bit-identically
        # (test_checkpoint.py). The state after the final recording
        # round (which performs no adaptation) goes to a separate
        # "<checkpoint>.final.npz" continuation file — resume from it
        # with a larger n_rounds to ESCALATE a finished run with one
        # more (twice-as-long) recording round without redoing any
        # sweeps; the bench's partial-arc stage-2 path uses this.
        if checkpoint is not None:
            _pt_save_checkpoint(
                checkpoint + ".final.npz" if record else checkpoint,
                dict(
                    theta=carry["theta"], betas=betas_fix,
                    betas_var=betas_var,
                    eps=np.exp(_host(carry["da"].log_eps)),
                    sigma_diag=sigma_diag,
                    labels=carry["labels"],
                    direction=carry["direction"],
                    n_round_trips=int(_host(carry["trips"])),
                    sweep_counter=sweep_counter, next_round=rnd + 1,
                    da=carry["da"], log_T=_host(carry["log_T"]),
                    adam=carry["adam"], q_mean=q_mean,
                    q_log_std=q_log_std, q_active=q_active,
                    key=carry["key"],
                ),
            )

    t_total = time.perf_counter() - t_start

    # ------------------------------------------------------------------
    # stepping-stone log evidence from final-round loglikes on the
    # FIXED (prior-referenced) leg — the variational leg's reference is
    # not normalized against the prior
    # (`OctofitterPigeonsExt.jl:229-241` logevidence)
    lls = np.stack(ll_by_temp_final)          # (S, W, NT)
    betas_np = betas_report
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
    n_round_trips = int(_host(carry["trips"]))
    info = {
        "sampler": "pt_deo",
        "explorer": explorer,
        "trajectory_length": np.exp(_host(log_T_record)),
        "model_name": model.system.name,
        "logevidence": float(log_z),
        "global_barrier": float(barrier),
        "n_round_trips": n_round_trips,
        "betas": betas_np,
        "swap_rejection": rejection,
        "sampling_time_s": t_total,
    }
    if Nv:
        info["betas_variational"] = betas_var_report
        info["global_barrier_variational"] = (
            float(barrier_var) if barrier_var is not None else np.nan
        )
        info["variational_mean"] = np.asarray(q_mean)
        info["variational_std"] = np.exp(np.asarray(q_log_std))
    if verbosity >= 1:
        print(
            f"octofit_pigeons: {n_rounds} rounds, barrier {barrier:.2f}, "
            f"{n_round_trips} round trips, log-evidence {log_z:.2f} "
            f"({t_total:.1f}s)"
        )
    return Chains(data, internals, info), info
