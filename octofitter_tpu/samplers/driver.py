"""High-level sampling entry points.

`octofit` is the TPU-native equivalent of the reference's NUTS driver
(`/root/reference/src/sampling.jl:140,317-528`): initialization from a
vectorized prior search, window-adapted vectorized NUTS across a chain
axis, a post-run sampling report, and repackaging of draws (with all
derived quantities) into a named `Chains` object.

`octofit_rejection` mirrors `sampling.jl:168-279`: IID prior draws
accepted with probability exp(ll - max_ll) — trivially one vmapped
device call here.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ..chains import Chains, flatten_params_batch
from ..model.logdensity import LogDensityModel
from .nuts import run_nuts


def _repackage(model: LogDensityModel, samples_t, lps, stats, info, t_sampling,
               sampler="nuts"):
    """Transformed draws -> named Chains with derived quantities.

    Equivalent of the reference's invlink -> arr2nt -> result2mcmcchain
    repackaging (`sampling.jl:465-527`)."""
    n_chains, n_draws, D = samples_t.shape
    flat_t = samples_t.reshape(-1, D)
    has_disc = bool(getattr(model, "discrete_names", []))

    if has_disc and getattr(model, "discrete_mode", None) == "gibbs":
        # Gibbs mode: the sampler already carried the discrete values
        disc_flat = jnp.asarray(info["disc_samples"]).reshape(
            flat_t.shape[0], -1
        )

        @jax.jit
        def postprocess(flat_t, disc_flat):
            nat = jax.vmap(model.invlink)(flat_t)
            nts = jax.vmap(model.arr2nt)(nat, disc_flat)
            lprior = jax.vmap(model.ln_prior_transformed)(flat_t)
            return nts, lprior

        nts, lprior = postprocess(flat_t, disc_flat)
    elif has_disc:
        # recover the marginalized discrete variables per draw by
        # sampling their conditional given the continuous state
        keys = jax.random.split(jax.random.PRNGKey(0), flat_t.shape[0])

        @jax.jit
        def postprocess(flat_t, keys):
            def one(t, k):
                logits = model.discrete_conditional_logits(t)
                i = jax.random.categorical(k, logits)
                return model._disc_combos[i]

            disc = jax.vmap(one)(flat_t, keys)
            nat = jax.vmap(model.invlink)(flat_t)
            nts = jax.vmap(model.arr2nt)(nat, disc)
            lprior = jax.vmap(model.ln_prior_transformed)(flat_t)
            return nts, lprior, disc

        nts, lprior, disc_draws = postprocess(flat_t, keys)
    else:

        @jax.jit
        def postprocess(flat_t):
            nat = jax.vmap(model.invlink)(flat_t)
            nts = jax.vmap(model.arr2nt)(nat)
            lprior = jax.vmap(model.ln_prior_transformed)(flat_t)
            return nts, lprior

        nts, lprior = postprocess(flat_t)
    cols = flatten_params_batch(nts)
    data = {}
    for k, v in cols.items():
        v = np.asarray(v)
        if v.ndim == 1:
            data[k] = v.reshape(n_chains, n_draws)
        else:
            # vector obs/model variables expand to _1, _2, ... columns
            # per the reference naming contract (`sampling.jl:908-981`)
            flat2 = v.reshape(n_chains, n_draws, -1)
            for j in range(flat2.shape[-1]):
                data[f"{k}_{j + 1}"] = flat2[..., j]
    lps_np = np.asarray(lps)
    lprior_np = np.asarray(lprior).reshape(n_chains, n_draws)
    internals = {
        "logpost": lps_np,
        "logprior": lprior_np,
        "loglike": lps_np - lprior_np,
        "acceptance_rate": np.asarray(stats.acceptance_rate),
        "is_divergent": np.asarray(stats.is_divergent),
        "tree_depth": np.asarray(stats.tree_depth),
        "n_steps": np.asarray(stats.n_steps),
        "energy": np.asarray(stats.energy),
        "step_size": np.asarray(stats.step_size),
    }
    import datetime

    chain_info = {
        "sampler": f"{sampler}_vectorized",
        "model_name": model.system.name,
        "stop_time": datetime.datetime.now().isoformat(timespec="seconds"),
        "step_size": np.asarray(info["step_size"]),
        "sigma": np.asarray(info["sigma"]),
        "sampling_time_s": t_sampling,
        "parameter_names": model.parameter_names,
    }
    return Chains(data, internals, chain_info)


def _initial_sigma_from_points(points, metric):
    """Dense metric seeded from the starting-point covariance, with the
    reference's diagonal-jitter retry ladder (`sampling.jl:336-363`)."""
    pts = np.asarray(points)
    if metric == "diag":
        v = pts.var(axis=0)
        return np.where(v > 1e-12, v, 1.0)
    if len(pts) < pts.shape[1] + 2:
        return np.eye(pts.shape[1])
    cov = np.cov(pts.T)
    d = pts.shape[1]
    for jitter in [0.0, 1e-8, 1e-6, 1e-4, 1e-2, 1.0]:
        trial = cov + jitter * np.eye(d)
        try:
            np.linalg.cholesky(trial)
            return trial
        except np.linalg.LinAlgError:
            continue
    return np.eye(d)


def octofit(
    model: LogDensityModel,
    target_accept: float | None = None,
    *,
    key=None,
    chains: int | None = None,
    adaptation: int | None = None,
    iterations: int | None = None,
    max_depth: int | None = None,
    verbosity: int | None = None,
    starting_points=None,
    metric: str = "dense",
    sampler: str | None = None,
    profile_dir: str | None = None,
    step_size: float | None = None,
    drop_warmup: bool = True,
):
    """Sample the posterior with a vectorized transition (ChEES default).

    Defaults mirror the reference (`sampling.jl:317-325`):
    adaptation=1000, iterations=1000, max_depth=12, target_accept=0.8,
    dense metric seeded from the starting-point covariance — but
    `chains` may be thousands on a TPU chip. Unset arguments resolve
    from the typed config (OCTOFITTER_* env overrides; config.py).
    profile_dir: capture a JAX profiler trace of the run there.
    step_size: manual initial step size (reference `sampling.jl:133`);
    skips the automatic search, adaptation still refines it.
    drop_warmup: when False, adaptation draws are kept at the start of
    the chain (reference `sampling.jl:129`); chees/nuts/hmc only.
    """
    from ..config import get_config

    cfg = get_config()
    target_accept = cfg.target_accept if target_accept is None else target_accept
    chains = cfg.chains if chains is None else chains
    adaptation = cfg.adaptation if adaptation is None else adaptation
    iterations = cfg.iterations if iterations is None else iterations
    max_depth = cfg.max_depth if max_depth is None else max_depth
    verbosity = cfg.verbosity if verbosity is None else verbosity
    sampler = cfg.sampler if sampler is None else sampler
    profile_dir = (cfg.profile_dir or None) if profile_dir is None else profile_dir
    if profile_dir:
        from ..utils import profile_trace

        with profile_trace(profile_dir):
            return octofit(
                model, target_accept, key=key, chains=chains,
                adaptation=adaptation, iterations=iterations,
                max_depth=max_depth, verbosity=verbosity,
                starting_points=starting_points, metric=metric,
                sampler=sampler, profile_dir="",
                step_size=step_size, drop_warmup=drop_warmup,
            )
    if key is None:
        key = jax.random.PRNGKey(0)
    k_init, k_run = jax.random.split(key)

    vg = jax.value_and_grad(model._ln_post_py)

    if starting_points is not None:
        theta0 = jnp.asarray(starting_points)
        if theta0.ndim == 1:
            theta0 = jnp.tile(theta0[None, :], (chains, 1))
        initial_sigma = _initial_sigma_from_points(theta0, metric)
    else:
        if model.starting_points is None:
            # full initialization pipeline (`initialization.jl:184`):
            # prior search -> multistart optimization -> Laplace draws
            model.initialize(k_init, verbosity=verbosity)
        pts = np.asarray(model.starting_points)
        idx = np.asarray(
            jax.random.choice(
                jax.random.split(k_init, 1)[0],
                len(pts),
                (chains,),
                replace=True,
            )
        )
        theta0 = jnp.asarray(pts[idx])
        if model.laplace_sigma is not None and metric == "dense":
            initial_sigma = model.laplace_sigma
        else:
            initial_sigma = _initial_sigma_from_points(pts, metric)

    t0 = time.perf_counter()
    if getattr(model, "discrete_mode", None) == "gibbs" and sampler != "gibbs":
        sampler = "gibbs"
        if verbosity >= 1:
            print(
                "octofit: large discrete domain detected -> "
                "Gibbs-within-HMC sampler"
            )
    if sampler == "gibbs":
        from .gibbs import run_gibbs

        if not drop_warmup or step_size is not None:
            raise ValueError(
                "drop_warmup=False / step_size= are not supported by the "
                "Gibbs-within-HMC sampler (used for large discrete "
                "domains); use the default adaptation instead"
            )
        samples, lps, stats, info = run_gibbs(
            model,
            theta0,
            k_run,
            n_warmup=adaptation,
            n_samples=iterations,
            target_accept=target_accept,
            metric=metric,
            initial_sigma=initial_sigma,
        )
    elif sampler == "chees":
        from .chees import run_chees

        samples, lps, stats, info = run_chees(
            vg,
            theta0,
            k_run,
            n_warmup=adaptation,
            n_samples=iterations,
            target_accept=target_accept,
            metric=metric,
            initial_sigma=initial_sigma,
            # ChEES trajectories are capped harder than a NUTS tree:
            # on plateau posteriors the adapted length can otherwise
            # run to 2**max_depth leapfrogs per step
            max_leapfrog=min(2**max_depth, 1024),
            drop_warmup=drop_warmup,
            **({} if step_size is None else
               {"initial_step_size": step_size}),
        )
    else:
        # known TPU-backend cliff: the iterative-NUTS program (nested
        # while loops) kernel-faults on the axon backend above roughly
        # 1024 chains x tree depth 10 (PARITY.md "Known gaps"). Warn
        # before launching a shape in that envelope; ChEES (the
        # default) is unaffected and faster.
        try:
            platform = jax.devices()[0].platform
        except Exception:  # backend init failure: let run_nuts surface it
            platform = ""
        if (
            platform not in ("cpu", "gpu", "")
            and chains * (2 ** max_depth) > 1024 * (2 ** 10)
            and verbosity >= 0
        ):
            print(
                f"octofit warning: sampler='nuts' with {chains} chains x "
                f"max_depth {max_depth} exceeds the known-stable envelope "
                "on the TPU backend (~1024 chains x depth 10); the axon "
                "runtime has kernel-faulted on larger NUTS programs. "
                "Consider sampler='chees' (default, faster here) or "
                "fewer chains / lower max_depth."
            )
        samples, lps, stats, info = run_nuts(
            vg,
            theta0,
            k_run,
            n_warmup=adaptation,
            n_samples=iterations,
            max_depth=max_depth,
            target_accept=target_accept,
            metric=metric,
            initial_sigma=initial_sigma,
            sampler=sampler,
            initial_step_size=step_size,
            drop_warmup=drop_warmup,
        )
    jax.block_until_ready(samples)
    t_sampling = time.perf_counter() - t0

    if verbosity >= 1:
        n_total_steps = int(np.asarray(stats.n_steps).sum())
        n_div = int(np.asarray(stats.is_divergent).sum())
        n_draws_total = chains * iterations
        mean_accept = float(np.asarray(stats.acceptance_rate).mean())
        mean_depth = float(np.asarray(stats.tree_depth).mean())
        us_per_step = t_sampling / max(n_total_steps, 1) * 1e6
        print(
            f"octofit sampling report: {chains} chains x {iterations} draws "
            f"in {t_sampling:.2f}s\n"
            f"  mean acceptance          {mean_accept:.3f}\n"
            f"  divergences              {n_div} "
            f"({100 * n_div / n_draws_total:.2f}%)\n"
            f"  mean tree depth          {mean_depth:.2f}\n"
            f"  total leapfrog steps     {n_total_steps}\n"
            f"  time per gradient eval   {us_per_step:.2f} us"
        )

    return _repackage(model, samples, lps, stats, info, t_sampling, sampler)


def octofit_rejection(
    model: LogDensityModel,
    *,
    key=None,
    num_samples: int = 10_000,
    batch_size: int = 100_000,
    max_batches: int = 100,
    verbosity: int = 1,
):
    """Rejection sampling from the prior (`sampling.jl:168-279`).

    Draw IID prior batches on device; each draw is accepted with
    probability exp(ll - max_ll) against the GLOBAL maximum likelihood,
    exactly as the reference does with its single pre-evaluated batch:
    every batch keeps the superset accepted under the running maximum
    (which only grows, so acceptance probabilities only shrink) along
    with each draw's uniform variate, and the final accept re-filters
    all retained candidates under the final max_ll — so the result is
    distributionally identical to a single giant batch.
    Pairs with `ofti_linear_solve` for OFTI-style workflows.
    """
    if key is None:
        key = jax.random.PRNGKey(0)

    @jax.jit
    def batch_lls(k):
        draws = model.sample_priors(k, batch_size)
        nts = jax.vmap(model.arr2nt)(draws)
        lls = jax.vmap(model.ln_like_nt)(nts)
        return draws, jnp.where(jnp.isnan(lls), -jnp.inf, lls)

    cand_draws, cand_ll, cand_u = [], [], []
    max_ll = -np.inf
    total_drawn = 0
    n_acc = 0
    for i in range(max_batches):
        key, k_batch, k_acc = jax.random.split(key, 3)
        draws, lls = batch_lls(k_batch)
        lls_np = np.asarray(lls)
        u = np.asarray(jax.random.uniform(k_acc, (batch_size,)))
        prev_max_ll = max_ll
        if np.isfinite(lls_np).any():
            max_ll = max(max_ll, float(lls_np[np.isfinite(lls_np)].max()))
        with np.errstate(over="ignore"):
            keep = u < np.exp(lls_np - max_ll)
        cand_draws.append(np.asarray(draws)[keep])
        cand_ll.append(lls_np[keep])
        cand_u.append(u[keep])
        total_drawn += batch_size
        # exact acceptance count under the current global max. A higher
        # max only shrinks earlier candidates' acceptance, so the full
        # recount is needed ONLY when max_ll moved; otherwise count just
        # this batch's kept candidates (already filtered under max_ll).
        with np.errstate(over="ignore"):
            if max_ll > prev_max_ll:
                n_acc = sum(
                    int(np.sum(uc < np.exp(lc - max_ll)))
                    for uc, lc in zip(cand_u, cand_ll)
                )
            else:
                n_acc += int(keep.sum())
        if verbosity >= 2:
            print(
                f"octofit_rejection: batch {i + 1}, accepted {n_acc}"
                f"/{total_drawn}"
            )
        if n_acc >= num_samples:
            break

    if not np.isfinite(max_ll):
        raise RuntimeError(
            "all prior samples produced non-finite log-likelihoods"
        )
    draws_all = np.concatenate(cand_draws)
    ll_all = np.concatenate(cand_ll)
    u_all = np.concatenate(cand_u)
    with np.errstate(over="ignore"):
        final = u_all < np.exp(ll_all - max_ll)
    draws_nat = draws_all[final][:num_samples]
    ll_acc = ll_all[final][:num_samples]
    if len(draws_nat) == 0:
        raise RuntimeError("rejection sampling accepted zero draws")
    if len(draws_nat) / total_drawn < 1e-3 and verbosity >= 1:
        print(
            "octofit_rejection: very low acceptance rate "
            f"({100 * len(draws_nat) / total_drawn:.3g}%); consider "
            "octofit (HMC) instead"
        )

    nts = jax.vmap(model.arr2nt)(jnp.asarray(draws_nat))
    cols = flatten_params_batch(nts)
    data = {}
    for k, v in cols.items():
        v = np.asarray(v)
        if v.ndim == 1:
            data[k] = v[None, :]
        else:
            flat2 = v.reshape(v.shape[0], -1)
            for j in range(flat2.shape[-1]):
                data[f"{k}_{j + 1}"] = flat2[None, :, j]
    lp = np.asarray(
        jax.vmap(model.ln_prior_transformed)(
            jax.vmap(model.link)(jnp.asarray(draws_nat))
        )
    )
    internals = {
        "loglike": ll_acc[None, :],
        "logpost": (ll_acc + lp)[None, :],
    }
    info = {
        "sampler": "rejection",
        "model_name": model.system.name,
        "acceptance_fraction": len(draws_nat) / total_drawn,
    }
    return Chains(data, internals, info)
