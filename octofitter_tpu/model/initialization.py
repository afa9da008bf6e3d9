"""Model initialization: starting points and posterior mode finding.

TPU-native equivalent of `/root/reference/src/initialization.jl`:
the reference pipeline is threaded-prior-search -> BBO global
optimization -> multi-path Pathfinder draws (`initialization.jl:654-990`).
Here each stage is a vectorized device computation:

  1. vmapped prior search (tens of thousands of IID draws scored in one
     call) — replaces the threaded loop at `initialization.jl:14-66`;
  2. vmapped multistart Adam ascent in unconstrained space — replaces
     BBO_adaptive_de_rand_1_bin (`initialization.jl:763-772`);
  3. host-side L-BFGS polish of the best candidate (exact jitted
     gradients);
  4. a Laplace approximation at the mode: draws from N(mode, H^{-1})
     serve as starting points and H^{-1} seeds the dense NUTS metric —
     replacing multipathfinder draws (`initialization.jl:867-958`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax


def initialize(
    model,
    key=None,
    *,
    guess: dict | None = None,
    n_prior_samples: int | None = None,
    n_multistart: int | None = None,
    n_opt_steps: int | None = None,
    n_draws: int | None = None,
    verbosity: int = 1,
):
    """Find the posterior mode and populate `model.starting_points`.

    Unset sizes resolve from the typed config (OCTOFITTER_INIT_* env
    overrides) — lower them for cheap CPU runs, raise for hard
    multimodal posteriors.

    guess: optional {flat_parameter_name: natural-space value} of
    starting guesses (the reference's `initialize!(model, nt)`,
    `initialization.jl:184,344`) — every multistart point is pinned to
    the guessed values before optimization (unspecified parameters
    still vary), steering the mode search to a known solution on
    multimodal posteriors. Names follow `model.parameter_names`
    (e.g. "plx", "b_a", "GaiaRV_offset").

    Returns the mode (unconstrained space). Sets `model.starting_points`
    (array [n, D], unconstrained) and `model.laplace_sigma` ([D, D]).
    """
    from ..config import get_config

    cfg = get_config()
    n_prior_samples = cfg.init_prior_samples if n_prior_samples is None else n_prior_samples
    n_multistart = cfg.init_multistart if n_multistart is None else n_multistart
    n_opt_steps = cfg.init_opt_steps if n_opt_steps is None else n_opt_steps
    n_draws = cfg.init_draws if n_draws is None else n_draws
    if key is None:
        key = jax.random.PRNGKey(0)
    k_search, k_rand, k_draws = jax.random.split(key, 3)

    # ---- stage 1: vectorized prior search -----------------------------
    n_top = min(n_multistart // 2, 4096)
    top_pts, top_lps = model.prior_search(k_search, n_prior_samples, n_top)
    rand_draws = model.sample_priors(k_rand, n_multistart - n_top)
    rand_pts = jax.vmap(model.link)(rand_draws)
    starts = jnp.concatenate([top_pts, rand_pts], axis=0)
    if guess:
        names = list(model.parameter_names)
        unknown = [k for k in guess if k not in names]
        if unknown:
            raise KeyError(
                f"unknown guess parameter(s) {unknown}; valid names: {names}"
            )
        g_idx = jnp.asarray([names.index(k) for k in guess])
        g_val = jnp.asarray([float(v) for v in guess.values()])

        def apply_guess(theta_t):
            nat = model.invlink(theta_t).at[g_idx].set(g_val)
            return model.link(nat)

        starts = jax.vmap(apply_guess)(starts)
    if verbosity >= 2:
        print(
            f"initialize: prior search best logpost {float(top_lps[0]):.2f}"
        )

    # ---- stage 2: vmapped multistart Adam ascent ----------------------
    schedule = optax.cosine_decay_schedule(0.1, n_opt_steps, alpha=0.01)
    opt = optax.adam(schedule)
    neg = lambda th: -model._ln_post_py(th)
    vg = jax.value_and_grad(neg)

    @jax.jit
    def optimize_batch(starts):
        def one(theta0):
            state0 = opt.init(theta0)

            def step(carry, _):
                theta, state, best_theta, best_lp = carry
                loss, g = vg(theta)
                g = jnp.where(jnp.isfinite(g), g, 0.0)
                updates, state = opt.update(g, state, theta)
                theta_new = optax.apply_updates(theta, updates)
                theta_new = jnp.where(
                    jnp.isfinite(theta_new), theta_new, theta
                )
                lp = -loss
                better = jnp.isfinite(lp) & (lp > best_lp)
                best_theta = jnp.where(better, theta, best_theta)
                best_lp = jnp.where(better, lp, best_lp)
                return (theta_new, state, best_theta, best_lp), None

            init = (theta0, state0, theta0, jnp.asarray(-jnp.inf))
            (theta, _, best_theta, best_lp), _ = jax.lax.scan(
                step, init, None, length=n_opt_steps
            )
            return best_theta, best_lp

        return jax.vmap(one)(starts)

    cand_pts, cand_lps = optimize_batch(starts)
    cand_lps = jnp.where(jnp.isnan(cand_lps), -jnp.inf, cand_lps)
    best_i = int(jnp.argmax(cand_lps))
    theta_star = np.asarray(cand_pts[best_i], dtype=np.float64)
    if verbosity >= 2:
        print(f"initialize: multistart best logpost {float(cand_lps[best_i]):.2f}")

    # ---- stage 3: host-side L-BFGS polish -----------------------------
    from scipy.optimize import minimize

    f = jax.jit(jax.value_and_grad(neg))

    def fun(x):
        v, g = f(jnp.asarray(x))
        v, g = float(v), np.asarray(g, dtype=np.float64)
        if not np.isfinite(v):
            return 1e100, np.zeros_like(g)
        return v, np.where(np.isfinite(g), g, 0.0)

    res = minimize(fun, theta_star, jac=True, method="L-BFGS-B",
                   options=dict(maxiter=500))
    if np.isfinite(res.fun) and -res.fun >= float(cand_lps[best_i]):
        theta_star = res.x
    lp_star = float(model.ln_post(jnp.asarray(theta_star)))
    if verbosity >= 1:
        print(f"initialize: mode logpost {lp_star:.2f}")

    # ---- stage 4: Laplace approximation -------------------------------
    H = np.asarray(
        jax.jit(jax.hessian(neg))(jnp.asarray(theta_star)), dtype=np.float64
    )
    H = 0.5 * (H + H.T)
    # regularize: clip eigenvalues to be positive
    evals, evecs = np.linalg.eigh(H)
    floor = max(1e-8, np.abs(evals).max() * 1e-10)
    evals = np.clip(evals, floor, None)
    sigma = (evecs / evals) @ evecs.T  # H^{-1}
    L = evecs @ np.diag(1.0 / np.sqrt(evals))

    z = np.asarray(jax.random.normal(k_draws, (4 * n_draws, len(theta_star))))
    draws = theta_star[None, :] + z @ L.T
    lps = np.asarray(jax.jit(jax.vmap(model._ln_post_py))(jnp.asarray(draws)))
    good = np.isfinite(lps) & (lps > lp_star - 200.0)
    draws = draws[good][:n_draws]
    if len(draws) < 10:
        # fall back to the mode itself, slightly jittered
        draws = theta_star[None, :] + 1e-4 * z[:n_draws] @ L.T
    if verbosity >= 2:
        print(f"initialize: kept {len(draws)} Laplace draws as starting points")

    model.starting_points = draws
    model.laplace_sigma = sigma
    return jnp.asarray(theta_star)


def starting_points_chain(model, key=None):
    """Package `model.starting_points` as a 1-chain `Chains` with all
    derived quantities resolved — the init chain the reference's
    `initialize!` returns (`initialization.jl:184-344`), so tutorials
    can `octoplot(model, init_chain)` to sanity-check data entry before
    sampling."""
    import jax

    from ..chains import Chains, flatten_params_batch

    if model.starting_points is None:
        raise ValueError("run initialize() first")
    draws = jnp.asarray(model.starting_points)
    if getattr(model, "discrete_names", []):
        keys = jax.random.split(
            key if key is not None else jax.random.PRNGKey(0), draws.shape[0]
        )

        def one(t, k):
            logits = model.discrete_conditional_logits(t)
            i = jax.random.categorical(k, logits)
            return model._disc_combos[i]

        disc = jax.vmap(one)(draws, keys)
        nts = jax.vmap(model.arr2nt)(jax.vmap(model.invlink)(draws), disc)
    else:
        nts = jax.vmap(model.arr2nt)(jax.vmap(model.invlink)(draws))
    lp = np.asarray(jax.vmap(model._ln_post_py)(draws)).reshape(1, -1)

    data = {}
    for k, v in flatten_params_batch(nts).items():
        v = np.asarray(v)
        if v.ndim == 1:
            data[k] = v.reshape(1, -1)
        else:
            v2 = v.reshape(1, v.shape[0], -1)
            for j in range(v2.shape[-1]):
                data[f"{k}_{j + 1}"] = v2[..., j]
    return Chains(
        data,
        {"logpost": lp},
        {
            "sampler": "initialize",
            "model_name": model.system.name,
            "parameter_names": model.parameter_names,
        },
    )
