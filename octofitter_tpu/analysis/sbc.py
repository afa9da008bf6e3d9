"""Simulation-based calibration.

TPU-native equivalent of `/root/reference/src/sbc.jl`: draw parameters
from the priors, generate synthetic observations via
`generate_from_params`, refit, and compute the rank of each true
parameter within its marginal posterior (`calibrationhmc`,
`sbc.jl:35-117`). Under a well-calibrated pipeline the ranks are
uniform.
"""

from __future__ import annotations

import jax
import numpy as np

from ..model.generate import generate_from_params
from ..model.logdensity import LogDensityModel


def sbc_trial(
    model: LogDensityModel,
    key,
    *,
    sampler_kwargs: dict | None = None,
    init_at_truth: bool = False,
    verbosity: int = 0,
):
    """One SBC trial: prior draw -> synthetic data -> refit -> ranks.

    `init_at_truth=True` starts chains at the generating parameters,
    like the reference completeness workflow (`completeness.jl:457`).
    Returns dict with 'theta_true' (flat natural), 'ranks' {name: rank
    in [0, 1]}, and the fitted chain.
    """
    from ..samplers import octofit

    if isinstance(key, int):
        key = jax.random.PRNGKey(key)
    k_draw, k_fit = jax.random.split(key)
    theta_true = np.asarray(model.sample_priors(k_draw))
    theta_nt = model.arr2nt(theta_true)
    rng = np.random.default_rng(int(np.asarray(jax.random.randint(k_draw, (), 0, 2**31))))
    new_system = generate_from_params(model, theta_nt, rng=rng, add_noise=True)
    new_model = LogDensityModel(new_system, verbosity=0)

    kwargs = dict(chains=4, adaptation=500, iterations=500, verbosity=verbosity)
    kwargs.update(sampler_kwargs or {})
    if init_at_truth and "starting_points" not in kwargs:
        kwargs["starting_points"] = np.asarray(
            new_model.link(np.asarray(theta_true))
        )
    chain = octofit(new_model, key=k_fit, **kwargs)

    ranks = {}
    for i, name in enumerate(model.parameter_names):
        if name in chain.data:
            draws = chain.flat(name)
            ranks[name] = float(np.mean(draws < theta_true[i]))
    return {"theta_true": theta_true, "ranks": ranks, "chain": chain}


def calibrate(
    model: LogDensityModel,
    n_trials: int = 20,
    *,
    seed: int = 0,
    sampler_kwargs: dict | None = None,
    init_at_truth: bool = False,
    verbosity: int = 1,
):
    """Run n_trials SBC trials; returns rank arrays per parameter plus a
    uniformity check (KS distance). Trials are independent posterior
    fits — on a pod these fan out across devices/hosts."""
    keys = jax.random.split(jax.random.PRNGKey(seed), n_trials)
    all_ranks: dict[str, list] = {}
    for i in range(n_trials):
        out = sbc_trial(
            model, keys[i], sampler_kwargs=sampler_kwargs,
            init_at_truth=init_at_truth,
        )
        for k, v in out["ranks"].items():
            all_ranks.setdefault(k, []).append(v)
        if verbosity >= 1:
            print(f"sbc trial {i + 1}/{n_trials} done")
    result = {}
    for k, v in all_ranks.items():
        r = np.asarray(v)
        # KS distance from uniform
        rs = np.sort(r)
        grid = (np.arange(1, len(rs) + 1)) / len(rs)
        ks = float(np.max(np.abs(rs - grid)))
        result[k] = {"ranks": r, "ks_distance": ks}
    return result
