"""Cross-validation utilities.

TPU-native equivalent of `/root/reference/src/cross-validation.jl`:
`pointwise_like` (per-datum log-likelihood matrix over a chain),
`prior_only_model`, k-fold / per-epoch system generators, and
PSIS-LOO scoring. Where the reference compiles one likelihood function
per datum and threads over samples (`cross-validation.jl:6-49`), here
the per-datum log-likelihoods are a single batched device computation:
one jitted function maps a structured parameter set to the concatenated
per-epoch LL vector, vmapped over all chain draws.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..model.generate import _clone_planet, _clone_system
from ..model.params import Params
from ..model.variables import (
    BlankLikelihood,
    PlanetObservationContext,
    SystemObservationContext,
)
from ..orbits import orbitsolve


def prior_only_model(model_or_system, exclude_all=False):
    """Strip data-bearing observations, keeping their variables via
    BlankLikelihood (`cross-validation.jl:60-100`). Returns a System."""
    from ..model.logdensity import LogDensityModel

    system = (
        model_or_system.system
        if isinstance(model_or_system, LogDensityModel)
        else model_or_system
    )

    def strip(obs_list):
        out = []
        for obs in obs_list:
            if exclude_all or not obs.is_prior:
                blank = BlankLikelihood(name=obs.name)
                blank.var_specs = obs.var_specs
                out.append(blank)
            else:
                out.append(obs)
        return out

    new_planets = [
        _clone_planet(p, strip(p.observations)) for p in system.planets
    ]
    return _clone_system(system, strip(system.observations), new_planets)


def generate_kfold_systems(system):
    """N system copies each dropping one likelihood object
    (`cross-validation.jl:107-...`)."""
    out = []
    data_obs = []
    for obs in system.observations:
        if not obs.is_prior:
            data_obs.append(("sys", None, obs))
    for p in system.planets:
        for obs in p.observations:
            if not obs.is_prior:
                data_obs.append(("planet", p.name, obs))

    for kind_drop, pname_drop, obs_drop in data_obs:
        sys_obs = [o for o in system.observations if o is not obs_drop]
        planets = [
            _clone_planet(p, [o for o in p.observations if o is not obs_drop])
            for p in system.planets
        ]
        out.append(_clone_system(system, sys_obs, planets))
    return out


def generate_system_per_epoch(system):
    """One system per data row; returns (systems, epochs)
    (`cross-validation.jl:234-...`)."""
    systems, epochs = [], []
    rows = []
    for obs in system.observations:
        if obs.epochs is not None and not obs.is_prior:
            for i in range(len(obs.epochs)):
                rows.append(("sys", None, obs, i))
    for p in system.planets:
        for obs in p.observations:
            if obs.epochs is not None and not obs.is_prior:
                for i in range(len(obs.epochs)):
                    rows.append(("planet", p.name, obs, i))

    for kind, pname, obs, i in rows:
        sub = obs.likeobj_from_epoch_subset(np.asarray([i]))
        sys_obs = [o for o in system.observations if o.is_prior]
        if kind == "sys":
            sys_obs = sys_obs + [sub]
        planets = []
        for p in system.planets:
            pobs = [o for o in p.observations if o.is_prior]
            if kind == "planet" and p.name == pname:
                pobs = pobs + [sub]
            planets.append(_clone_planet(p, pobs))
        systems.append(_clone_system(system, sys_obs, planets))
        epochs.append(float(obs.epochs[i]))
    return systems, np.asarray(epochs)


def pointwise_like(model, chain):
    """Per-datum log-likelihood matrix over the chain.

    Returns (LL [n_samples, n_data], epochs [n_data]). Each datum is one
    row of one data-bearing observation; the matrix is computed in one
    vmapped device call (replacing the threaded per-sample loop at
    `cross-validation.jl:34-44`).
    """
    system = model.system
    epochs_np = model._all_epochs
    start_map = model._epoch_start

    # enumerate data rows
    row_info = []
    for obs in system.observations:
        if obs.epochs is not None and not obs.is_prior:
            row_info.extend(
                ("sys", None, obs, i) for i in range(len(obs.epochs))
            )
    for p in system.planets:
        for obs in p.observations:
            if obs.epochs is not None and not obs.is_prior:
                row_info.extend(
                    ("planet", p.name, obs, i) for i in range(len(obs.epochs))
                )
    epochs = np.asarray([obs.epochs[i] for _, _, obs, i in row_info])

    def pointwise_vector(theta_nt):
        orbits = model.construct_orbits(theta_nt)
        ep = jnp.asarray(epochs_np)
        sols = tuple(orbitsolve(o, ep) for o in orbits)
        pieces = []
        for obs in system.observations:
            if obs.epochs is None or obs.is_prior:
                continue
            theta_obs = theta_nt.observations.get(obs.normalized_name, Params())
            ctx = SystemObservationContext(
                theta_system=theta_nt,
                theta_obs=theta_obs,
                orbits=orbits,
                solutions=sols,
                epoch_start=start_map.get(id(obs), 0),
            )
            pieces.append(obs.pointwise_ln_like(ctx))
        for i_planet, p in enumerate(system.planets):
            theta_planet = theta_nt.planets[p.name]
            for obs in p.observations:
                if obs.epochs is None or obs.is_prior:
                    continue
                theta_obs = theta_planet.observations.get(
                    obs.normalized_name, Params()
                )
                ctx = PlanetObservationContext(
                    theta_system=theta_nt,
                    theta_planet=theta_planet,
                    theta_obs=theta_obs,
                    orbits=orbits,
                    solutions=sols,
                    i_planet=i_planet,
                    epoch_start=start_map.get(id(obs), 0),
                )
                pieces.append(obs.pointwise_ln_like(ctx))
        return jnp.concatenate(pieces)

    # chain -> flat natural draws
    names = model.parameter_names
    flat = np.stack([chain[n].reshape(-1) for n in names], axis=-1)

    @jax.jit
    def batch(flat):
        return jax.vmap(lambda th: pointwise_vector(model.arr2nt(th)))(flat)

    LL = np.asarray(batch(jnp.asarray(flat)))
    return LL, epochs


def psis_loo(LL):
    """Pareto-smoothed importance-sampling LOO (Vehtari et al. 2017).

    LL: (n_samples, n_data) pointwise log-likelihood matrix.
    Returns dict with elpd_loo, p_loo, pointwise elpd and Pareto k-hats.
    """
    S, N = LL.shape
    elpd = np.zeros(N)
    khat = np.zeros(N)
    for i in range(N):
        logr = -LL[:, i]
        logr = logr - logr.max()
        r = np.exp(logr)
        # fit generalized Pareto to the top 20% of the raw ratios
        M = max(int(0.2 * S), 10)
        tail = np.sort(r)[-M:]
        mu = np.sort(r)[-M - 1] if S > M else tail[0]
        k, sigma = _gpd_fit(tail - mu)
        khat[i] = k
        if np.isfinite(k) and k < 0.7 and sigma > 0:
            # smooth the tail with GPD quantiles
            q = (np.arange(1, M + 1) - 0.5) / M
            smoothed = mu + _gpd_quantile(q, k, sigma)
            order = np.argsort(r)
            r_s = r.copy()
            r_s[order[-M:]] = smoothed
            w = r_s
        else:
            w = r
        w = np.minimum(w, w.max())
        w = w / w.sum()
        elpd[i] = np.log(np.sum(w * np.exp(LL[:, i] - LL[:, i].max()))) + LL[:, i].max()
    lpd = np.array(
        [np.log(np.mean(np.exp(LL[:, i] - LL[:, i].max()))) + LL[:, i].max() for i in range(N)]
    )
    return {
        "elpd_loo": float(elpd.sum()),
        "p_loo": float((lpd - elpd).sum()),
        "elpd_pointwise": elpd,
        "pareto_k": khat,
    }


def _gpd_fit(x):
    """Zhang & Stephens (2009) generalized-Pareto fit."""
    x = np.sort(np.asarray(x))
    n = len(x)
    if n < 5 or x[-1] <= 0:
        return np.inf, 0.0
    prior = 3.0
    m = 30 + int(np.sqrt(n))
    bs = 1 - np.sqrt(m / (np.arange(1, m + 1) - 0.5))
    bs = bs / (prior * x[int(n / 4 + 0.5) - 1]) + 1 / x[-1]
    ks = np.array([-np.mean(np.log1p(-b * x)) for b in bs])
    L = n * (np.log(bs / ks) + ks - 1)
    w = 1 / np.array([np.sum(np.exp(L - L[i])) for i in range(m)])
    b = np.sum(bs * w)
    k = -np.mean(np.log1p(-b * x))
    sigma = k / b
    return k, sigma


def _gpd_quantile(q, k, sigma):
    return sigma * (np.power(1 - q, -k) - 1) / k
