"""Completeness (injection-recovery sensitivity) mapping.

TPU-native equivalent of `/root/reference/src/completeness.jl`: a
3-phase workflow — generate a grid of jobs, run injection-recovery
trials (draw priors, override (mass, separation), simulate, refit
starting at truth), then apply a detection criterion post hoc and
assemble the completeness map. Trials store full chains so criteria
can be re-applied without re-sampling (`completeness.jl:12-16`).

Trials are embarrassingly parallel: on a pod, fan jobs out across
devices/hosts.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..model.generate import generate_from_params
from ..model.logdensity import LogDensityModel


@dataclasses.dataclass
class CompletenessJob:
    i_mass: int
    i_sep: int
    i_trial: int
    mass: float
    separation: float
    seed: int


@dataclasses.dataclass
class CompletenessResult:
    job: CompletenessJob
    chain: object
    theta_true: object


@dataclasses.dataclass
class CompletenessMap:
    masses: np.ndarray
    separations: np.ndarray
    completeness: np.ndarray
    n_detected: np.ndarray
    n_total: np.ndarray


def completeness_jobs(*, masses, separations, n_trials: int = 5, seed: int = 0):
    """Phase 1 (`completeness.jl:125-...`): one job per
    (mass, separation, trial)."""
    rng = np.random.default_rng(seed)
    jobs = []
    for i_m, m in enumerate(masses):
        for i_s, s in enumerate(separations):
            for i_t in range(n_trials):
                jobs.append(
                    CompletenessJob(
                        i_m, i_s, i_t, float(m), float(s),
                        int(rng.integers(2**31)),
                    )
                )
    return jobs


def _apply_overrides(model, theta_flat, overrides: dict):
    """Override free parameters by flat name (`b_mass`, `b_a`, ...)."""
    theta = np.array(theta_flat, dtype=np.float64)
    names = model.parameter_names
    for k, v in overrides.items():
        if k not in names:
            raise KeyError(
                f"Cannot override {k!r}: not a free (prior) parameter. "
                f"Available: {names}"
            )
        theta[names.index(k)] = float(v)
    return theta


def run_completeness_trial(
    job: CompletenessJob,
    model: LogDensityModel,
    sampler,
    *,
    inject,
    add_noise: bool = True,
    verbosity: int = 0,
):
    """Phase 2 (`completeness.jl:199-238`): one injection-recovery trial.

    `inject(mass, sep)` returns a dict of flat-name overrides, e.g.
    `lambda m, s: {"b_mass": m, "b_a": s}`. `sampler(model)` runs the
    fit (the model arrives with starting points set at truth,
    `completeness.jl:457`).
    """
    key = jax.random.PRNGKey(job.seed)
    theta_flat = np.asarray(model.sample_priors(key))
    theta_flat = _apply_overrides(model, theta_flat, inject(job.mass, job.separation))
    theta_nt = model.arr2nt(jnp.asarray(theta_flat))

    rng = np.random.default_rng(job.seed)
    sim_system = generate_from_params(model, theta_nt, rng=rng, add_noise=add_noise)
    sim_model = LogDensityModel(sim_system, verbosity=0)

    # initialize at truth ("the cheat", `completeness.jl:455-466`)
    theta_t = np.asarray(sim_model.link(jnp.asarray(theta_flat)))
    sim_model.starting_points = np.tile(theta_t, (8, 1))

    chain = sampler(sim_model)
    return CompletenessResult(job, chain, theta_nt)


def assemble_completeness(results, detection_criterion, *, masses, separations):
    """Phase 3 (`completeness.jl:286-...`): apply
    `detection_criterion(chain, theta_true) -> bool` and tabulate."""
    masses = np.asarray(list(masses), dtype=float)
    seps = np.asarray(list(separations), dtype=float)
    n_det = np.zeros((len(masses), len(seps)), int)
    n_tot = np.zeros((len(masses), len(seps)), int)
    for r in results:
        det = bool(detection_criterion(r.chain, r.theta_true))
        n_tot[r.job.i_mass, r.job.i_sep] += 1
        n_det[r.job.i_mass, r.job.i_sep] += det
    with np.errstate(invalid="ignore"):
        comp = np.where(n_tot > 0, n_det / np.maximum(n_tot, 1), np.nan)
    return CompletenessMap(masses, seps, comp, n_det, n_tot)


def completeness_map(
    model: LogDensityModel,
    sampler,
    detection_criterion,
    *,
    inject,
    masses,
    separations,
    n_trials: int = 5,
    add_noise: bool = True,
    seed: int = 0,
    verbosity: int = 1,
):
    """End-to-end driver (`completeness.jl:374-...`).
    Returns (CompletenessMap, results list)."""
    jobs = completeness_jobs(
        masses=masses, separations=separations, n_trials=n_trials, seed=seed
    )
    results = []
    for i, job in enumerate(jobs):
        if verbosity >= 1:
            print(f"completeness trial {i + 1}/{len(jobs)}", end="\r")
        results.append(
            run_completeness_trial(
                job, model, sampler, inject=inject, add_noise=add_noise,
                verbosity=max(0, verbosity - 1),
            )
        )
    if verbosity >= 1:
        print()
    cmap = assemble_completeness(
        results, detection_criterion, masses=masses, separations=separations
    )
    return cmap, results
