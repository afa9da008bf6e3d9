"""Generative path: synthesize observations from model parameters.

TPU-native equivalent of the reference's whole-system generator
(`/root/reference/src/likelihoods/system.jl:278-398`
`generate_from_params(system, theta; add_noise)`): gather epochs with
the same ordering contract as the likelihood, solve all orbits once,
then ask every observation object to produce a synthetic copy of
itself. Consumed by SBC, injection-recovery and completeness mapping.
"""

from __future__ import annotations

import copy

import jax
import jax.numpy as jnp
import numpy as np

from ..orbits import orbitsolve
from .params import Params
from .variables import (
    Planet,
    PlanetObservationContext,
    System,
    SystemObservationContext,
)


def _clone_planet(planet: Planet, new_obs) -> Planet:
    new = object.__new__(Planet)
    new.name = planet.name
    new.basis = planet.basis
    new.var_specs = planet.var_specs
    new.observations = list(new_obs)
    return new


def _clone_system(system: System, new_obs, new_planets) -> System:
    new = object.__new__(System)
    new.name = system.name
    new.var_specs = system.var_specs
    new.planets = list(new_planets)
    new.observations = list(new_obs)
    return new


def generate_from_params(model, theta_nt=None, *, rng=None, add_noise=False):
    """Generate a new System whose observations are drawn from the model
    at parameters `theta_nt` (a structured Params; default: a prior
    draw). Returns the new System.
    """
    if rng is None:
        rng = np.random.default_rng(0)
    system = model.system
    if theta_nt is None:
        theta_nt = model.drawfrompriors(jax.random.PRNGKey(int(rng.integers(2**31))))

    orbits = model.construct_orbits(theta_nt)
    epochs_np = model._all_epochs
    if len(epochs_np) and len(orbits):
        epochs = jnp.asarray(epochs_np)
        sols = tuple(orbitsolve(o, epochs) for o in orbits)
    else:
        sols = tuple(None for _ in orbits)
    start_map = model._epoch_start

    new_planets = []
    for i_planet, planet in enumerate(system.planets):
        theta_planet = theta_nt.planets[planet.name]
        new_obs = []
        for obs in planet.observations:
            theta_obs = theta_planet.observations.get(obs.normalized_name, Params())
            ctx = PlanetObservationContext(
                theta_system=theta_nt,
                theta_planet=theta_planet,
                theta_obs=theta_obs,
                orbits=orbits,
                solutions=sols,
                i_planet=i_planet,
                epoch_start=start_map.get(id(obs), 0),
            )
            new_obs.append(obs.generate_from_params(ctx, rng, add_noise=add_noise))
        new_planets.append(_clone_planet(planet, new_obs))

    new_sys_obs = []
    for obs in system.observations:
        theta_obs = theta_nt.observations.get(obs.normalized_name, Params())
        ctx = SystemObservationContext(
            theta_system=theta_nt,
            theta_obs=theta_obs,
            orbits=orbits,
            solutions=sols,
            epoch_start=start_map.get(id(obs), 0),
        )
        new_sys_obs.append(obs.generate_from_params(ctx, rng, add_noise=add_noise))

    return _clone_system(system, new_sys_obs, new_planets)
