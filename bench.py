"""Benchmark entry point, run by the driver on real TPU hardware.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: Kepler orbit solves/sec/chip (the reference's hot kernel,
~47 ns/solve single-threaded CPU => 2.13e7 solves/sec baseline,
`/root/reference/docs/src/kepler.md:22`). The solve here is the full
`orbitsolve` pipeline (Markley solver + on-sky projection), vectorized
over a (chains x epochs) batch like the sampler hot loop.
"""

import json
import time

import jax
import jax.numpy as jnp

from octofitter_tpu.orbits import VisualOrbit, orbitsolve

BASELINE_SOLVES_PER_SEC = 1.0 / 47e-9  # reference Markley solver on CPU


def main():
    n_orbits, n_epochs = 4096, 2048
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    dtype = jnp.float32
    a = jax.random.uniform(ks[0], (n_orbits,), dtype, 1.0, 20.0)
    e = jax.random.uniform(ks[1], (n_orbits,), dtype, 0.0, 0.95)
    i = jax.random.uniform(ks[2], (n_orbits,), dtype, 0.0, 3.1)
    w = jax.random.uniform(ks[3], (n_orbits,), dtype, -3.1, 3.1)
    O = jax.random.uniform(ks[4], (n_orbits,), dtype, -3.1, 3.1)
    tp = jax.random.uniform(ks[5], (n_orbits,), dtype, 55000.0, 60000.0)
    M = jax.random.uniform(ks[6], (n_orbits,), dtype, 0.5, 2.0)
    plx = jax.random.uniform(ks[7], (n_orbits,), dtype, 10.0, 100.0)
    epochs = jnp.linspace(55000.0, 60000.0, n_epochs, dtype=dtype)

    @jax.jit
    def solve_all(a, e, i, w, O, tp, M, plx):
        def one(a, e, i, w, O, tp, M, plx):
            orb = VisualOrbit(a=a, e=e, i=i, omega=w, Omega=O, tp=tp, M=M, plx=plx)
            sol = orbitsolve(orb, epochs)
            # consume all observables so nothing is dead-code eliminated
            return (
                jnp.sum(sol.raoff_mas)
                + jnp.sum(sol.decoff_mas)
                + jnp.sum(sol.pmra_masyr)
                + jnp.sum(sol.radvel_ms)
            )

        return jnp.sum(jax.vmap(one)(a, e, i, w, O, tp, M, plx))

    args = (a, e, i, w, O, tp, M, plx)
    solve_all(*args).block_until_ready()  # compile

    n_iter = 20
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = solve_all(*args)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / n_iter

    solves_per_sec = n_orbits * n_epochs / dt
    print(
        json.dumps(
            {
                "metric": "kepler_orbit_solves_per_sec_per_chip",
                "value": solves_per_sec,
                "unit": "solves/s",
                "vs_baseline": solves_per_sec / BASELINE_SOLVES_PER_SEC,
            }
        )
    )


if __name__ == "__main__":
    main()
