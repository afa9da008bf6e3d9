"""Child process for the two-process DCN test (test_parallel.py).

Joins a real multi-process JAX runtime through the framework's own
env-driven wiring (`parallel.initialize_distributed`), builds the
global mesh, and runs an epoch-sharded log-likelihood partial sum whose
psum crosses the process boundary (DCN path; Gloo on CPU).
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from octofitter_tpu.parallel import (  # noqa: E402
    global_mesh,
    initialize_distributed,
    sharded_epoch_sum,
)


def main():
    import jax.numpy as jnp
    import numpy as np

    ok = initialize_distributed()  # from OCTOFITTER_* env vars
    assert ok, "distributed config not picked up from env"
    assert jax.process_count() == 2

    mesh = global_mesh(("chains",))
    n_global = mesh.devices.size
    assert n_global == 2 * jax.local_device_count()

    # epoch-sharded gaussian LL partial sums; exact vs the local sum
    n = 1000
    rng = np.random.default_rng(0)
    resid = jnp.asarray(rng.standard_normal(n))
    sigma = jnp.asarray(rng.uniform(0.5, 2.0, n))

    def term(r, s):
        return -0.5 * (r / s) ** 2 - jnp.log(s) - 0.5 * jnp.log(2 * jnp.pi)

    total = sharded_epoch_sum(term, (resid, sigma), mesh)
    expect = float(jnp.sum(term(resid, sigma)))
    got = float(total)
    assert abs(got - expect) < 1e-9 * max(1.0, abs(expect)), (got, expect)
    print(f"proc{jax.process_index()}: n_dev={n_global} ll={got:.6f} OK",
          flush=True)


if __name__ == "__main__":
    main()
