"""Minimal repro for the axon-backend kernel fault at large chain counts.

Observed envelope (v5e, axon remote-compile backend, 2026-08-17..19):

  * ChEES-HMC on the bench astrometry model: 4096 chains always OK,
    8192 faults ~1-in-2 on a cold compile cache, 16384 faults ALWAYS —
    both unchunked and with ``n_chunks=2`` (two sequential 8192-chain
    sub-batches inside the leapfrog body), i.e. the fault tracks TOTAL
    program size, not the leapfrog batch shape.
  * Iterative NUTS on the same model faults above ~1024 chains at max
    tree depth 10 (large nested-while program), while simple targets
    run fine at 512x700 — same signature, smaller threshold, because
    the NUTS program is much larger per chain.

The production mitigations in this repo are subprocess isolation with
retries (bench.py) and gating headline measurements at 4096 chains.
This script is the self-contained artifact a backend owner can run:

  python scripts/axon_fault_repro.py --chains 16384            # faults
  python scripts/axon_fault_repro.py --chains 4096             # ok
  python scripts/axon_fault_repro.py --chains 16384 --target gauss

``--target gauss`` swaps the astrometry posterior for an isotropic
standard normal of the same dimension: if that also faults, the
backend cliff is purely program-size-dependent and model content is
irrelevant. ``--hlo`` additionally dumps the optimized HLO module and
prints its size, giving the backend team the program artifact.

Exit code: 0 if the run completes, non-zero on the kernel fault (the
fault surfaces as a raised RuntimeError / crashed process).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=16384)
    ap.add_argument("--warmup", type=int, default=700)
    ap.add_argument("--samples", type=int, default=3000)
    ap.add_argument("--n-chunks", type=int, default=1)
    ap.add_argument("--target", choices=["astrom", "gauss"], default="astrom")
    ap.add_argument("--cpu", action="store_true",
                    help="run on CPU (sanity check that the program is valid)")
    ap.add_argument("--hlo", action="store_true",
                    help="dump optimized HLO for the sampling program")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from octofitter_tpu.samplers.chees import run_chees

    if args.target == "astrom":
        import bench

        model = bench.build_model()
        model.initialize(jax.random.PRNGKey(0), verbosity=0)
        pts = np.asarray(model.starting_points)
        sigma0 = np.asarray(model.laplace_sigma)
        vg = jax.value_and_grad(model._ln_post_py)
        idx = np.asarray(jax.random.choice(
            jax.random.PRNGKey(1), pts.shape[0], (args.chains,), replace=True))
        theta0 = jnp.asarray(pts[idx])
        dim = theta0.shape[1]
    else:
        dim = 13  # same dimension as the astrometry model

        def _ln_post(x):
            return -0.5 * jnp.sum(x * x)

        vg = jax.value_and_grad(_ln_post)
        theta0 = 0.1 * jax.random.normal(
            jax.random.PRNGKey(1), (args.chains, dim))
        sigma0 = np.eye(dim)

    print(f"target={args.target} chains={args.chains} dim={dim} "
          f"warmup={args.warmup} samples={args.samples} "
          f"n_chunks={args.n_chunks} platform={jax.devices()[0].platform}",
          flush=True)

    if args.hlo:
        # the sampling driver jits internally; lower the equivalent
        # jitted step for an HLO size datapoint
        f = jax.jit(jax.vmap(vg))
        lowered = f.lower(theta0)
        comp = lowered.compile()
        hlo = comp.as_text()
        path = f"/tmp/axon_repro_vg_{args.chains}.hlo.txt"
        with open(path, "w") as fh:
            fh.write(hlo)
        print(f"gradient-program HLO: {len(hlo)} bytes -> {path}", flush=True)

    t0 = time.perf_counter()
    samples, lls, stats, info = run_chees(
        vg, theta0, jax.random.PRNGKey(2),
        n_warmup=args.warmup, n_samples=args.samples,
        metric="dense", initial_sigma=sigma0, n_chunks=args.n_chunks,
    )
    jax.block_until_ready(samples)
    dt = time.perf_counter() - t0
    print(f"COMPLETED in {dt:.1f}s — no fault at {args.chains} chains "
          f"(mean |x| = {float(np.abs(np.asarray(samples)).mean()):.3f})",
          flush=True)


if __name__ == "__main__":
    main()
