"""Attribute the joint-model throughput gap (VERDICT r4 item 2).

The joint astrom+PMA+RV north star samples ~3.6x fewer ESS/s than the
headline astrometry model. ESS/s factors as

    ESS/s = (draws/s) * (ESS/draw)
    draws/s ~ 1 / (leapfrog steps/draw * grad cost)

so this script measures, for both bench models at the bench chain
counts:

  * per-gradient wall time (the jitted batched value_and_grad),
  * dims, packed epoch counts,
  * from a short ChEES run: mean trajectory length (leapfrog
    steps/draw) and acceptance,

and prints a table attributing the ESS/s ratio to gradient cost vs
trajectory length vs mixing (ESS/draw, from the bench results).

Run on the TPU: python scripts/profile_joint.py [--chains 8192]
Optionally: --trace /tmp/prof to dump an XProf trace of one gradient.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(name, model, n_chains, key, trace_dir=None, n_samples=200):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from octofitter_tpu.samplers.chees import run_chees

    model.initialize(jax.random.PRNGKey(0), verbosity=0)
    pts = np.asarray(model.starting_points)
    sigma0 = np.asarray(model.laplace_sigma)
    vg = jax.value_and_grad(model._ln_post_py)
    idx = np.asarray(jax.random.choice(
        jax.random.PRNGKey(1), pts.shape[0], (n_chains,), replace=True))
    theta0 = jnp.asarray(pts[idx])
    D = theta0.shape[1]

    bvg = jax.jit(jax.vmap(vg))
    t0 = time.perf_counter()
    out = bvg(theta0)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    n_iter = 50
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = bvg(theta0)
    jax.block_until_ready(out)
    grad_s = (time.perf_counter() - t0) / n_iter

    if trace_dir:
        from octofitter_tpu.utils.profiling import profile_trace

        with profile_trace(os.path.join(trace_dir, name)):
            for _ in range(5):
                out = bvg(theta0)
            jax.block_until_ready(out)

    # run for adapted trajectory statistics; n_samples=3000 reuses the
    # bench-shaped program from the persistent compile cache
    t0 = time.perf_counter()
    samples, lls, stats, info = run_chees(
        vg, theta0, key, n_warmup=700, n_samples=n_samples,
        metric="dense", initial_sigma=sigma0,
    )
    jax.block_until_ready(samples)
    sample_s = time.perf_counter() - t0
    steps_per_draw = float(np.mean(np.asarray(stats.n_steps)))
    accept = float(np.mean(np.asarray(stats.acceptance_rate)))
    rec = dict(
        name=name, n_chains=n_chains, dim=D,
        grad_ms=grad_s * 1e3, grad_compile_s=compile_s,
        grads_per_sec=n_chains / grad_s,
        steps_per_draw=steps_per_draw, accept=accept,
        sample_s=sample_s,
    )
    if n_samples >= 1000:
        from octofitter_tpu.chains import ess_rhat_batch_device

        ess, rhat = ess_rhat_batch_device(samples)
        ess = np.asarray(ess)
        ess_min = float(np.nanmin(ess)) if np.isfinite(ess).any() else float("nan")
        rec.update(
            ess_min=ess_min,
            ess_min_per_draw=ess_min / (n_chains * n_samples),
            ess_per_sec=ess_min / sample_s,
            rhat_max=float(np.nanmax(np.asarray(rhat))),
            ess_argmin=int(np.nanargmin(ess)),
            ess_by_param=[round(float(v)) for v in ess],
        )
    print(rec, flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=8192)
    ap.add_argument("--samples", type=int, default=200)
    ap.add_argument("--trace", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import bench

    headline = bench.build_model()
    joint = bench._build_joint_model()
    r_h = measure("headline", headline, args.chains,
                  jax.random.PRNGKey(2), args.trace, args.samples)
    r_j = measure("joint", joint, args.chains,
                  jax.random.PRNGKey(3), args.trace, args.samples)
    ratio = r_j["grad_ms"] / r_h["grad_ms"]
    print(f"\njoint/headline per-gradient cost ratio: {ratio:.2f}x "
          f"({r_j['grad_ms']:.3f} vs {r_h['grad_ms']:.3f} ms/batch at "
          f"{args.chains} chains)", flush=True)
    if (r_j["steps_per_draw"] == r_j["steps_per_draw"]
            and r_h["steps_per_draw"] == r_h["steps_per_draw"]):
        sratio = r_j["steps_per_draw"] / r_h["steps_per_draw"]
        print(f"trajectory-length ratio: {sratio:.2f}x "
              f"({r_j['steps_per_draw']:.1f} vs "
              f"{r_h['steps_per_draw']:.1f} leapfrog steps/draw)",
              flush=True)
    if "ess_min_per_draw" in r_h and "ess_min_per_draw" in r_j:
        eratio = r_h["ess_min_per_draw"] / r_j["ess_min_per_draw"]
        print(f"mixing (min-ESS/draw) ratio: {eratio:.2f}x "
              f"({r_h['ess_min_per_draw']:.4f} vs {r_j['ess_min_per_draw']:.4f})",
              flush=True)
        tratio = r_h["ess_per_sec"] / r_j["ess_per_sec"]
        print(f"total ESS/s ratio: {tratio:.2f}x "
              f"({r_h['ess_per_sec']:.0f} vs {r_j['ess_per_sec']:.0f})",
              flush=True)


if __name__ == "__main__":
    main()
