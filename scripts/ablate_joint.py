"""Attribute the joint-model gradient cost across observation channels.

Builds the examples/02 joint model with subsets of its three
observation channels (relative astrometry, HGCA PMA, marginalized RV)
and times the jitted batched value_and_grad of each variant at the
bench chain count, attributing the measured per-gradient cost
(joint/headline ratio 2.42x at 8192 chains, scripts/profile_joint.py)
to channels. Run on the TPU: python scripts/ablate_joint.py
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_variant(keep):
    """examples/02 model keeping only the named observation channels."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ex02",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "examples", "02_joint_astrom_pma_rv.py"),
    )
    ex02 = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ex02)

    import octofitter_tpu as oc

    model, _, _ = ex02.build_model()
    system = model.system
    system.observations = [o for o in system.observations if o.name in keep]
    for p in system.planets:
        p.observations = [o for o in p.observations if o.name in keep]
    return oc.LogDensityModel(system, verbosity=0)


def time_bvg(model, n_chains, n_inner=100):
    """In-program per-gradient cost: a jitted fori_loop of n_inner
    dependent batched gradient evaluations, so per-call dispatch
    overhead (~0.2-1 ms on the axon backend, which swamps and
    de-additivizes per-call timings) cancels out — this mirrors how the
    sampler actually runs the gradient (inside a compiled while-loop)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    vg = jax.value_and_grad(model._ln_post_py)
    bvg = jax.vmap(vg)
    theta0 = jnp.asarray(
        np.asarray(model.sample_priors(jax.random.PRNGKey(0), n_chains))
    )
    if theta0.shape[0] != n_chains:
        theta0 = theta0.T

    @jax.jit
    def loop(theta):
        def body(i, th):
            lp, g = bvg(th)
            return th + 1e-30 * g

        return jax.lax.fori_loop(0, n_inner, body, theta)

    t0 = time.perf_counter()
    out = loop(theta0)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    n_iter = 5
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = loop(theta0)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / (n_iter * n_inner) * 1e3, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=8192)
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

    variants = [
        ("full", {"astrom", "HGCA", "rvs"}),
        ("astrom_only", {"astrom"}),
        ("hgca_only", {"HGCA"}),
        ("rv_only", {"rvs"}),
        ("astrom+hgca", {"astrom", "HGCA"}),
        ("astrom+rv", {"astrom", "rvs"}),
    ]
    for name, keep in variants:
        model = build_variant(keep)
        ms, compile_s = time_bvg(model, args.chains)
        print(f"{name:14s} dim={model.D:3d} grad_ms={ms:8.3f} "
              f"(compile {compile_s:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
