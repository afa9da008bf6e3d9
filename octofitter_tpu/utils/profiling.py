"""Tracing / profiling hooks.

SURVEY.md section 5: the reference probes the likelihood/gradient once
at model build (`logdensitymodel.jl:159-187`) and prints a per-run
sampling report (`sampling.jl:440-451`); the TPU equivalents here add
native JAX profiler traces (viewable in XProf/TensorBoard) and a
compile-vs-execute timing probe.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a JAX profiler trace (XLA + host) into log_dir.

    Usage:
        with profile_trace("/tmp/prof"):
            chain = octofit(model, ...)
    Open with XProf / TensorBoard's profile plugin.
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timing_probe(fn, *args, n_iter: int = 10):
    """Compile + steady-state timing of a jittable callable.

    Returns dict(compile_s, exec_s, per_iter_s). The first call measures
    trace+compile+execute; subsequent block_until_ready'd calls measure
    the steady state (the reference's @showtime probes,
    `logdensitymodel.jl:159-187`).
    """
    jitted = jax.jit(fn)
    t0 = time.perf_counter()
    out = jitted(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = jitted(*args)
    jax.block_until_ready(out)
    exec_s = time.perf_counter() - t0
    return {
        "compile_s": compile_s,
        "exec_s": exec_s,
        "per_iter_s": exec_s / n_iter,
    }
