"""Benchmark entry point, run by the driver on real TPU hardware.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: ESS/sec/chip sampling the quick-start relative-
astrometry posterior (BASELINE.md north star) with 4096 vectorized
chains (cross-chain ChEES-HMC, dense metric, 700 warmup + 3000 draws).

Accounting is strict: rank-normalized bulk ESS (Vehtari et al. 2021)
computed over ALL chains jointly (no mode filtering, no subsample
extrapolation), taken as the MINIMUM across every model parameter, and
gated on max rank-normalized split-R-hat < 1.05.

Baseline: the reference's single-chain CPU NUTS on fits of this size
reports ~10-50 us per leapfrog step (`src/sampling.jl:443-451` report;
`docs/src/kepler.md:22` 47 ns/solve x 8 epochs + AD overhead) with mean
tree depth ~6 and ~0.5 ESS/draw, i.e. O(200) ESS/sec — we use
200 ESS/sec as the documented single-node baseline.

Falls back to the Kepler orbit-solve throughput metric (baseline
47 ns/solve, `docs/src/kepler.md:22`) if the sampling path fails on
the accelerator.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

# Persistent compilation cache (measured working on the axon backend:
# re-run of an identical program 3.09s -> 0.77s). Compiles go through a
# slow remote service, so caching matters: entries persist as each XLA
# compile finishes, meaning even a timed-out 8192-chain subprocess
# attempt seeds the cache for its retry. The cache lives INSIDE the
# repo tree (gitignored) rather than /tmp because /tmp is wiped between
# sessions — a pre-seeded cache must survive until the driver's
# round-end bench run.
import os as _os

_CACHE_DIR = _os.path.join(
    _os.path.dirname(_os.path.abspath(__file__)), ".jax_cache"
)
try:
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

BASELINE_ESS_PER_SEC = 200.0
BASELINE_SOLVES_PER_SEC = 1.0 / 47e-9

# Global wall-clock budget. Rounds 3 AND 4 were killed by the driver
# (rc=124): SIGALRM phase bounds cannot pre-empt a stalled C call (a
# 15+ min axon backend *init* stall was observed 2026-08-19, and remote
# compiles block in C), so the in-process global budget was demonstrably
# not honored. Round 5 therefore runs EVERY phase as a subprocess with a
# hard `subprocess.run(timeout=)` (SIGKILL) — the orchestrator process
# itself never initializes the backend, so nothing can stall it, and it
# always exits 0 with the cumulative JSON as the last line.
_BENCH_T0 = time.perf_counter()
_BENCH_BUDGET_S = float(_os.environ.get("OCTOFITTER_BENCH_BUDGET_S", 3300))


def _remaining_s():
    return _BENCH_BUDGET_S - (time.perf_counter() - _BENCH_T0)


def build_model(t0=55000.0, t1=59500.0, name="bench"):
    import octofitter_tpu as oc
    from octofitter_tpu import distributions as dist
    from octofitter_tpu.orbits import VisualOrbit, orbitsolve, raoff, decoff

    # default epochs give full orbital-phase coverage (P ~ 4400 d): a
    # compact unimodal posterior measuring sampler throughput. The
    # partial-arc variant (t1-t0 << P) is the hard-geometry secondary
    # case (continuous (a,e,tp) degeneracy ridge) reported WITHOUT a
    # convergence gate — its rank-normalized diagnostics are part of
    # the output.
    true = dict(a=7.0, e=0.2, i=0.6, omega=1.0, Omega=2.0, tp=57000.0, M=1.2, plx=50.0)
    n = 12
    rng = np.random.default_rng(0)
    epochs = np.linspace(t0, t1, n)
    sol = orbitsolve(VisualOrbit.from_params(**true), jnp.asarray(epochs))
    astrom = oc.PlanetRelAstromObs(
        dict(
            epoch=epochs,
            ra=np.asarray(raoff(sol)) + rng.standard_normal(n) * 2.0,
            dec=np.asarray(decoff(sol)) + rng.standard_normal(n) * 2.0,
            σ_ra=np.full(n, 2.0),
            σ_dec=np.full(n, 2.0),
        ),
        name="simdata",
    )
    b = oc.Planet(
        name="b",
        basis="Visual{KepOrbit}",
        variables=dict(
            a=dist.Uniform(0.001, 100.0),
            e=dist.Uniform(0.0, 0.99),
            i=dist.Sine(),
            omega=oc.UniformCircular(),
            Omega=oc.UniformCircular(),
            theta=oc.UniformCircular(),
            tp=lambda sys, pl: oc.theta_at_epoch_to_tperi(
                pl.theta, 57000.0, M=sys.M, e=pl.e, a=pl.a,
                i=pl.i, omega=pl.omega, Omega=pl.Omega,
            ),
        ),
        observations=[astrom],
    )
    system = oc.System(
        name=name,
        variables=dict(
            M=dist.truncated(dist.Normal(1.2, 0.1), lower=0.1),
            plx=dist.truncated(dist.Normal(50.0, 0.02), lower=0.1),
        ),
        companions=[b],
    )
    return oc.LogDensityModel(system, verbosity=0)


def _run_case(model, n_chains=4096, n_warmup=700, n_samples=3000,
              n_chunks=1):
    """Fit one dataset with ChEES; return (min rank-normalized ESS
    across every parameter, max rank-normalized split R-hat, seconds)."""
    import sys

    from octofitter_tpu.chains import ess_rhat_batch
    from octofitter_tpu.samplers.chees import run_chees
    t_start = time.perf_counter()
    # full initialization pipeline (prior search -> multistart Adam ->
    # L-BFGS -> Laplace), the production octofit path
    model.initialize(jax.random.PRNGKey(0), verbosity=0)
    print(f"bench[case] init pipeline {time.perf_counter() - t_start:.0f}s",
          file=sys.stderr, flush=True)
    pts = np.asarray(model.starting_points)
    sigma0 = np.asarray(model.laplace_sigma)
    vg = jax.value_and_grad(model._ln_post_py)
    idx = np.asarray(
        jax.random.choice(
            jax.random.PRNGKey(1), pts.shape[0], (n_chains,), replace=True
        )
    )
    theta0 = jnp.asarray(pts[idx])

    t0 = time.perf_counter()
    samples, lls, stats, info = run_chees(
        vg, theta0, jax.random.PRNGKey(2),
        n_warmup=n_warmup, n_samples=n_samples,
        metric="dense", initial_sigma=sigma0, n_chunks=n_chunks,
    )
    jax.block_until_ready(samples)
    dt = time.perf_counter() - t0
    print(f"bench[case] sampling (incl. in-window compile) {dt:.0f}s",
          file=sys.stderr, flush=True)
    t_diag = time.perf_counter()

    # strict accounting: rank-normalized bulk ESS over ALL chains, min
    # across every parameter, with the max rank-normalized split-R-hat
    # (exact-match parity with the scalar loop is tested in
    # tests/test_chains_batch.py). Runs on the accelerator holding the
    # samples when possible — the host pass costs ~161 s at
    # 4096x3000x13 on this ~1-core box (~25% of a phase budget), the
    # fused device program replaces it without transferring the chains.
    ess = rhat = None
    if _os.environ.get("OCTOFITTER_DEVICE_ESS", "1") == "1":
        try:
            from octofitter_tpu.chains import ess_rhat_batch_device

            ess, rhat = ess_rhat_batch_device(samples)
        except Exception as e:
            import sys

            print(f"bench: device diagnostics failed ({e!r}); "
                  "falling back to host", file=sys.stderr, flush=True)
    if ess is None:
        ess, rhat = ess_rhat_batch(np.asarray(samples))
    # degenerate (constant / non-finite) columns are excluded, matching
    # the scalar accounting; all-degenerate -> nan
    ess_min = float(np.nanmin(ess)) if np.isfinite(ess).any() else float("nan")
    rhat_max = float(np.nanmax(rhat)) if np.isfinite(rhat).any() else float("nan")
    print(f"bench[case] diagnostics {time.perf_counter() - t_diag:.0f}s",
          file=sys.stderr, flush=True)
    return ess_min, rhat_max, dt


def _chain_ess_rhat(chain):
    from octofitter_tpu.chains import ess_rhat_batch

    x = np.stack([np.asarray(chain[name]) for name in chain.names], axis=-1)
    if _os.environ.get("OCTOFITTER_DEVICE_ESS", "1") == "1":
        try:
            from octofitter_tpu.chains import ess_rhat_batch_device

            ess, rhat = ess_rhat_batch_device(x)
            ess_min = (
                float(np.nanmin(ess)) if np.isfinite(ess).any() else float("nan")
            )
            rhat_max = (
                float(np.nanmax(rhat)) if np.isfinite(rhat).any() else float("nan")
            )
            return ess_min, rhat_max
        except Exception as e:
            import sys

            print(f"bench: device diagnostics failed ({e!r}); "
                  "falling back to host", file=sys.stderr, flush=True)
    ess, rhat = ess_rhat_batch(x)
    ess_min = float(np.nanmin(ess)) if np.isfinite(ess).any() else float("nan")
    rhat_max = float(np.nanmax(rhat)) if np.isfinite(rhat).any() else float("nan")
    return ess_min, rhat_max


# Walker scaling measured on-chip (2026-08-19, 9 rounds, rhat ~1.037
# at every size): 256 walkers ~100 ESS/s, 512 -> 139, 1024 -> 229,
# 2048 -> 310, 4096 -> 369 ESS/s (373 s sampling) — sweeps are
# vectorized over walkers so wall time grows far slower than ESS.
# 4096 is the best measured config that fits the stage-1 alarm.
_PA_KWARGS = dict(
    n_chains=8, n_chains_variational=8, n_walkers=4096,
    explorer="chees", explorer_n_leapfrog=512, verbosity=0,
)


def _build_partial_arc_model():
    model = build_model(56800.0, 57400.0, name="bench_partial_arc")
    model.initialize(jax.random.PRNGKey(0), verbosity=0)
    return model


def bench_partial_arc(n_walkers=4096, stage2=False):
    """Hard-geometry secondary: the partial-arc (a,e,tp)-ridge dataset
    sampled with variational parallel tempering (chees explorer) — the
    production path for such posteriors (single-temperature chains
    report rhat > 1.3 regardless of budget). Measured on v5e with the
    device-resident sweep (zero per-sweep host syncs): 9 rounds
    (1022 sweeps, 4096 walkers) in ~374 s at rhat_max ~1.037 and
    ~369 ESS/s.

    Runs as an externally-bounded subprocess case. Round checkpoints
    are written at a deterministic path, so a killed attempt resumes
    from the last round boundary (bit-identical to an uninterrupted
    run, tests/test_checkpoint.py); a `.t0` sidecar records the wall
    clock at the first attempt's sampling start so resumed attempts
    report honest cumulative ESS/s. `stage2` resumes the
    shadow-adapted `.final.npz` continuation for a 10th,
    twice-as-long round (used when the 9-round rhat misses the 1.05
    gate)."""
    import os
    import tempfile

    from octofitter_tpu.samplers.tempering import octofit_pigeons

    cp = os.path.join(tempfile.gettempdir(), f"bench_pa_cp_{n_walkers}.npz")
    t0_path = cp + ".t0"
    kwargs = dict(_PA_KWARGS, n_walkers=n_walkers)

    model = _build_partial_arc_model()
    # 1-round warmup fills the compile cache (the sweep program is
    # shape-identical across rounds) so the timed run starts
    # compile-warm; with the persistent cache already seeded this
    # costs seconds.
    octofit_pigeons(model, n_rounds=1, key=jax.random.PRNGKey(1), **kwargs)

    resume = None
    n_rounds = 9
    if stage2:
        resume, n_rounds = cp + ".final.npz", 10
    elif os.path.exists(cp):
        resume = cp  # killed earlier attempt: continue from round boundary

    if os.path.exists(t0_path):
        with open(t0_path) as f:
            t_start = float(f.read())
    else:
        t_start = time.time()
        with open(t0_path, "w") as f:
            f.write(repr(t_start))

    chain, info = octofit_pigeons(
        model, n_rounds=n_rounds, key=jax.random.PRNGKey(1),
        checkpoint=cp, resume=resume, **kwargs,
    )
    ess_min, rhat_max = _chain_ess_rhat(chain)
    out = {
        "partial_arc_pt_ess_per_sec": ess_min / (time.time() - t_start),
        "partial_arc_pt_rhat_max": rhat_max,
        "partial_arc_pt_rounds": n_rounds,
    }
    if n_walkers != 4096:
        out["partial_arc_pt_n_walkers"] = n_walkers
    return out


def _headline_case(n_chains, n_chunks=1, n_samples=3000):
    model = build_model()
    ess, rhat, dt = _run_case(model, n_chains=n_chains, n_chunks=n_chunks,
                              n_samples=n_samples)
    if not np.isfinite(rhat) or rhat > 1.05:
        raise RuntimeError(f"bench sampling did not converge (rhat={rhat})")
    out = {"ess_per_sec": ess / dt, "rhat_max": rhat,
           "n_chains": n_chains}
    if n_chunks > 1:
        out["n_chunks"] = n_chunks
    if n_samples != 3000:
        out["n_samples"] = n_samples
    return out


def _run_gated_case():
    """Headline (4096, gated), joint north star, and partial-arc PT in
    ONE subprocess, printing each metric's JSON line as it completes.

    Rationale (round-5 validation run, 2026-08-21): the per-phase fixed
    overhead — axon backend init + compile-cache load + model init
    pipeline — varies from ~4 to ~20 minutes by night, and paying it
    once per phase made the joint phase blow its 1100 s budget and the
    partial-arc phase lose its global-budget slot on a slow night even
    with every sampler program cache-warm. One process pays it once;
    the orchestrator harvests whatever lines were printed even if this
    process is timeout-killed mid-way (TimeoutExpired.stdout) and runs
    individual fallback phases only for the missing metrics."""
    import sys

    t0 = time.perf_counter()

    def note(msg):
        print(f"bench[gated] t={time.perf_counter() - t0:.0f}s {msg}",
              file=sys.stderr, flush=True)

    out = _headline_case(4096)
    print(json.dumps(out), flush=True)
    note("headline done")
    try:
        out = bench_joint()
        print(json.dumps(out), flush=True)
        note("joint done")
    except Exception as e:
        print(json.dumps({"joint_astrom_pma_rv_error": repr(e)[:200]}),
              flush=True)
        note(f"joint failed: {e!r}")
    try:
        out = bench_partial_arc()
        print(json.dumps(out), flush=True)
        note("pa done")
    except Exception as e:
        print(json.dumps({"partial_arc_pt_error": repr(e)[:200]}),
              flush=True)
        note(f"pa failed: {e!r}")


def _run_phase_multi(case, timeout_s, min_budget=300.0):
    """Run one subprocess case and return EVERY JSON line it printed,
    harvesting partial stdout when the hard timeout kills it."""
    import os
    import subprocess
    import sys

    script = os.path.abspath(__file__)
    budget = min(timeout_s, _remaining_s() - 60.0)
    if budget < min_budget:
        print(f"bench: case {case} skipped "
              f"({_remaining_s():.0f}s of global budget left)",
              file=sys.stderr, flush=True)
        return []
    stdout = ""
    try:
        proc = subprocess.run(
            [sys.executable, script, "--case", case],
            capture_output=True, text=True, timeout=budget,
            cwd=os.path.dirname(script),
        )
        stdout = proc.stdout or ""
        if proc.returncode != 0:
            tail = (proc.stderr or "").strip().splitlines()[-3:]
            print(f"bench: case {case} rc={proc.returncode}: "
                  + " | ".join(tail), file=sys.stderr, flush=True)
    except subprocess.TimeoutExpired as e:
        print(f"bench: case {case} timed out after {budget:.0f}s "
              "(harvesting partial output)", file=sys.stderr, flush=True)
        stdout = e.stdout or ""
        if isinstance(stdout, bytes):
            stdout = stdout.decode("utf-8", "replace")
    results = []
    for line in stdout.strip().splitlines():
        try:
            results.append(json.loads(line))
        except json.JSONDecodeError:
            continue
    return results


def _run_phase(case, timeout_s, attempts=2, min_budget=300.0,
               validate=None, error_key=None):
    """Run one bench phase as a hard-timeout subprocess and return its
    JSON dict (or an {error_key: ...} dict / None).

    This is the round-5 delivery fix: rounds 3 and 4 both shipped
    rc=124 driver artifacts because SIGALRM phase bounds cannot
    pre-empt a stalled C call (axon backend init, remote compile). A
    subprocess with `subprocess.run(timeout=)` is killed
    unconditionally, the orchestrator never initializes the backend
    itself, and a timed-out attempt still seeds the persistent
    compilation cache so the retry resumes compile progress. Phase
    budgets are clamped to the remaining global budget; a phase that
    no longer fits is skipped with a stderr note."""
    import os
    import subprocess
    import sys

    script = os.path.abspath(__file__)
    last_err = None
    for attempt in range(attempts):
        budget = min(timeout_s, _remaining_s() - 60.0)
        if budget < min_budget:
            print(
                f"bench: case {case} skipped "
                f"({_remaining_s():.0f}s of global budget left)",
                file=sys.stderr, flush=True,
            )
            last_err = last_err or "skipped: global bench budget exhausted"
            break
        try:
            proc = subprocess.run(
                [sys.executable, script, "--case", case],
                capture_output=True, text=True, timeout=budget,
                cwd=os.path.dirname(script),
            )
        except subprocess.TimeoutExpired:
            print(f"bench: case {case} attempt {attempt + 1} timed out "
                  f"after {budget:.0f}s",
                  file=sys.stderr, flush=True)
            last_err = f"timeout after {budget:.0f}s"
            continue
        if proc.returncode != 0:
            tail = (proc.stderr or "").strip().splitlines()[-3:]
            msg = f"rc={proc.returncode}: " + " | ".join(tail)
            print(f"bench: case {case} attempt {attempt + 1} failed ({msg})",
                  file=sys.stderr, flush=True)
            last_err = msg[:300]
            continue
        for line in reversed(proc.stdout.strip().splitlines()):
            try:
                out = json.loads(line)
            except json.JSONDecodeError:
                continue
            if validate is None or validate(out):
                return out
            last_err = f"validation failed: {json.dumps(out)[:200]}"
            break
        else:
            last_err = "no JSON line in subprocess output"
    if error_key is not None and last_err is not None:
        return {error_key: last_err}
    return None


def _build_joint_model():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "ex02",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "examples", "02_joint_astrom_pma_rv.py"),
    )
    ex02 = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ex02)
    model, _, _ = ex02.build_model()
    return model


def bench_joint(n_chains=4096):
    """North-star metric fields (BASELINE.md: "ESS/sec/chip on joint
    astrometry+RV+HGCA fit"): the beta-Pic-like joint model from
    examples/02_joint_astrom_pma_rv.py, sampled with the same strict
    rank-normalized all-chain accounting as the headline."""
    model = _build_joint_model()
    ess, rhat, dt = _run_case(model, n_chains=n_chains)
    return {
        "joint_astrom_pma_rv_ess_per_sec": ess / dt,
        "joint_astrom_pma_rv_rhat_max": rhat,
        "joint_astrom_pma_rv_n_chains": n_chains,
    }


def bench_kepler():
    from octofitter_tpu.orbits import VisualOrbit, orbitsolve

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
            return (
                jnp.sum(sol.raoff_mas) + jnp.sum(sol.decoff_mas)
                + jnp.sum(sol.pmra_masyr) + jnp.sum(sol.radvel_ms)
            )

        return jnp.sum(jax.vmap(one)(a, e, i, w, O, tp, M, plx))

    args = (a, e, i, w, O, tp, M, plx)
    solve_all(*args).block_until_ready()
    n_iter = 20
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = solve_all(*args)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / n_iter
    return n_orbits * n_epochs / dt


def _run_subprocess_case(case):
    """One bench phase in this (child) process; prints ONE JSON line."""
    if case == "kepler":
        solves = bench_kepler()
        out = {
            "metric": "kepler_orbit_solves_per_sec_per_chip",
            "value": solves,
            "unit": "solves/s",
            "vs_baseline": solves / BASELINE_SOLVES_PER_SEC,
        }
    elif case == "joint8192":
        out = bench_joint(n_chains=8192)
        if out["joint_astrom_pma_rv_rhat_max"] > 1.05:
            raise RuntimeError(
                "joint 8192 did not converge "
                f"(rhat={out['joint_astrom_pma_rv_rhat_max']})"
            )
    elif case == "joint":
        out = bench_joint()
    elif case == "gated":
        _run_gated_case()
        return
    elif case == "pa":
        out = bench_partial_arc()
    elif case == "pa_stage2":
        out = bench_partial_arc(stage2=True)
    elif case == "pa8192":
        out = bench_partial_arc(n_walkers=8192)
    else:
        # headline-case grammar: "N[xK][dS]" — N chains, optional
        # xK = leapfrog body split into K sequential sub-batches
        # (axon fault workaround), optional dS = S posterior draws
        # (amortizes the 700-step warmup; 3000 default)
        n_samples = 3000
        if "d" in case:
            case, s = case.split("d")
            n_samples = int(s)
        n_chunks = 1
        if "x" in case:
            case, k = case.split("x")
            n_chunks = int(k)
        out = _headline_case(int(case), n_chunks=n_chunks,
                             n_samples=n_samples)
    print(json.dumps(out), flush=True)


def _orchestrate():
    """Parent-process driver: phases run as hard-timeout subprocesses;
    the cumulative JSON record is re-printed after each phase so the
    last complete line is always the best available snapshot, and the
    process always exits 0 within the global budget.

    Phase order is gated-first / upside-last: the three gated metrics
    (4096-chain headline, joint north star, partial-arc PT) run in ONE
    subprocess so the night's backend-init/compile-service overhead is
    paid once — its stdout is harvested even on a timeout kill — with
    individual fallback subprocesses only for whatever is missing,
    then the pure-upside upgrades (8192 chains / 8192-walker PT) that
    may kernel-fault or time out without costing any printed metric."""
    import glob
    import os
    import sys
    import tempfile

    # stale partial-arc checkpoints from a previous bench run would be
    # silently resumed; clear them before the first attempt
    for p in glob.glob(os.path.join(tempfile.gettempdir(), "bench_pa_cp_*")):
        os.remove(p)

    payload = {}

    def _emit():
        print(json.dumps(payload), flush=True)

    def _ingest_headline(o):
        if o.get("rhat_max", np.inf) < 1.05:
            payload.update(
                metric="ess_per_sec_per_chip_astrometry_fit",
                value=o["ess_per_sec"], unit="ESS/s",
                vs_baseline=o["ess_per_sec"] / BASELINE_ESS_PER_SEC,
                rhat_max=o["rhat_max"], n_chains=o["n_chains"],
            )
            return True
        return False

    # --- gated group: headline + joint + partial-arc, ONE process --
    # (one backend init / cache load / init pipeline warm-up; a
    # timeout kill still yields whatever metrics were printed)
    for o in _run_phase_multi("gated", timeout_s=2400, min_budget=600.0):
        if "ess_per_sec" in o:
            _ingest_headline(o)
        elif ("joint_astrom_pma_rv_ess_per_sec" in o
              or "partial_arc_pt_rhat_max" in o
              or "joint_astrom_pma_rv_error" in o
              or "partial_arc_pt_error" in o):
            payload.update(o)
        _emit()

    # --- per-metric fallbacks for whatever the group did not land --
    if "value" not in payload:
        res = _run_phase(
            "4096", timeout_s=1500, attempts=2, min_budget=240.0,
            validate=lambda o: o.get("rhat_max", np.inf) < 1.05,
        )
        if res is not None:
            _ingest_headline(res)
        else:
            # sampling path unavailable: Kepler orbit-solve throughput
            # fallback so the artifact still carries a real measurement
            kep = _run_phase("kepler", timeout_s=600, attempts=2,
                             min_budget=120.0)
            payload.update(kep or {
                "metric": "ess_per_sec_per_chip_astrometry_fit",
                "value": 0.0, "unit": "ESS/s",
                "error": "headline and kepler fallback both failed",
            })
        _emit()

    if "joint_astrom_pma_rv_ess_per_sec" not in payload:
        res = _run_phase(
            "joint", timeout_s=1100, attempts=1, min_budget=300.0,
            validate=lambda o: "joint_astrom_pma_rv_ess_per_sec" in o,
            error_key="joint_astrom_pma_rv_error",
        )
        if res:
            if "joint_astrom_pma_rv_ess_per_sec" in res:
                payload.pop("joint_astrom_pma_rv_error", None)
            payload.update(res)
            _emit()

    if "partial_arc_pt_rhat_max" not in payload:
        # resumes from the gated attempt's round checkpoint (honest
        # cumulative timing via the .t0 sidecar)
        res = _run_phase(
            "pa", timeout_s=800, attempts=2, min_budget=300.0,
            validate=lambda o: "partial_arc_pt_rhat_max" in o,
            error_key="partial_arc_pt_error",
        )
        if res:
            if "partial_arc_pt_rhat_max" in res:
                payload.pop("partial_arc_pt_error", None)
            payload.update(res)
            _emit()
    if (payload.get("partial_arc_pt_rhat_max", np.inf) >= 1.05
            and np.isfinite(payload.get("partial_arc_pt_rhat_max", np.inf))):
        res = _run_phase(
            "pa_stage2", timeout_s=700, attempts=1, min_budget=300.0,
            validate=lambda o: "partial_arc_pt_rhat_max" in o,
        )
        if res:
            payload.update(res)
            payload.pop("partial_arc_pt_error", None)
            _emit()

    # --- upgrades: pure upside on metrics already printed ----------
    res = _run_phase(
        "8192", timeout_s=1200, attempts=2, min_budget=300.0,
        validate=lambda o: o.get("rhat_max", np.inf) < 1.05,
    )
    if res and res["ess_per_sec"] > payload.get("value", 0.0):
        payload.update(
            value=res["ess_per_sec"],
            vs_baseline=res["ess_per_sec"] / BASELINE_ESS_PER_SEC,
            rhat_max=res["rhat_max"], n_chains=res["n_chains"],
        )
        _emit()
    res = _run_phase(
        "joint8192", timeout_s=1200, attempts=2, min_budget=300.0,
        validate=lambda o: o.get("joint_astrom_pma_rv_rhat_max", np.inf) < 1.05,
    )
    if res and (res["joint_astrom_pma_rv_ess_per_sec"]
                > payload.get("joint_astrom_pma_rv_ess_per_sec", 0.0)):
        payload.update(res)
        payload.pop("joint_astrom_pma_rv_error", None)
        _emit()
    res = _run_phase(
        "pa8192", timeout_s=900, attempts=1, min_budget=400.0,
        validate=lambda o: o.get("partial_arc_pt_rhat_max", np.inf) < 1.05,
    )
    if res and (res["partial_arc_pt_ess_per_sec"]
                > payload.get("partial_arc_pt_ess_per_sec", 0.0)):
        payload.update(res)
        payload.pop("partial_arc_pt_error", None)
        _emit()

    _emit()
    sys.exit(0)


def main():
    import sys

    if len(sys.argv) >= 3 and sys.argv[1] == "--case":
        _run_subprocess_case(sys.argv[2])
        return
    _orchestrate()


if __name__ == "__main__":
    main()
