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

# Global wall-clock budget. Round 3's bench was killed by the driver
# (rc=124) after the pure-upside upgrade subprocesses pushed the total
# past the driver's timeout — every gated metric had printed, but the
# process did not exit cleanly. The budget makes the bench
# self-limiting: optional phases are skipped (with a stderr note) when
# the remaining budget can't cover them, so the process always exits 0
# with the cumulative JSON as the last line.
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
    from octofitter_tpu.chains import ess_rhat_batch
    from octofitter_tpu.samplers.chees import run_chees
    # full initialization pipeline (prior search -> multistart Adam ->
    # L-BFGS -> Laplace), the production octofit path
    model.initialize(jax.random.PRNGKey(0), verbosity=0)
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

    # strict accounting: rank-normalized bulk ESS over ALL chains, min
    # across every parameter, with the max rank-normalized split-R-hat
    # (one vectorized pass over all parameters; exact-match parity with
    # the scalar loop is tested in tests/test_chains_batch.py)
    s = np.asarray(samples)
    ess, rhat = ess_rhat_batch(s)
    # degenerate (constant / non-finite) columns are excluded, matching
    # the scalar accounting; all-degenerate -> nan
    ess_min = float(np.nanmin(ess)) if np.isfinite(ess).any() else float("nan")
    rhat_max = float(np.nanmax(rhat)) if np.isfinite(rhat).any() else float("nan")
    return ess_min, rhat_max, dt


def _chain_ess_rhat(chain):
    from octofitter_tpu.chains import ess_rhat_batch

    x = np.stack([np.asarray(chain[name]) for name in chain.names], axis=-1)
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


def _run_partial_arc_pt(model, checkpoint_path, n_rounds=9, resume=None):
    """Hard-geometry secondary: the partial-arc (a,e,tp)-ridge dataset
    sampled with variational parallel tempering (chees explorer) — the
    production path for such posteriors (single-temperature chains
    report rhat > 1.3 regardless of budget). Measured on v5e with the
    device-resident sweep (zero per-sweep host syncs): 9 rounds
    (1022 sweeps, 4096 walkers) in ~374 s at rhat_max ~1.037 and
    ~369 ESS/s. Returns (min rank-normalized ESS across params, max
    rank-normalized split R-hat, seconds)."""
    from octofitter_tpu.samplers.tempering import octofit_pigeons

    t0 = time.perf_counter()
    chain, info = octofit_pigeons(
        model, n_rounds=n_rounds, key=jax.random.PRNGKey(1),
        checkpoint=checkpoint_path, resume=resume, **_PA_KWARGS,
    )
    dt = time.perf_counter() - t0
    ess_min, rhat_max = _chain_ess_rhat(chain)
    return ess_min, rhat_max, dt


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


def _try_case_subprocess(case, ess_key, rhat_key, attempts=2,
                         timeout_s=1200):
    """Pure-upside chain-count upgrades (e.g. 8192 chains measured 816k
    ESS/s vs 762k at 4096 on v5e) run in an isolated subprocess: the
    axon backend kernel-faults INTERMITTENTLY (~1 in 2 runs) on the
    larger program shapes, and on a slow remote-compile day the whole
    attempt can time out — neither may take down the bench. These run
    LAST, after every gated metric has printed, so a failure costs only
    its own budget. A timed-out attempt still seeds the persistent
    compilation cache, so the retry starts compile-warm."""
    import os
    import subprocess
    import sys

    script = os.path.abspath(__file__)
    for attempt in range(attempts):
        budget = min(timeout_s, _remaining_s() - 60.0)
        if budget < 300.0:
            print(
                f"bench: case {case} skipped "
                f"({_remaining_s():.0f}s of global budget left)",
                file=sys.stderr, flush=True,
            )
            break
        try:
            proc = subprocess.run(
                [sys.executable, script, "--case", case],
                capture_output=True, text=True, timeout=budget,
                cwd=os.path.dirname(script),
            )
        except subprocess.TimeoutExpired:
            print(f"bench: case {case} attempt {attempt + 1} timed out",
                  file=sys.stderr, flush=True)
            continue
        if proc.returncode != 0:
            tail = (proc.stderr or "").strip().splitlines()[-3:]
            print(
                f"bench: case {case} attempt {attempt + 1} failed "
                f"(rc={proc.returncode}): " + " | ".join(tail),
                file=sys.stderr, flush=True,
            )
            continue
        for line in reversed(proc.stdout.strip().splitlines()):
            try:
                out = json.loads(line)
            except json.JSONDecodeError:
                continue
            if ess_key in out and out.get(rhat_key, np.inf) < 1.05:
                return out
            break
    return None


def _try_8192_subprocess():
    return _try_case_subprocess("8192", "ess_per_sec", "rhat_max")


def bench_sampling():
    # headline: full-phase unimodal dataset, gated on convergence.
    # 3000 draws amortize the 700-step warmup; ESS/draw stays ~0.7 so
    # the rank-normalized ESS is ~8.8M+ real effective samples per run.
    # The reliable 4096 configuration runs FIRST so the headline is
    # guaranteed; the caller then attempts the 8192 upgrade.
    return _headline_case(4096)


def bench_partial_arc_pt():
    """Secondary fields: partial-arc ridge via variational PT, bounded
    by per-stage alarms so a backend stall can never eat the headline
    result (already printed by the time this runs). The model is built
    and initialized ONCE (its own alarm); a 1-round warmup then fills
    the compile cache (the sweep program is shape-identical across
    rounds), so the timed stages start compile-warm. Stage 1 runs the
    9-round 4096-walker configuration (measured rhat ~1.037 in ~374 s)
    with a round
    checkpoint — a stage-1 timeout resumes from that checkpoint instead
    of losing the run. If the 9-round rhat still misses the 1.05 gate,
    stage 2 resumes the shadow-adapted ".final.npz" continuation for a
    10th, twice-as-long round."""
    import os
    import tempfile

    cp = os.path.join(tempfile.gettempdir(), "bench_pa_checkpoint.npz")
    cp_final = cp + ".final.npz"
    for p in (cp, cp_final):  # stale files from a previous bench run
        if os.path.exists(p):
            os.remove(p)

    box = {}

    def _prep():
        box["model"] = _build_partial_arc_model()
        return {}

    out = _alarm_bounded(_prep, 600, "partial_arc_pt_init_error")
    if "model" not in box:
        return out

    def _warmup():
        from octofitter_tpu.samplers.tempering import octofit_pigeons

        octofit_pigeons(
            box["model"], n_rounds=1, key=jax.random.PRNGKey(1),
            **_PA_KWARGS,
        )
        return {}

    _alarm_bounded(_warmup, 600, "partial_arc_pt_warmup_error")

    t_start = time.perf_counter()

    def _stage1(resume=None):
        ess_pa, rhat_pa, _ = _run_partial_arc_pt(
            box["model"], cp, n_rounds=9, resume=resume
        )
        return {
            "partial_arc_pt_ess_per_sec": ess_pa / (time.perf_counter() - t_start),
            "partial_arc_pt_rhat_max": rhat_pa,
            "partial_arc_pt_rounds": 9,
        }

    out = _alarm_bounded(_stage1, 680, "partial_arc_pt_error")
    if "partial_arc_pt_rhat_max" not in out and os.path.exists(cp):
        # stage 1 timed out mid-run: finish the remaining rounds from
        # the last round-boundary checkpoint rather than reporting
        # nothing (bit-identical to the uninterrupted run)
        out.update(
            _alarm_bounded(
                lambda: _stage1(resume=cp), 500, "partial_arc_pt_resume_error"
            )
        )
        if "partial_arc_pt_rhat_max" in out:
            out.pop("partial_arc_pt_error", None)
            out.pop("partial_arc_pt_resume_error", None)
    rhat1 = out.get("partial_arc_pt_rhat_max", np.inf)
    if np.isfinite(rhat1) and rhat1 >= 1.05 and os.path.exists(cp_final):

        def _stage2():
            ess2, rhat2, _ = _run_partial_arc_pt(
                box["model"], cp, n_rounds=10, resume=cp_final
            )
            total = time.perf_counter() - t_start
            return {
                "partial_arc_pt_ess_per_sec": ess2 / total,
                "partial_arc_pt_rhat_max": rhat2,
                "partial_arc_pt_rounds": 10,
            }

        out2 = _alarm_bounded(_stage2, 560, "partial_arc_pt_stage2_error")
        if "partial_arc_pt_rhat_max" in out2:
            out.update(out2)
    return out


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


def _try_joint_8192_subprocess():
    return _try_case_subprocess(
        "joint8192",
        "joint_astrom_pma_rv_ess_per_sec",
        "joint_astrom_pma_rv_rhat_max",
    )


def _alarm_bounded(fn, seconds, error_key):
    """Run fn() under a SIGALRM budget; on any failure return the error
    string under error_key instead of raising. The per-stage budget is
    additionally clamped to the remaining global bench budget so the
    sum of stages can never exceed the driver's timeout."""
    import signal

    seconds = int(min(seconds, max(_remaining_s() - 30.0, 0.0)))
    if seconds <= 0:
        return {error_key: "skipped: global bench budget exhausted"}

    def _timeout(signum, frame):
        raise TimeoutError(f"{error_key} budget exceeded")

    old = signal.signal(signal.SIGALRM, _timeout)
    signal.alarm(seconds)
    try:
        return fn()
    except Exception as e:
        return {error_key: repr(e)[:200]}
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


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


def main():
    import sys

    if len(sys.argv) >= 3 and sys.argv[1] == "--case":
        # subprocess mode: one case, one JSON line
        case = sys.argv[2]
        if case == "joint8192":
            out = bench_joint(n_chains=8192)
            if out["joint_astrom_pma_rv_rhat_max"] > 1.05:
                raise RuntimeError(
                    "joint 8192 did not converge "
                    f"(rhat={out['joint_astrom_pma_rv_rhat_max']})"
                )
        elif case == "joint":
            out = bench_joint()
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
        return

    try:
        res = bench_sampling()
        ess_per_sec = res["ess_per_sec"]
        payload = {
            "metric": "ess_per_sec_per_chip_astrometry_fit",
            "value": ess_per_sec,
            "unit": "ESS/s",
            "vs_baseline": ess_per_sec / BASELINE_ESS_PER_SEC,
            "rhat_max": res["rhat_max"],
        }
        if "n_chains" in res:
            payload["n_chains"] = res["n_chains"]
        # print the headline immediately — the phases below are slower,
        # and this line must survive even if the run is killed; each
        # subsequent phase re-prints the full record (consumers take
        # the last complete JSON line)
        print(json.dumps(payload), flush=True)
        payload.update(
            _alarm_bounded(bench_joint, 1200, "joint_astrom_pma_rv_error")
        )
        if "joint_astrom_pma_rv_ess_per_sec" not in payload:
            # On a slow remote-compile day the joint model's programs
            # can exceed one budget. Every program that finished
            # compiling persisted to the compilation cache, so a retry
            # resumes compile progress instead of starting over.
            payload.update(
                _alarm_bounded(bench_joint, 1200, "joint_astrom_pma_rv_error")
            )
            if "joint_astrom_pma_rv_ess_per_sec" in payload:
                payload.pop("joint_astrom_pma_rv_error", None)
        print(json.dumps(payload), flush=True)
        payload.update(bench_partial_arc_pt())
        print(json.dumps(payload), flush=True)
        # LAST: chain-count upgrades. Pure upside on metrics already
        # printed — a timeout or kernel fault here can no longer cost
        # any other phase its budget.
        up = _try_8192_subprocess()
        if up is not None and up["ess_per_sec"] > ess_per_sec:
            payload.update(
                value=up["ess_per_sec"],
                vs_baseline=up["ess_per_sec"] / BASELINE_ESS_PER_SEC,
                rhat_max=up["rhat_max"], n_chains=up["n_chains"],
            )
            print(json.dumps(payload), flush=True)
        upj = _try_joint_8192_subprocess()
        if upj is not None and (
            upj["joint_astrom_pma_rv_ess_per_sec"]
            > payload.get("joint_astrom_pma_rv_ess_per_sec", 0.0)
        ):
            payload.update(upj)
            payload.pop("joint_astrom_pma_rv_error", None)
            print(json.dumps(payload), flush=True)
    except Exception:
        solves = bench_kepler()
        print(
            json.dumps(
                {
                    "metric": "kepler_orbit_solves_per_sec_per_chip",
                    "value": solves,
                    "unit": "solves/s",
                    "vs_baseline": solves / BASELINE_SOLVES_PER_SEC,
                }
            )
        )


if __name__ == "__main__":
    main()
