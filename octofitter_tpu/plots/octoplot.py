"""Orbit plots.

TPU-native equivalent of the reference's Makie plotting extension
(`/root/reference/ext/OctofitterMakieExt/octoplot.jl` and the
per-datatype panels): a matplotlib multi-panel figure of posterior
orbit draws over the data. Operates host-side on a fitted Chains
object plus the model's simulate functions.
"""

from __future__ import annotations

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from ..likelihoods.relastrom import PlanetRelAstromObs  # noqa: E402
from ..orbits import orbitsolve, raoff, decoff, radvel, pmra, pmdec  # noqa: E402
from ..constants import MJUP2MSOL  # noqa: E402


from ._util import savable as _savable


def _sample_orbits(model, chain, planet_name, n_draws=100, rng=None):
    """Construct orbit elements for posterior draws of one planet."""
    rng = rng or np.random.default_rng(0)
    total = chain.n_chains * chain.n_draws
    idx = rng.choice(total, size=min(n_draws, total), replace=False)
    names = model.parameter_names
    flat = np.stack([chain[n].reshape(-1) for n in names], axis=-1)[idx]
    orbits = []
    masses = []
    for row in flat:
        nt = model.arr2nt(jnp.asarray(row))
        orbs = model.construct_orbits(nt)
        i = [p.name for p in model.system.planets].index(planet_name)
        orbits.append(orbs[i])
        pl = nt.planets[planet_name]
        masses.append(float(pl.mass) * MJUP2MSOL if "mass" in pl else 0.0)
    return orbits, masses


@_savable
def astromplot(model, chain, ax=None, planet_name=None, n_draws=50,
               mark_epochs_mjd=None, verbosity=1):
    """Sky-plane orbit plot with astrometry data
    (`astromplot.jl`). `mark_epochs_mjd` scatters the posterior's
    predicted companion position at each given epoch and prints a
    sep/PA summary, like the reference's octoplot kwarg
    (`octoplot.jl:35`, used in `docs/src/faq.md`)."""
    if ax is None:
        _, ax = plt.subplots(figsize=(6, 6))
    planet = (
        model.system.planets[0]
        if planet_name is None
        else next(p for p in model.system.planets if p.name == planet_name)
    )
    orbits, _ = _sample_orbits(model, chain, planet.name, n_draws)
    for orbit in orbits:
        from ..orbits import period

        P = float(period(orbit))
        ts = jnp.linspace(float(orbit.tp), float(orbit.tp) + P, 200)
        sol = orbitsolve(orbit, ts)
        ax.plot(np.asarray(raoff(sol)), np.asarray(decoff(sol)),
                color="C0", alpha=0.08, lw=0.8)
    if mark_epochs_mjd is not None:
        for k, t_mark in enumerate(np.atleast_1d(mark_epochs_mjd)):
            ras, decs = [], []
            for orbit in orbits:
                sol = orbitsolve(orbit, jnp.asarray([float(t_mark)]))
                ras.append(float(raoff(sol)[0]))
                decs.append(float(decoff(sol)[0]))
            ras, decs = np.asarray(ras), np.asarray(decs)
            color = f"C{(k % 8) + 1}"
            ax.scatter(ras, decs, s=10, color=color, zorder=7,
                       label=f"MJD {t_mark:.1f}")
            if verbosity >= 1:
                sep = np.hypot(ras, decs)
                # circular PA statistics: linear mean/std on an angle
                # wrapped to [0, 360) is wrong near the north-crossing
                pa = np.arctan2(ras, decs)
                pa_mean = np.degrees(
                    np.arctan2(np.mean(np.sin(pa)), np.mean(np.cos(pa)))
                ) % 360.0
                dev = np.degrees(
                    np.angle(np.exp(1j * (pa - np.radians(pa_mean))))
                )
                print(
                    f"epoch MJD {t_mark:.1f}: "
                    f"sep = {sep.mean():.1f} ± {sep.std():.1f} mas, "
                    f"PA = {pa_mean:.1f} ± {dev.std():.1f} deg"
                )
        ax.legend(loc="best", fontsize=8)
    for obs in planet.observations:
        if isinstance(obs, PlanetRelAstromObs):
            t = obs.table
            if obs.seppa:
                ra = t["sep"] * np.sin(t["pa"])
                dec = t["sep"] * np.cos(t["pa"])
                ax.scatter(ra, dec, s=14, color="k", zorder=5)
            else:
                ax.errorbar(t["ra"], t["dec"], xerr=t["σ_ra"], yerr=t["σ_dec"],
                            fmt="o", ms=3, color="k", zorder=5)
    ax.plot(0, 0, marker="*", ms=14, color="goldenrod", zorder=6)
    ax.set_xlabel(r"$\Delta \alpha^*$ [mas]")
    ax.set_ylabel(r"$\Delta \delta$ [mas]")
    ax.invert_xaxis()
    ax.set_aspect("equal")
    return ax


@_savable
def rvtimeplot(model, chain, ax=None, n_draws=50, t_range=None):
    """RV time-series plot (`rvtimeplot.jl`)."""
    if ax is None:
        _, ax = plt.subplots(figsize=(8, 4))
    from ..rv.likelihoods import _BaseRVObs

    rv_obs = [o for o in model.system.observations if isinstance(o, _BaseRVObs)]
    tmin, tmax = np.inf, -np.inf
    for obs in rv_obs:
        t = obs.table
        ax.errorbar(t["epoch"], t["rv"], yerr=t["σ_rv"], fmt="o", ms=3, zorder=5,
                    label=obs.name)
        tmin = min(tmin, t["epoch"].min())
        tmax = max(tmax, t["epoch"].max())
    if t_range is not None:
        tmin, tmax = t_range
    if not np.isfinite(tmin):
        tmin, tmax = 56000.0, 58000.0
    ts = jnp.linspace(tmin, tmax, 500)
    for p in model.system.planets:
        orbits, masses = _sample_orbits(model, chain, p.name, n_draws)
        for orbit, m in zip(orbits, masses):
            sol = orbitsolve(orbit, ts)
            rv = np.asarray(radvel(sol, m)) if m else np.asarray(radvel(sol))
            ax.plot(np.asarray(ts), rv, color="C0", alpha=0.08, lw=0.8)
    ax.set_xlabel("epoch [MJD]")
    ax.set_ylabel("RV [m/s]")
    return ax


@_savable
def pmaplot(model, chain, ax=None, n_draws=50):
    """Proper-motion-anomaly plot (`pmaplot.jl`): reflex pm vs time with
    HGCA measurement windows."""
    if ax is None:
        _, ax = plt.subplots(2, 1, figsize=(8, 5), sharex=True)
    ts = jnp.linspace(47500.0, 58500.0, 400)
    for p in model.system.planets:
        orbits, masses = _sample_orbits(model, chain, p.name, n_draws)
        for orbit, m in zip(orbits, masses):
            sol = orbitsolve(orbit, ts)
            ax[0].plot(np.asarray(ts), np.asarray(pmra(sol, m)),
                       color="C0", alpha=0.08, lw=0.8)
            ax[1].plot(np.asarray(ts), np.asarray(pmdec(sol, m)),
                       color="C0", alpha=0.08, lw=0.8)
    ax[0].set_ylabel(r"$\Delta\mu_{\alpha*}$ [mas/yr]")
    ax[1].set_ylabel(r"$\Delta\mu_{\delta}$ [mas/yr]")
    ax[1].set_xlabel("epoch [MJD]")
    return ax


def octoplot(
    model,
    chain,
    fname=None,
    n_draws=50,
    show_astrom=None,
    show_physical_orbit=None,
    show_astrom_time=None,
    show_rv=None,
    show_relative_rv=None,
    show_pma=None,
    show_absastrom=None,
    show_mass=False,
    show_hipparcos=None,
    show_gaia=None,
    mark_epochs_mjd=None,
):
    """Multi-panel summary figure (`octoplot.jl:35-110`): the panel set
    adapts to the data types present in the model (None = auto), like
    the reference's 9-panel composite. Flags force panels on/off.
    `mark_epochs_mjd` marks predicted positions at the given epochs on
    the sky-plane panel and prints a sep/PA summary (`octoplot.jl:35`,
    `docs/src/faq.md` workflow)."""
    from ..astrom.g23h import G23HObs
    from ..astrom.gaia_dr4 import GaiaDR4AstromObs
    from ..astrom.hipparcos import HipparcosIADObs
    from ..likelihoods.hgca import HGCAInstantaneousObs
    from ..likelihoods.relastrom import PlanetRelAstromObs
    from ..rv.likelihoods import _BaseRVObs, PlanetRelativeRVObs
    from . import panels

    sysobs = model.system.observations
    plobs = [o for p in model.system.planets for o in p.observations]

    def _auto(flag, cond):
        return cond if flag is None else flag

    has_astrom = any(isinstance(o, PlanetRelAstromObs) for o in plobs)
    show_astrom = _auto(show_astrom, has_astrom or len(model.system.planets) > 0)
    show_astrom_time = _auto(show_astrom_time, has_astrom)
    show_physical_orbit = _auto(show_physical_orbit, False)
    show_rv = _auto(show_rv, any(isinstance(o, _BaseRVObs) for o in sysobs))
    show_relative_rv = _auto(
        show_relative_rv, any(isinstance(o, PlanetRelativeRVObs) for o in plobs)
    )
    show_pma = _auto(
        show_pma,
        any(isinstance(o, HGCAInstantaneousObs) for o in sysobs)
        or any(type(o).__name__ == "HGCAObs" for o in sysobs),
    )
    show_absastrom = _auto(
        show_absastrom, any(isinstance(o, G23HObs) for o in sysobs)
    )
    show_hipparcos = _auto(
        show_hipparcos, any(isinstance(o, HipparcosIADObs) for o in sysobs)
    )
    show_gaia = _auto(
        show_gaia, any(isinstance(o, GaiaDR4AstromObs) for o in sysobs)
    )
    show_mass = _auto(
        show_mass,
        any(f"{p.name}_mass" in chain.data for p in model.system.planets),
    )

    # panel list: (rows, builder)
    jobs = []
    if show_astrom:
        jobs.append((2, lambda sub: astromplot(
            model, chain, ax=sub.subplots(), n_draws=n_draws,
            mark_epochs_mjd=mark_epochs_mjd)))
    if show_physical_orbit:
        jobs.append((2, lambda sub: panels.physorbitplot(
            model, chain, ax=sub.subplots(), n_draws=n_draws)))
    if show_astrom_time:
        jobs.append((2, lambda sub: panels.astromtimeplot(
            model, chain, axs=sub.subplots(2, 1, sharex=True),
            n_draws=n_draws)))
    if show_rv:
        jobs.append((1, lambda sub: rvtimeplot(
            model, chain, ax=sub.subplots(), n_draws=n_draws)))
    if show_relative_rv:
        jobs.append((1, lambda sub: rvtimeplot(
            model, chain, ax=sub.subplots(), n_draws=n_draws)))
    if show_pma:
        jobs.append((2, lambda sub: panels.hgcaplot(
            model, chain, axs=sub.subplots(2, 1, sharex=True),
            n_draws=n_draws)))
    if show_absastrom:
        jobs.append((1, lambda sub: panels.absastromplot(
            model, chain, ax=sub.subplots(), n_draws=min(n_draws, 20))))
    if show_hipparcos:
        jobs.append((1, lambda sub: panels.hipparcosplot(
            model, chain, ax=sub.subplots(), n_draws=min(n_draws, 20))))
    if show_gaia:
        jobs.append((1, lambda sub: panels.gaiatimeplot(
            model, chain, ax=sub.subplots(), n_draws=min(n_draws, 20))))
    if show_mass:
        jobs.append((1, lambda sub: panels.masspostplot(
            model, chain, axs=sub.subplots(1, 2))))

    if not jobs:
        raise ValueError("octoplot: no panels enabled / no plottable data")

    heights = [r for r, _ in jobs]
    fig = plt.figure(figsize=(7, 2.6 * sum(heights)))
    subfigs = fig.subfigures(len(jobs), 1, height_ratios=heights)
    if len(jobs) == 1:
        subfigs = [subfigs]
    for sub, (_, build) in zip(subfigs, jobs):
        build(sub)
    fig.suptitle(model.system.name)
    if fname is None:
        fname = f"{model.system.name}-plot-grid.png"
    if fname:
        fig.savefig(fname, dpi=150)
    return fig


@_savable
def rvpostplot(model, chain, axs=None, n_draws=50, planet_name=None,
               sample_idx=None):
    """Phase-folded RV plot with a residual panel and GP conditioning
    (`OctofitterRadialVelocity/ext/...MakieExt.jl` rvpostplot).

    The data are detrended with the MAP draw's non-Keplerian components
    (per-instrument offset, trend function, and — when the observation
    carries a celerite GP — the GP prediction conditioned on the MAP
    residuals), folded on the MAP period of the chosen planet, and
    overlaid with posterior Keplerian draws. The bottom panel shows the
    residuals after also removing the MAP Keplerian signal.
    """
    from ..model.params import Params
    from ..model.variables import SystemObservationContext
    from ..orbits import period as orbit_period
    from ..rv.likelihoods import _BaseRVObs

    if axs is None:
        fig, axs = plt.subplots(
            2, 1, figsize=(7, 5.5), sharex=True,
            height_ratios=[3, 1], constrained_layout=True,
        )
    ax, ax_res = axs
    planet = (
        model.system.planets[0]
        if planet_name is None
        else next(p for p in model.system.planets if p.name == planet_name)
    )
    i_planet = [p.name for p in model.system.planets].index(planet.name)

    # ---- MAP draw: detrending components + fold ephemeris -------------
    lp = chain.internals.get("logpost")
    total = chain.n_chains * chain.n_draws
    if sample_idx is None:
        sample_idx = int(np.argmax(lp.reshape(-1))) if lp is not None else 0
    names = model.parameter_names
    row = np.asarray([chain[n].reshape(-1)[sample_idx] for n in names])
    nt = model.arr2nt(jnp.asarray(row))
    orbits_map = model.construct_orbits(nt)
    epochs_all = jnp.asarray(model._all_epochs)
    sols_map = tuple(orbitsolve(o, epochs_all) for o in orbits_map)
    P_map = float(orbit_period(orbits_map[i_planet]))
    tp_map = float(orbits_map[i_planet].tp)
    m_map = (
        float(nt.planets[planet.name].mass) * MJUP2MSOL
        if "mass" in nt.planets[planet.name] else 0.0
    )

    rv_obs = [
        o for o in model.system.observations if isinstance(o, _BaseRVObs)
    ]
    for k, obs in enumerate(rv_obs):
        t = obs.table
        theta_obs = nt.observations.get(obs.normalized_name, Params())
        ctx = SystemObservationContext(
            theta_system=nt, theta_obs=theta_obs, orbits=orbits_map,
            solutions=sols_map,
            epoch_start=model._epoch_start.get(id(obs), 0),
        )
        rv_full = np.asarray(obs.simulate(ctx)["rv_model"])
        epochs = jnp.asarray(t["epoch"])
        # Keplerian part of the chosen planet at the data epochs
        sol_p = orbitsolve(orbits_map[i_planet], epochs)
        rv_kep = np.asarray(radvel(sol_p, m_map)) if m_map else 0.0
        nonkep = rv_full - rv_kep
        resid_map = np.asarray(t["rv"]) - rv_full
        # GP conditioning on the MAP residuals (`rv-gp.md` workflow)
        if getattr(obs, "gaussian_process", None) is not None:
            from ..rv.kernels import gp_predict

            jitter = float(theta_obs.get("jitter", jnp.asarray(0.0)))
            var = np.asarray(t["σ_rv"]) ** 2 + jitter**2
            kernel = obs.gaussian_process(theta_obs)
            gp_mean, _ = gp_predict(
                kernel, epochs, jnp.asarray(resid_map), jnp.asarray(var),
                epochs,
            )
            nonkep = nonkep + np.asarray(gp_mean)
            resid_map = resid_map - np.asarray(gp_mean)

        phase = np.mod((t["epoch"] - tp_map) / P_map, 1.0)
        ax.errorbar(phase, t["rv"] - nonkep, yerr=t["σ_rv"], fmt="o", ms=3,
                    zorder=5, label=obs.name, color=f"C{k + 1}")
        ax_res.errorbar(phase, resid_map, yerr=t["σ_rv"], fmt="o", ms=3,
                        zorder=5, color=f"C{k + 1}")

    # ---- posterior Keplerian draws folded on the MAP ephemeris --------
    orbits, masses = _sample_orbits(model, chain, planet.name, n_draws)
    ts = jnp.linspace(tp_map, tp_map + P_map, 300)
    for orbit, m in zip(orbits, masses):
        sol = orbitsolve(orbit, ts)
        rv = np.asarray(radvel(sol, m)) if m else np.asarray(radvel(sol))
        phase = np.mod((np.asarray(ts) - tp_map) / P_map, 1.0)
        order = np.argsort(phase)
        ax.plot(phase[order], rv[order], color="C0", alpha=0.08, lw=0.8)
    ax_res.axhline(0.0, color="0.6", lw=0.8)
    ax.set_ylabel("RV [m/s]")
    ax_res.set_ylabel("residual [m/s]")
    ax_res.set_xlabel("orbital phase")
    if rv_obs:
        ax.legend(fontsize=8)
    return axs
