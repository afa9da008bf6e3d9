"""Per-datatype posterior plot panels.

Matplotlib equivalents of the reference's per-datatype Makie plots
(`/root/reference/ext/OctofitterMakieExt/`): astromtimeplot,
physorbitplot, masspostplot, hgcaplot (pmaplot with data overlay),
hipparcosplot, gaiatimeplot, skytrackplot, dotplot, completenessplot,
absastromplot. Every panel draws posterior orbit/model draws over the
observed data, host-side, from a fitted Chains object.
"""

from __future__ import annotations

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from ..constants import MJUP2MSOL  # noqa: E402
from ..model.params import Params  # noqa: E402
from ..model.variables import SystemObservationContext  # noqa: E402
from ..orbits import (  # noqa: E402
    decoff,
    orbitsolve,
    period,
    pmdec,
    pmra,
    posx,
    posy,
    projectedseparation,
    raoff,
)
from ._util import savable as _savable  # noqa: E402
from .octoplot import _sample_orbits  # noqa: E402


def _flat_draws(model, chain, n_draws, rng=None):
    rng = rng or np.random.default_rng(0)
    total = chain.n_chains * chain.n_draws
    idx = rng.choice(total, size=min(n_draws, total), replace=False)
    names = model.parameter_names
    return np.stack([chain[n].reshape(-1) for n in names], axis=-1)[idx]


def _sys_ctx(model, obs, flat_row):
    """Build a SystemObservationContext for one posterior draw."""
    nt = model.arr2nt(jnp.asarray(flat_row))
    orbits = model.construct_orbits(nt)
    epochs = jnp.asarray(model._all_epochs)
    sols = tuple(orbitsolve(o, epochs) for o in orbits)
    theta_obs = nt.observations.get(obs.normalized_name, Params())
    return SystemObservationContext(
        theta_system=nt,
        theta_obs=theta_obs,
        orbits=orbits,
        solutions=sols,
        epoch_start=model._epoch_start.get(id(obs), 0),
    )


def _data_timespan(model, pad_frac=0.1, fallback=(56000.0, 59000.0)):
    tmin, tmax = np.inf, -np.inf
    for obs in model.system.observations + [
        o for p in model.system.planets for o in p.observations
    ]:
        ep = getattr(obs, "epochs", None)
        if ep is not None and len(ep):
            tmin = min(tmin, float(np.min(ep)))
            tmax = max(tmax, float(np.max(ep)))
    if not np.isfinite(tmin):
        return fallback
    pad = (tmax - tmin) * pad_frac
    return tmin - pad, tmax + pad


# --------------------------------------------------------------------------
@_savable
def astromtimeplot(model, chain, axs=None, n_draws=50, planet_name=None):
    """Separation and position angle vs time (`astromtimeplot.jl`)."""
    from ..likelihoods.relastrom import PlanetRelAstromObs

    if axs is None:
        _, axs = plt.subplots(2, 1, figsize=(8, 6), sharex=True)
    planet = (
        model.system.planets[0]
        if planet_name is None
        else next(p for p in model.system.planets if p.name == planet_name)
    )
    tmin, tmax = _data_timespan(model)
    ts = jnp.linspace(tmin, tmax, 400)
    orbits, _ = _sample_orbits(model, chain, planet.name, n_draws)
    for orbit in orbits:
        sol = orbitsolve(orbit, ts)
        ra = np.asarray(raoff(sol))
        dec = np.asarray(decoff(sol))
        sep = np.hypot(ra, dec)
        pa = np.degrees(np.mod(np.arctan2(ra, dec), 2 * np.pi))
        axs[0].plot(np.asarray(ts), sep, color="C0", alpha=0.08, lw=0.8)
        axs[1].plot(np.asarray(ts), pa, color="C0", alpha=0.08, lw=0.8)
    for obs in planet.observations:
        if isinstance(obs, PlanetRelAstromObs):
            t = obs.table
            if obs.seppa:
                sep, pa = t["sep"], np.degrees(t["pa"])
                dsep, dpa = t["σ_sep"], np.degrees(t["σ_pa"])
            else:
                sep = np.hypot(t["ra"], t["dec"])
                pa = np.degrees(np.mod(np.arctan2(t["ra"], t["dec"]), 2 * np.pi))
                dsep = np.hypot(t["σ_ra"], t["σ_dec"])
                dpa = np.degrees(dsep / np.maximum(sep, 1e-9))
            axs[0].errorbar(t["epoch"], sep, yerr=dsep, fmt="o", ms=3,
                            color="k", zorder=5)
            axs[1].errorbar(t["epoch"], pa, yerr=dpa, fmt="o", ms=3,
                            color="k", zorder=5)
    axs[0].set_ylabel("separation [mas]")
    axs[1].set_ylabel("PA [deg]")
    axs[1].set_xlabel("epoch [MJD]")
    return axs


@_savable
def physorbitplot(model, chain, ax=None, n_draws=50, planet_name=None):
    """Physical orbit in AU (`show_physical_orbit`, octoplot.jl)."""
    if ax is None:
        _, ax = plt.subplots(figsize=(6, 6))
    planet = (
        model.system.planets[0]
        if planet_name is None
        else next(p for p in model.system.planets if p.name == planet_name)
    )
    orbits, _ = _sample_orbits(model, chain, planet.name, n_draws)
    for orbit in orbits:
        P = float(period(orbit))
        ts = jnp.linspace(float(orbit.tp), float(orbit.tp) + P, 200)
        sol = orbitsolve(orbit, ts)
        ax.plot(np.asarray(posx(sol)), np.asarray(posy(sol)),
                color="C0", alpha=0.08, lw=0.8)
    ax.plot(0, 0, marker="*", ms=14, color="goldenrod", zorder=6)
    ax.set_xlabel("x [AU]")
    ax.set_ylabel("y [AU]")
    ax.set_aspect("equal")
    return ax


@_savable
def masspostplot(model, chain, axs=None, n_draws=2000):
    """Mass posterior histogram + mass vs semi-major axis
    (`masspostplot.jl`)."""
    planets = [
        p.name for p in model.system.planets
        if f"{p.name}_mass" in chain.data
    ]
    if axs is None:
        _, axs = plt.subplots(1, 2, figsize=(9, 4))
    for i, name in enumerate(planets):
        m = chain[f"{name}_mass"].reshape(-1)
        axs[0].hist(m, bins=50, histtype="step", density=True,
                    label=name, color=f"C{i}")
        a_col = f"{name}_a"
        if a_col in chain.data:
            a = chain[a_col].reshape(-1)
            k = min(n_draws, len(m))
            axs[1].scatter(a[:k], m[:k], s=2, alpha=0.2, color=f"C{i}")
    axs[0].set_xlabel(r"mass [M$_{\rm jup}$]")
    axs[0].set_ylabel("posterior density")
    if planets:
        axs[0].legend()
    axs[1].set_xlabel("semi-major axis [AU]")
    axs[1].set_ylabel(r"mass [M$_{\rm jup}$]")
    return axs


@_savable
def dotplot(model, chain, ax=None, n_draws=4000, planet_name=None,
            mode="separation", epoch=None):
    """Mass vs separation/period scatter with marginal histograms
    (`dotplot.jl`)."""
    planet = (
        model.system.planets[0]
        if planet_name is None
        else next(p for p in model.system.planets if p.name == planet_name)
    )
    name = planet.name
    m = chain[f"{name}_mass"].reshape(-1) if f"{name}_mass" in chain.data else None
    a = chain[f"{name}_a"].reshape(-1)
    if mode == "period":
        M = chain["M"].reshape(-1) if "M" in chain.data else np.ones_like(a)
        x = np.sqrt(a**3 / M) * 365.25
        xlabel = "period [days]"
    else:
        x = a
        xlabel = "semi-major axis [AU]"
    y = m if m is not None else chain[f"{name}_e"].reshape(-1)
    ylabel = r"mass [M$_{\rm jup}$]" if m is not None else "eccentricity"
    k = min(n_draws, len(x))

    if ax is None:
        fig = plt.figure(figsize=(6, 6))
        gs = fig.add_gridspec(2, 2, width_ratios=[4, 1], height_ratios=[1, 4],
                              hspace=0.05, wspace=0.05)
        ax = fig.add_subplot(gs[1, 0])
        ax_hx = fig.add_subplot(gs[0, 0], sharex=ax)
        ax_hy = fig.add_subplot(gs[1, 1], sharey=ax)
        ax_hx.hist(x[:k], bins=50, color="C0")
        ax_hy.hist(y[:k], bins=50, orientation="horizontal", color="C0")
        ax_hx.axis("off")
        ax_hy.axis("off")
    ax.scatter(x[:k], y[:k], s=2, alpha=0.2, color="C0")
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    return ax


@_savable
def hgcaplot(model, chain, axs=None, n_draws=50):
    """Proper-motion vs time with the HGCA measurements overlaid
    (`hgcaplot.jl` / `pmaplot.jl`)."""
    from ..likelihoods.hgca import HGCAInstantaneousObs
    from ..constants import JULIAN_YEAR_DAYS, J2000_MJD

    if axs is None:
        _, axs = plt.subplots(2, 1, figsize=(8, 6), sharex=True)
    tmin, tmax = _data_timespan(model, fallback=(47500.0, 58500.0))
    tmin = min(tmin, 47500.0)
    ts = jnp.linspace(tmin, tmax, 400)
    pmra0 = (
        np.median(chain["pmra"].reshape(-1)) if "pmra" in chain.data else 0.0
    )
    pmdec0 = (
        np.median(chain["pmdec"].reshape(-1)) if "pmdec" in chain.data else 0.0
    )
    for p in model.system.planets:
        orbits, masses = _sample_orbits(model, chain, p.name, n_draws)
        for orbit, m in zip(orbits, masses):
            sol = orbitsolve(orbit, ts)
            axs[0].plot(np.asarray(ts), pmra0 + np.asarray(pmra(sol, m)),
                        color="C0", alpha=0.08, lw=0.8)
            axs[1].plot(np.asarray(ts), pmdec0 + np.asarray(pmdec(sol, m)),
                        color="C0", alpha=0.08, lw=0.8)

    def _jy2mjd(jy):
        return (jy - 2000.0) * JULIAN_YEAR_DAYS + J2000_MJD

    for obs in model.system.observations:
        cat = getattr(obs, "catalog", None) or getattr(obs, "hgca", None)
        if not isinstance(cat, dict) or "pmra_hip" not in cat:
            continue
        for pfx, ep_key in (
            ("hip", "epoch_ra_hip"), ("hg", None), ("dr3", "epoch_ra_dr3_mjd"),
            ("gaia", "epoch_ra_gaia"),
        ):
            if f"pmra_{pfx}" not in cat:
                continue
            if ep_key is None:
                e_h = cat.get("epoch_ra_hip")
                e_g = cat.get("epoch_ra_gaia", cat.get("epoch_ra_dr3_mjd"))
                if e_h is None or e_g is None:
                    continue
                e_h = _jy2mjd(e_h) if e_h < 3000 else e_h
                e_g = _jy2mjd(e_g) if e_g < 3000 else e_g
                ep = 0.5 * (e_h + e_g)
            else:
                ep = cat.get(ep_key)
                if ep is None:
                    continue
                ep = _jy2mjd(ep) if ep < 3000 else ep
            for ax_i, comp in ((0, "pmra"), (1, "pmdec")):
                axs[ax_i].errorbar(
                    [ep], [cat[f"{comp}_{pfx}"]],
                    yerr=[cat.get(f"{comp}_{pfx}_error", 0.0)],
                    fmt="s", ms=5, color="crimson", zorder=6,
                )
    axs[0].set_ylabel(r"$\mu_{\alpha*}$ [mas/yr]")
    axs[1].set_ylabel(r"$\mu_{\delta}$ [mas/yr]")
    axs[1].set_xlabel("epoch [MJD]")
    return axs


@_savable
def hipparcosplot(model, chain, ax=None, n_draws=30):
    """Hipparcos IAD abscissa residuals vs time with posterior model
    along-scan perturbations (`hipparcosplot.jl`)."""
    from ..astrom.hipparcos import HipparcosIADObs
    from ..astrom.skypath import hippacentre_combined
    from ..likelihoods.utils import take_epochs

    if ax is None:
        _, ax = plt.subplots(figsize=(8, 4))
    hips = [
        o for o in model.system.observations if isinstance(o, HipparcosIADObs)
    ]
    hips += [
        o.hip_like
        for o in model.system.observations
        if getattr(o, "hip_like", None) is not None
    ]
    if not hips:
        raise ValueError("model has no Hipparcos IAD observation")
    hip = hips[0]
    t = hip.table
    keep = ~t["reject"]
    ax.errorbar(t["epoch"][keep], t["res"][keep], yerr=t["sres"][keep],
                fmt="o", ms=3, color="k", zorder=5, label="IAD abscissae")

    flat = _flat_draws(model, chain, n_draws)
    n_hip = len(t["epoch"])
    cphi = jnp.asarray(t["cosphi"])
    sphi = jnp.asarray(t["sinphi"])
    for row in flat:
        nt = model.arr2nt(jnp.asarray(row))
        orbits = model.construct_orbits(nt)
        sols_h = [
            orbitsolve(o, jnp.asarray(t["epoch"])) for o in orbits
        ]
        masses = [
            float(nt.planets[p.name].mass) * MJUP2MSOL
            if "mass" in nt.planets[p.name] else 0.0
            for p in model.system.planets
        ]
        frh = [jnp.asarray(0.0)] * len(orbits)
        d_a, d_d, _ = hippacentre_combined(cphi, sphi, sols_h, masses, frh)
        proj = np.asarray(d_a * cphi + d_d * sphi)
        order = np.argsort(t["epoch"])
        ax.plot(t["epoch"][order], proj[order], color="C0", alpha=0.15, lw=0.8)
    ax.set_xlabel("epoch [MJD]")
    ax.set_ylabel("along-scan abscissa [mas]")
    return ax


@_savable
def gaiatimeplot(model, chain, ax=None, n_draws=30):
    """Gaia DR4 along-scan residuals vs time with posterior model curves
    (`gaiatimeplot.jl`)."""
    from ..astrom.gaia_dr4 import GaiaDR4AstromObs
    from ..astrom.skypath import skypath_perturbations_linear

    if ax is None:
        _, ax = plt.subplots(figsize=(8, 4))
    obs_list = [
        o for o in model.system.observations if isinstance(o, GaiaDR4AstromObs)
    ]
    if not obs_list:
        raise ValueError("model has no GaiaDR4AstromObs")
    obs = obs_list[0]
    t = obs.table
    ax.errorbar(
        t["epoch"], t["centroid_pos_al"], yerr=t["centroid_pos_error_al"],
        fmt="o", ms=3, color="k", zorder=5,
    )
    flat = _flat_draws(model, chain, n_draws)
    cphi = jnp.asarray(np.cos(t["scan_pos_angle"]))
    sphi = jnp.asarray(np.sin(t["scan_pos_angle"]))
    for row in flat:
        nt = model.arr2nt(jnp.asarray(row))
        orbits = model.construct_orbits(nt)
        d_a = jnp.zeros(len(t["epoch"]))
        d_d = jnp.zeros(len(t["epoch"]))
        for i, p in enumerate(model.system.planets):
            sol = orbitsolve(orbits[i], jnp.asarray(t["epoch"]))
            m = (
                float(nt.planets[p.name].mass) * MJUP2MSOL
                if "mass" in nt.planets[p.name] else 0.0
            )
            da, dd = skypath_perturbations_linear(sol, orbits[i], m, 0.0)
            d_a = d_a + da
            d_d = d_d + dd
        proj = np.asarray(d_a * cphi + d_d * sphi)
        order = np.argsort(t["epoch"])
        ax.plot(t["epoch"][order], proj[order], color="C0", alpha=0.15, lw=0.8)
    ax.set_xlabel("epoch [MJD]")
    ax.set_ylabel("along-scan position [mas]")
    return ax


@_savable
def skytrackplot(model, chain, ax=None, sample_idx=None, t_range=None,
                 keplerian_mult=1.0):
    """On-sky photocentre track (pm + parallax + Keplerian reflex) for
    one posterior sample (`skytrackplot.jl`)."""
    from ..astrom.ephemeris import earth_position_au

    if ax is None:
        _, ax = plt.subplots(figsize=(7, 5))
    lp = chain.internals.get("logpost")
    total = chain.n_chains * chain.n_draws
    if sample_idx is None:
        sample_idx = int(np.argmax(lp.reshape(-1))) if lp is not None else 0
    names = model.parameter_names
    row = np.asarray([chain[n].reshape(-1)[sample_idx] for n in names])
    nt = model.arr2nt(jnp.asarray(row))
    orbits = model.construct_orbits(nt)

    tmin, tmax = t_range if t_range is not None else _data_timespan(model)
    ts = np.linspace(tmin, tmax, 600)
    dt_yr = (ts - ts[0]) / 365.25
    pmra0 = float(nt["pmra"]) if "pmra" in nt else 0.0
    pmdec0 = float(nt["pmdec"]) if "pmdec" in nt else 0.0
    plx = float(nt["plx"]) if "plx" in nt else 0.0

    # parallax factors from the analytic Earth ephemeris
    ra = np.deg2rad(float(getattr(model.system, "ra_deg", 0.0) or 0.0))
    dec = np.deg2rad(float(getattr(model.system, "dec_deg", 0.0) or 0.0))
    epos = earth_position_au(ts)
    ex, ey, ez = epos["x"], epos["y"], epos["z"]
    f_ra = (ex * np.sin(ra) - ey * np.cos(ra))
    f_dec = (
        ex * np.cos(ra) * np.sin(dec)
        + ey * np.sin(ra) * np.sin(dec)
        - ez * np.cos(dec)
    )
    dra = pmra0 * dt_yr + plx * f_ra
    ddec = pmdec0 * dt_yr + plx * f_dec
    for i, p in enumerate(model.system.planets):
        m = (
            float(nt.planets[p.name].mass) * MJUP2MSOL
            if "mass" in nt.planets[p.name] else 0.0
        )
        if m == 0.0:
            continue
        sol = orbitsolve(orbits[i], jnp.asarray(ts))
        dra = dra + keplerian_mult * np.asarray(raoff(sol, m))
        ddec = ddec + keplerian_mult * np.asarray(decoff(sol, m))
    ax.plot(dra, ddec, lw=1.0, color="C0")
    ax.scatter(dra[0], ddec[0], marker="^", color="C2", zorder=5, label="start")
    ax.set_xlabel(r"$\Delta\alpha^*$ [mas]")
    ax.set_ylabel(r"$\Delta\delta$ [mas]")
    ax.invert_xaxis()
    ax.set_aspect("equal")
    return ax


@_savable
def absastromplot(model, chain, ax=None, n_draws=30):
    """G23H absolute-astrometry channel pulls: posterior distribution of
    (catalog - model)/sigma per channel (`absastromplot.jl` intent,
    rendered as a pull box plot via the debug_pulls hook)."""
    from ..astrom.g23h import G23HObs

    if ax is None:
        _, ax = plt.subplots(figsize=(8, 4))
    g23hs = [o for o in model.system.observations if isinstance(o, G23HObs)]
    if not g23hs:
        raise ValueError("model has no G23HObs")
    obs = g23hs[0]
    flat = _flat_draws(model, chain, n_draws)
    pulls = []
    for row in flat:
        ctx = _sys_ctx(model, obs, row)
        out = obs.debug_pulls(ctx)
        pulls.append(np.asarray(out["pull"]))
    pulls = np.stack(pulls)  # (n_draws, n_channels)
    kinds = obs.kinds
    ax.axhline(0.0, color="0.6", lw=0.8)
    ax.boxplot(
        [pulls[:, i] for i in range(pulls.shape[1])],
        tick_labels=kinds,
    )
    ax.set_ylabel(r"pull (catalog $-$ model)/$\sigma$")
    ax.tick_params(axis="x", rotation=45)
    return ax


@_savable
def gaiastarplot(model, chain, ax=None, sample_idx=None):
    """Sky-plane star reflex orbit with the Gaia along-scan measurements
    drawn as scan-direction segments, for one posterior sample
    (`gaiastarplot.jl`). Scan data constrain only the along-scan
    coordinate, so each epoch is a line perpendicular to nothing —
    a segment along the scan direction through the measured offset."""
    from ..astrom.gaia_dr4 import GaiaDR4AstromObs

    if ax is None:
        _, ax = plt.subplots(figsize=(6, 6))
    obs_list = [
        o for o in model.system.observations if isinstance(o, GaiaDR4AstromObs)
    ]
    if not obs_list:
        raise ValueError("model has no GaiaDR4AstromObs")
    obs = obs_list[0]
    t = obs.table

    lp = chain.internals.get("logpost")
    if sample_idx is None:
        sample_idx = int(np.argmax(lp.reshape(-1))) if lp is not None else 0
    names = model.parameter_names
    row = np.asarray([chain[n].reshape(-1)[sample_idx] for n in names])
    nt = model.arr2nt(jnp.asarray(row))
    orbits = model.construct_orbits(nt)

    # star reflex orbit over one period of each massive companion
    for i, p in enumerate(model.system.planets):
        m = (
            float(nt.planets[p.name].mass) * MJUP2MSOL
            if "mass" in nt.planets[p.name] else 0.0
        )
        if m == 0.0:
            continue
        P = float(period(orbits[i]))
        ts = jnp.linspace(float(orbits[i].tp), float(orbits[i].tp) + P, 200)
        sol = orbitsolve(orbits[i], ts)
        ax.plot(np.asarray(raoff(sol, m)), np.asarray(decoff(sol, m)),
                color="C0", lw=1.2, label=f"{p.name} reflex")

    # along-scan measurements as scan-direction segments centered on the
    # measured along-scan offset projected onto the sky
    psi = np.asarray(t["scan_pos_angle"])
    al = np.asarray(t["centroid_pos_al"])
    err = np.asarray(t["centroid_pos_error_al"])
    cpsi, spsi = np.cos(psi), np.sin(psi)
    # along-scan unit vector (ra, dec) = (cos psi, sin psi) in our
    # convention; the across-scan coordinate is unconstrained
    x0 = al * cpsi
    y0 = al * spsi
    half = 3 * np.median(err) + 0.5 * np.abs(al).max()
    for k in range(len(al)):
        # the constraint line runs ACROSS scan through the AL offset
        ax.plot(
            [x0[k] - half * -spsi[k], x0[k] + half * -spsi[k]],
            [y0[k] - half * cpsi[k], y0[k] + half * cpsi[k]],
            color="0.7", lw=0.5, zorder=1,
        )
        ax.plot([x0[k]], [y0[k]], marker=".", ms=3, color="k", zorder=5)
    ax.axhline(0, color="grey", ls="--", lw=0.6)
    ax.axvline(0, color="grey", ls="--", lw=0.6)
    ax.set_xlabel(r"$\Delta\alpha^*$ [mas]")
    ax.set_ylabel(r"$\Delta\delta$ [mas]")
    ax.invert_xaxis()
    ax.set_aspect("equal")
    return ax


@_savable
def completenessplot(cmap, ax=None, levels=(0.5, 0.9)):
    """Completeness map heat map + contours (`completenessplot.jl`).

    cmap: analysis.completeness.CompletenessMap.
    """
    if ax is None:
        _, ax = plt.subplots(figsize=(6, 4.5))
    X, Y = np.meshgrid(cmap.separations, cmap.masses)
    pc = ax.pcolormesh(X, Y, cmap.completeness, vmin=0, vmax=1,
                       shading="auto", cmap="viridis")
    try:
        cs = ax.contour(X, Y, cmap.completeness, levels=levels,
                        colors="w", linewidths=1.0)
        ax.clabel(cs, fmt=lambda v: f"{v:.0%}")
    except Exception:
        pass  # degenerate grids (constant map) have no contours
    plt.colorbar(pc, ax=ax, label="completeness")
    ax.set_xlabel("separation [AU]")
    ax.set_ylabel(r"mass [M$_{\rm jup}$]")
    return ax
