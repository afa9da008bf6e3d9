"""G23H composite absolute-astrometry likelihood.

TPU-native equivalent of `/root/reference/src/likelihoods/g23h.jl`
(`G23HObs`, the reference's flagship ~3000-line likelihood): a joint
model of the G23H catalog channels

  1-2   Hipparcos-epoch proper motion        (per-scan BINARYS sim + LSQ)
  3-4   Hip->DR3 positional proper motion
  5-6   Gaia DR2 proper motion               (per-scan sim + LSQ)
  7-8   DR3-DR2 scaled positional PM
  9-10  Gaia DR3 proper motion               (per-scan sim + LSQ)
  11    UEVA (RUWE / astrometric excess noise) with the cube-root
        transform, single-star calibration (paper Eqs. D.8/D.9), the
        change-of-variables Jacobian, and DR3/DR32 covariance deflation
plus the Hipparcos IAD residual channel (offset+trend nuisances) and
the Gaia RV-variability channel (non-central chi^2 on the catalog RV
scatter, Chance et al. 2022).

All per-scan loops are vectorized; the 5-parameter refits are
differentiable QR solves; per-sample channel math is fixed-shape jnp.

Per-sample epoch-selection marginalization (`transit_priorities` /
`transits_dr2`, `g23h.jl:749-836,1089-1095`) is implemented as weight
masks in the LSQ normal equations (SURVEY.md section 7 "Hard parts"):
instead of mutating table shapes per sample, each scan row carries a
multiplicity weight in {0, 1, 2} computed from the sampled continuous
priorities — weight 0 drops the scan, weight 2 models a
doubly-downlinked DR2 bright-star transit. The DR2<->DR3 covariance
uses the reference's exact treatment when the central-position columns
are present: matrix-sqrt cross block `K = rho sqrt(S_dr2) sqrt(S_dr3)'`
(`g23h.jl:1561`) and the deflation-adjusted position propagation
`dS_dr32 = Tr ((d^2-1) S_pos_dr3 - (d-1)(S_cross + S_cross')) Tr'`
(`g23h.jl:1390-1445`); otherwise it falls back to the catalog-rho
diagonal approximation.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import gammaln, logsumexp

from ..constants import J2000_MJD, JULIAN_YEAR_DAYS, MJUP2MSOL
from ..likelihoods.utils import take_epochs
from ..model.params import Params, hasproperty
from ..model.variables import AbstractObs, SystemObservationContext
from ..orbits import AbsoluteVisualOrbit, orbitsolve, radvel
from .fitting import fit_5param
from .gaia import GaiaCatalogFitObs
from .hipparcos import HipparcosIADObs
from .scanlaw import GAIA_AGIS_SPAN_DR2, GAIA_AGIS_SPAN_DR3
from .skypath import hippacentre_combined, skypath_perturbations_linear

_CHANNELS = [
    "ra_hip", "dec_hip", "ra_hg", "dec_hg", "ra_dr2", "dec_dr2",
    "ra_dr32", "dec_dr32", "ra_dr3", "dec_dr3", "ueva_dr3",
]


def noncentral_chi2_logpdf(x, df, nc, n_terms: int = 64):
    """log pdf of the noncentral chi-squared via the Poisson-mixture
    series (differentiable; used by the Gaia RV channel)."""
    j = jnp.arange(n_terms)
    # Poisson(nc/2) weights
    log_w = -nc / 2 + j * jnp.log(jnp.maximum(nc / 2, 1e-300)) - gammaln(j + 1)
    k = df + 2 * j
    log_chi2 = (
        (k / 2 - 1) * jnp.log(jnp.maximum(x, 1e-300))
        - x / 2
        - (k / 2) * math.log(2.0)
        - gammaln(k / 2)
    )
    return logsumexp(log_w + log_chi2)


def _jyear_to_mjd(jy):
    return (jy - 2000.0) * JULIAN_YEAR_DAYS + J2000_MJD


def _sqrt2x2(M):
    """Principal square root of an SPD 2x2 matrix (closed form):
    sqrt(M) = (M + sqrt(det) I) / sqrt(tr + 2 sqrt(det))."""
    s = jnp.sqrt(jnp.maximum(M[0, 0] * M[1, 1] - M[0, 1] * M[1, 0], 0.0))
    t = jnp.sqrt(jnp.maximum(M[0, 0] + M[1, 1] + 2 * s, 1e-300))
    return (M + s * jnp.eye(2)) / t


_REQ_CAT = [
    "pmra_dr3", "pmdec_dr3", "pmra_dr3_error", "pmdec_dr3_error", "pmra_pmdec_dr3",
    "pmra_dr2", "pmdec_dr2", "pmra_dr2_error", "pmdec_dr2_error", "pmra_pmdec_dr2",
    "pmra_dr32", "pmdec_dr32", "pmra_dr32_error", "pmdec_dr32_error", "pmra_pmdec_dr32",
    "epoch_ra_dr3_mjd", "epoch_dec_dr3_mjd", "epoch_ra_dr2_mjd", "epoch_dec_dr2_mjd",
    "astrometric_chi2_al_dr3", "astrometric_n_good_obs_al_dr3",
    "astrometric_matched_transits_dr3",
]


# --------------------------------------------------------------------------
# Per-sample epoch-selection machinery (`g23h.jl:749-836`):
# pools + counts are static (host-side); which epochs fill them is
# sampled via continuous priorities and applied as LSQ weight masks.
# --------------------------------------------------------------------------

class _EpochPools:
    """Static DR2/DR3 selection pools and target counts for one source."""

    def __init__(self):
        self.dr2_pool = np.zeros(0, int)
        self.dr3_win = np.zeros(0, int)
        self.dr3_tail = np.zeros(0, int)
        self.n2_win = 0
        self.n_tail = 0
        self.n_dr2_total = 0
        self.n_dr2_lo = 0
        self.n_dr2_hi = 0
        self.marginalize_dup = False
        self.n_epochs = 0


def _in_gaps(epochs, gaps):
    m = np.zeros(len(epochs), bool)
    for start, stop in gaps:
        m |= (epochs >= start) & (epochs <= stop)
    return m


def _epoch_pools(catalog, gaia_like, gaps_dr2, gaps_dr3, gmag_threshold):
    """Selection pools per release with gap masks and target transit
    counts (`g23h.jl:525-559,738-795`)."""
    p = _EpochPools()
    ep = np.asarray(gaia_like.table["epoch"], float)
    p.n_epochs = len(ep)
    dr2_ok = (
        (ep >= GAIA_AGIS_SPAN_DR2["start_mjd"])
        & (ep <= GAIA_AGIS_SPAN_DR2["stop_mjd"])
        & ~_in_gaps(ep, gaps_dr2)
    )
    dr3_ok = (
        (ep >= GAIA_AGIS_SPAN_DR3["start_mjd"])
        & (ep <= GAIA_AGIS_SPAN_DR3["stop_mjd"])
        & ~_in_gaps(ep, gaps_dr3)
    )
    dr2_stop = GAIA_AGIS_SPAN_DR2["stop_mjd"]
    p.dr2_pool = np.nonzero(dr2_ok)[0]
    p.dr3_win = np.nonzero(dr3_ok & (ep <= dr2_stop))[0]
    p.dr3_tail = np.nonzero(dr3_ok & (ep > dr2_stop))[0]

    n_dr3 = int(catalog["astrometric_matched_transits_dr3"])
    n_pool = len(p.dr3_win) + len(p.dr3_tail)
    if n_pool < n_dr3:
        # degenerate: every usable forecast epoch is selected
        p.n2_win = len(p.dr3_win)
        p.n_tail = len(p.dr3_tail)
    else:
        p.n2_win = int(
            np.clip(
                round(n_dr3 * len(p.dr3_win) / max(n_pool, 1)),
                max(n_dr3 - len(p.dr3_tail), 0),
                min(len(p.dr3_win), n_dr3),
            )
        )
        p.n_tail = n_dr3 - p.n2_win

    # DR2 totals incl. doubly-downlinked bright-star transits
    # (`_g23h_dr2_target_transits`, `g23h.jl:200-220`)
    v = catalog.get("astrometric_matched_observations_dr2", None)
    if v is None or not np.isfinite(v):
        # documented approximation when the DR2 sidecar count is absent:
        # assume the DR2 selection matches the pool size (no duplicates)
        p.n_dr2_total = min(len(p.dr2_pool), max(p.n2_win, 1))
    else:
        p.n_dr2_total = max(int(round(float(v))), 0)
    p.n_dr2_hi = min(p.n_dr2_total, len(p.dr2_pool))
    gmag = catalog.get("phot_g_mean_mag_dr3", np.nan)
    bright = np.isfinite(gmag) and gmag < gmag_threshold
    if bright:
        lo = int(np.ceil(p.n_dr2_total / 2))
        p.n_dr2_lo = int(np.clip(lo, min(1, p.n_dr2_hi), p.n_dr2_hi))
    else:
        p.n_dr2_lo = p.n_dr2_hi
    p.marginalize_dup = p.n_dr2_lo < p.n_dr2_hi
    return p


def _pool_ranks(priorities, pool_idx):
    """0-based descending rank of each pool member's priority."""
    pp = priorities[pool_idx]
    order = jnp.argsort(-pp)
    return jnp.zeros(len(pool_idx), jnp.int32).at[order].set(
        jnp.arange(len(pool_idx), dtype=jnp.int32)
    )


def _dr3_weights(priorities, pools: _EpochPools):
    """DR3 selection weights over the full epoch axis: top-n2_win of the
    DR2-window pool + top-n_tail of the DR3-only tail (`g23h.jl:819-823`)."""
    w = jnp.zeros(pools.n_epochs)
    if len(pools.dr3_win):
        r = _pool_ranks(priorities, pools.dr3_win)
        w = w.at[pools.dr3_win].set((r < pools.n2_win).astype(w.dtype))
    if len(pools.dr3_tail):
        r = _pool_ranks(priorities, pools.dr3_tail)
        w = w.at[pools.dr3_tail].set((r < pools.n_tail).astype(w.dtype))
    return w


def _dr2_weights(priorities, n_distinct, pools: _EpochPools):
    """DR2 multiplicity weights (`_g23h_select_dr2_epochs`,
    `g23h.jl:233-241`): the top-`n_distinct` pool epochs get weight 1,
    and the `n_dr2_total - n_distinct` repeats wrap over the selection
    in priority order — epoch at selection rank r receives
    `n_rep // n_distinct + (r < n_rep % n_distinct)` extra copies."""
    w = jnp.zeros(pools.n_epochs)
    if not len(pools.dr2_pool):
        return w
    r = _pool_ranks(priorities, pools.dr2_pool)
    n_distinct = jnp.maximum(jnp.asarray(n_distinct, jnp.int32), 1)
    n_rep = jnp.maximum(pools.n_dr2_total - n_distinct, 0)
    q = n_rep // n_distinct
    rem = n_rep - q * n_distinct
    mult = jnp.where(r < n_distinct, 1 + q + (r < rem).astype(jnp.int32), 0)
    return w.at[pools.dr2_pool].set(mult.astype(w.dtype))


def _rv_weights(priorities, w_dr3, n_rv, n_astro_sel):
    """RV transits = top-n_rv priorities WITHIN the DR3 selection
    (`g23h.jl:879-897`); all of it when n_rv >= n_astro_sel."""
    if n_rv >= n_astro_sel:
        return w_dr3
    masked = jnp.where(w_dr3 > 0, priorities, -jnp.inf)
    order = jnp.argsort(-masked)
    ranks = jnp.zeros(len(masked), jnp.int32).at[order].set(
        jnp.arange(len(masked), dtype=jnp.int32)
    )
    return jnp.where((ranks < n_rv) & (w_dr3 > 0), 1.0, 0.0)


def _build_auto_variables(catalog, pools, hip_like, ueva_mode, include_iad,
                          include_rv, freeze_epochs, seed):
    """Default observation variables (`g23h.jl:687-905`): UEVA
    calibration priors from the catalog sigma fields (population-median
    constants if absent or ueva_mode none), fluxratio passthrough,
    transit priorities, duplicate-count marginalization, IAD nuisances,
    and the per-transit RV uncertainty prior."""
    from ..distributions import LogNormal, LogUniform, Normal, Uniform, truncated
    from ..model.variables import IIDVector

    v = {}
    has_sig = all(
        np.isfinite(catalog.get(k, np.nan))
        for k in ("sig_AL", "sig_AL_sigma", "sig_att_radec",
                  "sig_att_radec_sigma", "sig_cal", "sig_cal_sigma")
    )
    if ueva_mode == "none" or not has_sig:
        # inert placeholders / population medians (`g23h.jl:695-722`)
        v["σ_AL"] = 0.132
        v["σ_att"] = 0.0779
        v["σ_calib"] = 0.0795
    else:
        v["σ_AL"] = truncated(
            Normal(catalog["sig_AL"], catalog["sig_AL_sigma"]),
            lower=1e-6, upper=10.0)
        v["σ_att"] = truncated(
            Normal(catalog["sig_att_radec"], catalog["sig_att_radec_sigma"]),
            lower=1e-6, upper=10.0)
        v["σ_calib"] = truncated(
            Normal(catalog["sig_cal"], catalog["sig_cal_sigma"]),
            lower=1e-6, upper=10.0)

    def _fr(sys, obs):
        return sys.fluxratio if hasproperty(sys, "fluxratio") else jnp.asarray(0.0)

    def _frh(sys, obs):
        return (
            sys.fluxratio_hip
            if hasproperty(sys, "fluxratio_hip")
            else jnp.asarray(0.0)
        )

    v["fluxratio"] = _fr
    v["fluxratio_hip"] = _frh

    if freeze_epochs:
        rng = np.random.default_rng(seed)
        v["transit_priorities"] = rng.standard_normal(pools.n_epochs)
        if pools.marginalize_dup:
            v["u_dup_dr2"] = float(rng.uniform())
    else:
        v["transit_priorities"] = IIDVector(Normal(0.0, 1.0), pools.n_epochs)
        if pools.marginalize_dup:
            v["u_dup_dr2"] = Uniform(0.0, 1.0)

    if include_iad and hip_like is not None:
        pm_ra = float(hip_like.hip_sol["pm_ra"])
        pm_de = float(hip_like.hip_sol["pm_de"])
        v["hip_iad_jitter"] = LogUniform(0.001, 100.0)
        v["iad_Δra"] = Uniform(-1000.0, 1000.0)
        v["iad_Δdec"] = Uniform(-1000.0, 1000.0)
        v["iad_Δplx"] = Uniform(-10.0, 10.0)
        v["iad_Δpmra"] = Uniform(-1000.0, 1000.0)
        v["iad_Δpmdec"] = Uniform(-1000.0, 1000.0)
        v["iad_pmra"] = lambda sys, obs, _p=pm_ra: _p + obs["iad_Δpmra"]
        v["iad_pmdec"] = lambda sys, obs, _p=pm_de: _p + obs["iad_Δpmdec"]

    if (
        include_rv
        and np.isfinite(catalog.get("rv_ln_uncert_dr3", np.nan))
        and np.isfinite(catalog.get("rv_ln_uncert_err_dr3", np.nan))
    ):
        v["σ_rv_per_transit"] = LogNormal(
            catalog["rv_ln_uncert_dr3"], catalog["rv_ln_uncert_err_dr3"]
        )
    return v


class G23HObs(AbstractObs):
    """G23H composite likelihood.

    Parameters:
      catalog: dict of G23H catalog fields for one source. Hip channels
        are enabled when `pmra_hip`/... are present; UEVA per
        `ueva_mode`; RV per `include_rv` + `radial_velocity_error`.
      hip_like: HipparcosIADObs (required for the Hip channels).
      gaia_like: GaiaCatalogFitObs whose scan table spans the DR2+DR3
        windows (design matrices are rebuilt against each release's
        reference epochs internally).
      ueva_mode: "RUWE" (default), "EAN", or "none".
      include_iad / include_rv: toggle those channels.

    Observation variables: σ_att, σ_AL, σ_calib (UEVA calibration),
    fluxratio / fluxratio_hip (arrays over planets), and — when
    include_iad — iad_Δra, iad_Δdec, iad_pmra, iad_pmdec, iad_Δplx,
    hip_iad_jitter; when include_rv — σ_rv_per_transit [km/s].
    """

    def __init__(
        self,
        *,
        catalog: dict,
        gaia_like: GaiaCatalogFitObs,
        hip_like: HipparcosIADObs | None = None,
        ueva_mode: str = "RUWE",
        include_iad: bool = True,
        include_rv: bool = True,
        variables=None,
        name="G23H",
        marginalize_epochs: bool = True,
        freeze_epochs: bool = False,
        gaps_dr2=(),
        gaps_dr3=(),
        dr2_dup_gmag_threshold: float = 6.5,
        epoch_rng_seed: int = 0,
    ):
        pools = _epoch_pools(
            catalog, gaia_like, gaps_dr2, gaps_dr3, dr2_dup_gmag_threshold
        )
        if variables is None and marginalize_epochs:
            variables = _build_auto_variables(
                catalog, pools, hip_like, ueva_mode,
                include_iad and hip_like is not None, include_rv,
                freeze_epochs, epoch_rng_seed,
            )
        super().__init__(variables=variables, name=name)
        self.pools = pools
        missing = [k for k in _REQ_CAT if k not in catalog]
        if missing:
            raise ValueError(f"G23H catalog row missing {missing}")
        def _coerce_scalar(v):
            # integer dtypes (incl. np.int64 gaia_source_id, 19 digits
            # > 2^53) must go to Python int, not float
            if np.ndim(v) != 0 or isinstance(v, (int, str)):
                return v
            if np.issubdtype(np.asarray(v).dtype, np.integer):
                return int(np.asarray(v))
            return float(np.asarray(v))

        self.catalog = {k: _coerce_scalar(v) for k, v in catalog.items()}
        self.gaia_like = gaia_like
        self.hip_like = hip_like
        self.ueva_mode = ueva_mode
        self.include_iad = include_iad and hip_like is not None
        self.has_hip = hip_like is not None and "pmra_hip" in catalog
        self.include_rv = include_rv and "radial_velocity_error" in catalog

        # active channels (`like.table.kind`)
        kinds = []
        if self.has_hip:
            kinds += ["ra_hip", "dec_hip", "ra_hg", "dec_hg"]
        kinds += ["ra_dr2", "dec_dr2", "ra_dr32", "dec_dr32", "ra_dr3", "dec_dr3"]
        if ueva_mode != "none":
            kinds += ["ueva_dr3"]
        self.kinds = kinds

        gt = gaia_like.table
        ep = gt["epoch"]
        self._dr3_sel = np.nonzero(
            (ep >= GAIA_AGIS_SPAN_DR3["start_mjd"]) & (ep <= GAIA_AGIS_SPAN_DR3["stop_mjd"])
        )[0]
        self._dr2_sel = np.nonzero(
            (ep >= GAIA_AGIS_SPAN_DR2["start_mjd"]) & (ep <= GAIA_AGIS_SPAN_DR2["stop_mjd"])
        )[0]
        if len(self._dr3_sel) < 6 or len(self._dr2_sel) < 6:
            raise ValueError("gaia scan table does not cover the DR2/DR3 windows")

        from .fitting import prepare_A_5param

        def prep(sel, ref_ra, ref_dec):
            return prepare_A_5param(
                ep[sel], gt["cosphi"][sel], gt["sinphi"][sel],
                gt["parallaxFactorAlongScan"][sel], ref_ra, ref_dec,
            )

        self.A5_dr3 = prep(
            self._dr3_sel, self.catalog["epoch_ra_dr3_mjd"], self.catalog["epoch_dec_dr3_mjd"]
        )
        self.A5_dr2 = prep(
            self._dr2_sel, self.catalog["epoch_ra_dr2_mjd"], self.catalog["epoch_dec_dr2_mjd"]
        )
        # full-pool design matrices for the weight-masked per-sample
        # selections (rows outside a sample's selection get weight 0)
        all_rows = np.arange(len(ep))
        self.A5_dr3_full = prep(
            all_rows, self.catalog["epoch_ra_dr3_mjd"], self.catalog["epoch_dec_dr3_mjd"]
        )
        self.A5_dr2_full = prep(
            all_rows, self.catalog["epoch_ra_dr2_mjd"], self.catalog["epoch_dec_dr2_mjd"]
        )

        # epoch registration: hip scans then gaia scans
        n_hip = len(hip_like.table["epoch"]) if hip_like is not None else 0
        self.n_hip = n_hip
        self.n_gaia = len(ep)
        self.table = {
            "epoch": np.concatenate(
                ([hip_like.table["epoch"]] if hip_like is not None else [])
                + [ep]
            )
        }

        # gaia dof (`g23h.jl:1703`)
        self.gaia_n_dof = 5 if int(self.catalog.get("astrometric_params_solved_dr3", 31)) == 31 else 6

    @property
    def epochs(self):
        return self.table["epoch"]

    # ------------------------------------------------------------------
    def _fluxratio(self, theta_obs, key, i):
        if isinstance(theta_obs, Params) and key in theta_obs:
            fr = theta_obs[key]
            return fr if jnp.ndim(fr) == 0 else fr[i]
        return jnp.asarray(0.0)

    def _propagate_astrom(self, orbit, epoch_ra, epoch_dec, theta):
        if isinstance(orbit, AbsoluteVisualOrbit):
            sol_ra = orbitsolve(orbit, jnp.asarray(epoch_ra))
            sol_dec = orbitsolve(orbit, jnp.asarray(epoch_dec))
            t1 = max(epoch_ra, epoch_dec)
            dt = 100.0
            sol = sol_ra if epoch_ra >= epoch_dec else sol_dec
            sol2 = orbitsolve(orbit, jnp.asarray(t1 + dt))
            lt = (sol2.compensated.t_em_days - sol.compensated.t_em_days - dt) / dt
            return (
                sol_ra.compensated.ra2,
                sol_dec.compensated.dec2,
                sol_ra.compensated.pmra2 + lt * sol.compensated.pmra2,
                sol_dec.compensated.pmdec2 + lt * sol.compensated.pmdec2,
            )
        return jnp.asarray(0.0), jnp.asarray(0.0), theta.pmra, theta.pmdec

    # ------------------------------------------------------------------
    def simulate(self, ctx: SystemObservationContext):
        theta = ctx.theta_system
        theta_obs = ctx.theta_obs
        cat = self.catalog
        pnames = list(theta.planets.keys())
        n_p = len(pnames)
        masses = [
            theta.planets[p].mass * MJUP2MSOL if hasproperty(theta.planets[p], "mass") else jnp.asarray(0.0)
            for p in pnames
        ]
        sigma_att = theta_obs.get("σ_att", jnp.asarray(0.1)) if isinstance(theta_obs, Params) else jnp.asarray(0.1)
        sigma_AL = theta_obs.get("σ_AL", jnp.asarray(0.1)) if isinstance(theta_obs, Params) else jnp.asarray(0.1)
        sigma_calib = theta_obs.get("σ_calib", jnp.asarray(0.1)) if isinstance(theta_obs, Params) else jnp.asarray(0.1)
        sigma_formal = jnp.sqrt(sigma_att**2 + sigma_AL**2)

        gt = self.gaia_like.table
        absolute = isinstance(ctx.orbits[0], AbsoluteVisualOrbit) if n_p else False

        # ---- per-sample epoch-selection weights -------------------------
        # (`transit_priorities` -> weight masks; `g23h.jl:749-836`)
        use_marg = (
            isinstance(theta_obs, Params)
            and "transit_priorities" in theta_obs
            and getattr(self, "pools", None) is not None
        )
        if use_marg:
            pr = jnp.asarray(theta_obs["transit_priorities"])
            # selection is piecewise-constant in the priorities: gradients
            # flow only through the prior (as in the reference, where
            # ForwardDiff sees constant integer selections)
            pr = jax.lax.stop_gradient(pr)
            w_dr3 = _dr3_weights(pr, self.pools)
            if self.pools.marginalize_dup and "u_dup_dr2" in theta_obs:
                u = jax.lax.stop_gradient(theta_obs["u_dup_dr2"])
                lo, hi = self.pools.n_dr2_lo, self.pools.n_dr2_hi
                n_distinct = jnp.minimum(
                    lo + jnp.floor(u * (hi - lo + 1)).astype(jnp.int32), hi
                )
            else:
                n_distinct = jnp.asarray(self.pools.n_dr2_hi, jnp.int32)
            w_dr2 = _dr2_weights(pr, n_distinct, self.pools)
            n_dr3_modeled = self.pools.n2_win + self.pools.n_tail
        else:
            pr = None
            w_dr3 = w_dr2 = None
            n_dr3_modeled = len(self._dr3_sel)

        # ---- photocentre perturbations over the FULL gaia table ---------
        d_a = jnp.zeros(self.n_gaia)
        d_d = jnp.zeros(self.n_gaia)
        for i in range(n_p):
            sol_g = take_epochs(ctx.solutions[i], ctx.epoch_start + self.n_hip, self.n_gaia)
            da, dd = skypath_perturbations_linear(
                sol_g, ctx.orbits[i], masses[i], self._fluxratio(theta_obs, "fluxratio", i)
            )
            active = jnp.where(masses[i] != 0, 1.0, 0.0)
            d_a = d_a + active * da
            d_d = d_d + active * dd

        # ---- DR3 window -------------------------------------------------
        sel3 = self._dr3_sel
        if use_marg:
            out3 = fit_5param(
                self.A5_dr3_full,
                jnp.asarray(gt["cosphi"]), jnp.asarray(gt["sinphi"]),
                d_a, d_d, sigma=sigma_formal, include_chi2=True,
                weights=w_dr3, n_rows=n_dr3_modeled,
            )
        else:
            out3 = fit_5param(
                self.A5_dr3,
                jnp.asarray(gt["cosphi"][sel3]),
                jnp.asarray(gt["sinphi"][sel3]),
                d_a[sel3], d_d[sel3], sigma=sigma_formal, include_chi2=True,
            )
        da3, dd3, dpmra3, dpmdec3, _ = out3["parameters"]
        ra30, dec30, pmra30, pmdec30 = self._propagate_astrom(
            ctx.orbits[0] if n_p else None,
            cat["epoch_ra_dr3_mjd"], cat["epoch_dec_dr3_mjd"], theta,
        ) if n_p else (jnp.asarray(0.0), jnp.asarray(0.0), theta.pmra, theta.pmdec)
        mu_dr3 = jnp.stack([pmra30 + dpmra3, pmdec30 + dpmdec3])

        # ---- DR2 window ---------------------------------------------------
        sel2 = self._dr2_sel
        if use_marg:
            out2 = fit_5param(
                self.A5_dr2_full,
                jnp.asarray(gt["cosphi"]), jnp.asarray(gt["sinphi"]),
                d_a, d_d, weights=w_dr2,
            )
        else:
            out2 = fit_5param(
                self.A5_dr2,
                jnp.asarray(gt["cosphi"][sel2]),
                jnp.asarray(gt["sinphi"][sel2]),
                d_a[sel2], d_d[sel2],
            )
        da2, dd2, dpmra2, dpmdec2, _ = out2["parameters"]
        ra20, dec20, pmra20, pmdec20 = self._propagate_astrom(
            ctx.orbits[0] if n_p else None,
            cat["epoch_ra_dr2_mjd"], cat["epoch_dec_dr2_mjd"], theta,
        ) if n_p else (jnp.asarray(0.0), jnp.asarray(0.0), theta.pmra, theta.pmdec)
        mu_dr2 = jnp.stack([pmra20 + dpmra2, pmdec20 + dpmdec2])

        # ---- Hipparcos -------------------------------------------------
        deg2mas = 3600.0 * 1000.0
        sigma_infl_hip = None
        iad_resid = None
        if self.has_hip:
            ht = self.hip_like.table
            n_hip = self.n_hip
            sols_h = [take_epochs(s, ctx.epoch_start, n_hip) for s in ctx.solutions]
            frh = [
                jnp.where(masses[i] != 0, self._fluxratio(theta_obs, "fluxratio_hip", i), 0.0)
                for i in range(n_p)
            ]
            cphi = jnp.asarray(ht["cosphi"])
            sphi = jnp.asarray(ht["sinphi"])
            d_ah, d_dh, sigma_infl_hip = hippacentre_combined(
                cphi, sphi, sols_h, masses, frh
            )
            resid_term = jnp.asarray(ht["res"]) if self.include_iad else 0.0
            outh = fit_5param(
                jnp.asarray(self.hip_like.A_prepared_5),
                cphi, sphi, d_ah, d_dh,
                residuals=resid_term,
                sigma=jnp.asarray(ht["sres"]),
            )
            dah, ddh, dpmrah, dpmdech, _ = outh["parameters"]
            # BINARYS-predicted PM bias magnitude for the epistemic
            # catalog-covariance inflation (`g23h.jl:2189`)
            hip_bias_pm_sq = dpmrah**2 + dpmdech**2
            rah0, dech0, pmrah0, pmdech0 = self._propagate_astrom(
                ctx.orbits[0] if n_p else None,
                _jyear_to_mjd(cat["epoch_ra_hip"]), _jyear_to_mjd(cat["epoch_dec_hip"]), theta,
            ) if n_p else (jnp.asarray(0.0), jnp.asarray(0.0), theta.pmra, theta.pmdec)
            mu_h = jnp.stack([pmrah0 + dpmrah, pmdech0 + dpmdech])

            # HG channel
            if absolute:
                d_ra_prop = (ra30 - rah0) * deg2mas * jnp.cos(jnp.deg2rad((dec30 + dech0) / 2))
                d_dec_prop = (dec30 - dech0) * deg2mas
                pmra_hg = (da3 - dah + d_ra_prop) / (
                    cat["epoch_ra_dr3_mjd"] - _jyear_to_mjd(cat["epoch_ra_hip"])
                ) * JULIAN_YEAR_DAYS
                pmdec_hg = (dd3 - ddh + d_dec_prop) / (
                    cat["epoch_dec_dr3_mjd"] - _jyear_to_mjd(cat["epoch_dec_hip"])
                ) * JULIAN_YEAR_DAYS
            else:
                pmra_hg = (da3 - dah) / (
                    cat["epoch_ra_dr3_mjd"] - _jyear_to_mjd(cat["epoch_ra_hip"])
                ) * JULIAN_YEAR_DAYS + theta.pmra
                pmdec_hg = (dd3 - ddh) / (
                    cat["epoch_dec_dr3_mjd"] - _jyear_to_mjd(cat["epoch_dec_hip"])
                ) * JULIAN_YEAR_DAYS + theta.pmdec
            mu_hg = jnp.stack([pmra_hg, pmdec_hg])

            # IAD residual channel (offset + trend nuisances,
            # `g23h.jl:2222-2280`)
            if self.include_iad:
                iad_dra = theta_obs.get("iad_Δra", jnp.asarray(0.0))
                iad_ddec = theta_obs.get("iad_Δdec", jnp.asarray(0.0))
                iad_pmra = theta_obs.get("iad_pmra", jnp.asarray(0.0))
                iad_pmdec = theta_obs.get("iad_pmdec", jnp.asarray(0.0))
                iad_dplx = theta_obs.get("iad_Δplx", jnp.asarray(0.0))
                plx_ep = self.hip_like.hip_sol["plx"] + iad_dplx
                from ..constants import HIPPARCOS_EPOCH_MJD

                dt_yr = jnp.asarray(
                    (ht["epoch"] - HIPPARCOS_EPOCH_MJD) / JULIAN_YEAR_DAYS
                )
                a_off = (iad_dra - dah) + dt_yr * (iad_pmra - dpmrah) + d_ah
                d_off = (iad_ddec - ddh) + dt_yr * (iad_pmdec - dpmdech) + d_dh
                proj_model = (
                    a_off * cphi + d_off * sphi
                    + plx_ep * jnp.asarray(ht["parallaxFactorAlongScan"])
                )
                iad_resid = jnp.abs(jnp.asarray(ht["proj_meas_alongscan"]) - proj_model)
        else:
            mu_h = jnp.zeros(2)
            mu_hg = jnp.zeros(2)
            hip_bias_pm_sq = jnp.asarray(0.0)

        # ---- DR3-DR2 ---------------------------------------------------
        if absolute:
            d_ra_prop = (ra30 - ra20) * deg2mas * jnp.cos(jnp.deg2rad((dec30 + dec20) / 2))
            d_dec_prop = (dec30 - dec20) * deg2mas
            pmra_dr32 = (da3 - da2 + d_ra_prop) / (
                cat["epoch_ra_dr3_mjd"] - cat["epoch_ra_dr2_mjd"]
            ) * JULIAN_YEAR_DAYS
            pmdec_dr32 = (dd3 - dd2 + d_dec_prop) / (
                cat["epoch_dec_dr3_mjd"] - cat["epoch_dec_dr2_mjd"]
            ) * JULIAN_YEAR_DAYS
        else:
            pmra_dr32 = (da3 - da2) / (
                cat["epoch_ra_dr3_mjd"] - cat["epoch_ra_dr2_mjd"]
            ) * JULIAN_YEAR_DAYS + theta.pmra
            pmdec_dr32 = (dd3 - dd2) / (
                cat["epoch_dec_dr3_mjd"] - cat["epoch_dec_dr2_mjd"]
            ) * JULIAN_YEAR_DAYS + theta.pmdec
        mu_dr32 = jnp.stack([pmra_dr32, pmdec_dr32])

        # ---- UEVA (`g23h.jl:2344-2440`) -------------------------------
        N = cat["astrometric_n_good_obs_al_dr3"]
        N_FoV = cat["astrometric_matched_transits_dr3"]
        N_AL = N / N_FoV
        dof = self.gaia_n_dof
        if self.ueva_mode == "EAN":
            UEVA_gaia = cat["astrometric_excess_noise_dr3"] ** 2 + sigma_att**2 + sigma_AL**2
        elif self.ueva_mode == "RUWE":
            ruwe = cat["ruwe_dr3"]
            u0 = 1.0 / ruwe * math.sqrt(cat["astrometric_chi2_al_dr3"] / (N - dof))
            UEVA_gaia = (ruwe * u0) ** 2 * sigma_formal**2
        else:
            UEVA_gaia = sigma_formal**2

        mu_single = (N_AL / (N - dof)) * ((N_FoV - dof) * sigma_calib**2 + N_FoV * sigma_AL**2)
        sigma_single = jnp.sqrt(
            2 * N_AL / (N - dof) ** 2
            * (
                N_AL * (N_FoV - dof) * sigma_calib**4
                + N_FoV * sigma_AL**4
                + 2 * N_FoV * sigma_AL**2 * sigma_calib**2
            )
        )
        mu_1_3 = UEVA_gaia ** (1.0 / 3.0)
        UEVA_unc = sigma_single * mu_single ** (-2.0 / 3.0) / 3.0

        chi2_scaled = out3["chi_squared_astro"] * N_AL * (N_FoV / n_dr3_modeled)
        UEVA_model_raw = chi2_scaled * sigma_formal**2 / (N - dof)
        UEVA_model_1 = chi2_scaled * sigma_formal**2 / (N_AL * N_FoV - dof)
        UEVA_model = jnp.cbrt(UEVA_model_1 + mu_single)

        deflation_raw = jnp.sqrt(mu_single / UEVA_gaia)
        deflation = (
            jnp.asarray(1.0)
            if self.ueva_mode == "none"
            else jnp.minimum(deflation_raw, 1.0)
        )

        return {
            "mu_h": mu_h,
            "mu_hg": mu_hg,
            "mu_dr2": mu_dr2,
            "mu_dr32": mu_dr32,
            "mu_dr3": mu_dr3,
            "UEVA_model": UEVA_model,
            "UEVA_unc": UEVA_unc,
            "mu_1_3": mu_1_3,
            "deflation": deflation,
            "sigma_infl_hip": sigma_infl_hip,
            "iad_resid": iad_resid,
            "sigma_att": sigma_att,
            "sigma_AL": sigma_AL,
            "absolute": absolute,
            "hip_bias_pm_sq": hip_bias_pm_sq,
            "priorities": pr,
            "w_dr3": w_dr3,
            "n_astro_sel": n_dr3_modeled,
        }

    # ------------------------------------------------------------------
    def _block(self, prefix):
        cat = self.catalog
        s1 = cat[f"pmra_{prefix}_error"]
        s2 = cat[f"pmdec_{prefix}_error"]
        rho = cat[f"pmra_pmdec_{prefix}"]
        return np.array([[s1**2, rho * s1 * s2], [rho * s1 * s2, s2**2]])

    def ln_like(self, ctx: SystemObservationContext):
        cat = self.catalog
        theta_obs = ctx.theta_obs
        sim = self.simulate(ctx)
        ll = jnp.asarray(0.0)

        # UEVA change-of-variables Jacobian (`g23h.jl:1271-1296`)
        if "ueva_dr3" in self.kinds:
            if self.ueva_mode == "EAN" and cat.get("astrometric_excess_noise_dr3", 0.0) > 0:
                ll = ll - 2 * jnp.log(sim["mu_1_3"])
            elif self.ueva_mode == "RUWE":
                ll = ll + (1.0 / 3.0) * jnp.log(sim["sigma_att"] ** 2 + sim["sigma_AL"] ** 2)

        # IAD residual channel (`g23h.jl:1301-1326`)
        if self.include_iad and sim["iad_resid"] is not None:
            ht = self.hip_like.table
            jit = theta_obs.get("hip_iad_jitter", jnp.asarray(0.0))
            s = jnp.asarray(ht["sres_renorm"]) * sim["sigma_infl_hip"]
            var = s * s + jit * jit
            lp = (
                -0.5 * (sim["iad_resid"] ** 2 / var + jnp.log(var))
                - 0.5 * math.log(2 * math.pi)
            )
            keep = jnp.asarray(~ht["reject"])
            ll = ll + jnp.sum(jnp.where(keep, lp, 0.0))

        # RV-variability channel (`g23h.jl:1348-1388`); needs RV model at
        # the gaia scan epochs
        if self.include_rv and isinstance(theta_obs, Params) and "σ_rv_per_transit" in theta_obs:
            eps_cat = cat["radial_velocity_error"]
            N_rv = int(cat.get("rv_nb_transits", 8))
            sigma_rv = theta_obs["σ_rv_per_transit"]
            pnames = list(ctx.theta_system.planets.keys())
            rv_model = jnp.zeros(self.n_gaia)
            for i, p in enumerate(pnames):
                theta_p = ctx.theta_system.planets[p]
                if not hasproperty(theta_p, "mass"):
                    continue
                sol_g = take_epochs(ctx.solutions[i], ctx.epoch_start + self.n_hip, self.n_gaia)
                rv_model = rv_model + radvel(sol_g, theta_p.mass * MJUP2MSOL) / 1e3
            if sim["priorities"] is not None:
                # transits_rv = top-n_rv priorities within the DR3
                # selection (`g23h.jl:879-897`), as a weight mask
                w_rv = _rv_weights(
                    sim["priorities"], sim["w_dr3"], N_rv, sim["n_astro_sel"]
                )
                n_eff = jnp.maximum(jnp.sum(w_rv), 2.0)
                mean_rv = jnp.sum(w_rv * rv_model) / n_eff
                sample_var = jnp.sum(w_rv * (rv_model - mean_rv) ** 2) / (
                    n_eff - 1.0
                )
            else:
                rv_sel = rv_model[: min(N_rv, self.n_gaia)]
                sample_var = jnp.var(rv_sel, ddof=1)
            s_cat_sq = (2 * N_rv / math.pi) * (eps_cat**2 - 0.113**2)
            ncp = (N_rv - 1) * sample_var / sigma_rv**2
            xi_sq = (N_rv - 1) * s_cat_sq / sigma_rv**2
            ll_rv = noncentral_chi2_logpdf(xi_sq, N_rv - 1, ncp) - 2 * jnp.log(sigma_rv)
            ll = ll + jnp.where(jnp.isfinite(ll_rv), ll_rv, -jnp.inf)

        mv, dv, Ssel = self._assemble(ctx, sim)
        L = jnp.linalg.cholesky(Ssel)
        import jax.scipy.linalg as jsl

        alpha = jsl.solve_triangular(L, mv - dv, lower=True)
        ll_cat = (
            -0.5 * jnp.sum(alpha**2)
            - jnp.sum(jnp.log(jnp.diagonal(L)))
            - 0.5 * mv.shape[0] * math.log(2 * math.pi)
        )
        ll = ll + jnp.where(jnp.isfinite(ll_cat), ll_cat, -jnp.inf)
        return ll

    def _assemble(self, ctx, sim):
        """Selected channel model/data vectors + joint covariance
        (`g23h.jl:1390-1568`), shared by ln_like, debug_pulls, and the
        correlated generator."""
        cat = self.catalog
        # ---- joint catalog channels -----------------------------------
        mu_h, mu_hg = sim["mu_h"], sim["mu_hg"]
        if sim["absolute"] and self.has_hip:
            nl = jnp.asarray([cat.get("nonlinear_dpmra", 0.0), cat.get("nonlinear_dpmdec", 0.0)])
            mu_hg = mu_hg + nl
            mu_h = mu_h + 2 * nl

        model_vec = jnp.concatenate(
            [mu_h, mu_hg, sim["mu_dr2"], sim["mu_dr32"], sim["mu_dr3"],
             jnp.reshape(sim["UEVA_model"], (1,))]
        )
        data_parts = []
        if self.has_hip:
            data_parts += [cat["pmra_hip"], cat["pmdec_hip"], cat["pmra_hg"], cat["pmdec_hg"]]
        else:
            data_parts += [0.0, 0.0, 0.0, 0.0]
        data_parts += [
            cat["pmra_dr2"], cat["pmdec_dr2"],
            cat["pmra_dr32"], cat["pmdec_dr32"],
            cat["pmra_dr3"], cat["pmdec_dr3"],
        ]
        data_vec = jnp.concatenate(
            [jnp.asarray(data_parts, dtype=model_vec.dtype), jnp.reshape(sim["mu_1_3"], (1,))]
        )

        # covariance: block diagonal + DR2/DR3 cross + deflation
        S = jnp.zeros((11, 11))
        d = sim["deflation"]
        if self.has_hip:
            # BINARYS f_sigma inflation of the Hipparcos catalog block
            # plus the epistemic bias term eps^2 |dpm_h|^2 I
            # (`g23h.jl:1466-1518`; eps_binarys = 0.3)
            Sh = jnp.asarray(self._block("hip"))
            if sim["sigma_infl_hip"] is not None:
                keep = jnp.asarray(~self.hip_like.table["reject"])
                n_used = jnp.maximum(jnp.sum(keep), 1.0)
                infl_sq = (
                    jnp.sum(jnp.where(keep, sim["sigma_infl_hip"] ** 2, 0.0))
                    / n_used
                )
                Sh = Sh * infl_sq
            Sh = Sh + (0.3**2 * sim["hip_bias_pm_sq"]) * jnp.eye(2)
            S = S.at[0:2, 0:2].set(Sh)
            S = S.at[2:4, 2:4].set(jnp.asarray(self._block("hg")))
        else:
            S = S.at[0:2, 0:2].set(jnp.eye(2))
            S = S.at[2:4, 2:4].set(jnp.eye(2))
        S = S.at[4:6, 4:6].set(jnp.asarray(self._block("dr2")))

        # DR3-DR2 scaled-position block: exact deflation-adjusted
        # central-position propagation when the catalog carries the
        # central-epoch position covariances (`g23h.jl:1390-1445`),
        # otherwise the d^2 diagonal approximation.
        B32 = jnp.asarray(self._block("dr32"))
        rho_23 = float(cat.get("rho_dr2_dr3", 0.0))
        central_keys = (
            "ra_error_central_dr3", "dec_error_central_dr3",
            "ra_dec_corr_central_dr3", "ra_error_central_dr2",
            "dec_error_central_dr2", "ra_dec_corr_central_dr2",
        )
        have_central = all(
            np.isfinite(cat.get(k, np.nan)) for k in central_keys
        )
        if have_central:
            sr3 = cat["ra_error_central_dr3"]
            sd3 = cat["dec_error_central_dr3"]
            r3 = cat["ra_dec_corr_central_dr3"]
            sr2 = cat["ra_error_central_dr2"]
            sd2 = cat["dec_error_central_dr2"]
            r2 = cat["ra_dec_corr_central_dr2"]
            S_pos3 = jnp.asarray(
                [[sr3**2, r3 * sr3 * sd3], [r3 * sr3 * sd3, sd3**2]]
            )
            S_cross = rho_23 * jnp.asarray(
                [[sr3 * sr2, r3 * sr3 * sd2], [r2 * sd3 * sr2, sd3 * sd2]]
            )
            dS_pos = (d**2 - 1) * S_pos3 - (d - 1) * (S_cross + S_cross.T)
            dt_ra = (
                cat["epoch_ra_dr3_mjd"] - cat["epoch_ra_dr2_mjd"]
            ) / JULIAN_YEAR_DAYS
            dt_dec = (
                cat["epoch_dec_dr3_mjd"] - cat["epoch_dec_dr2_mjd"]
            ) / JULIAN_YEAR_DAYS
            Tr = jnp.asarray([[1.0 / dt_ra, 0.0], [0.0, 1.0 / dt_dec]])
            B32 = B32 + Tr @ dS_pos @ Tr.T
        else:
            B32 = B32 * d**2
        S = S.at[6:8, 6:8].set(B32)
        B3d = jnp.asarray(self._block("dr3")) * d**2
        S = S.at[8:10, 8:10].set(B3d)
        S = S.at[10, 10].set(sim["UEVA_unc"] ** 2)
        if rho_23 != 0.0:
            # K = rho sqrt(S_dr2) sqrt(S_dr3_deflated)' (`g23h.jl:1561`)
            K = rho_23 * _sqrt2x2(jnp.asarray(self._block("dr2"))) @ _sqrt2x2(B3d).T
            S = S.at[4:6, 8:10].set(K)
            S = S.at[8:10, 4:6].set(K.T)

        idx = np.asarray([_CHANNELS.index(k) for k in self.kinds])
        return model_vec[idx], data_vec[idx], S[np.ix_(idx, idx)]

    def debug_pulls(self, ctx):
        """Per-channel pulls (catalog - model)/sigma and whitened pulls
        L^-1 (catalog - model) — the reference's `_G23H_DEBUG_PULLS`
        hook (`g23h.jl:96-100,1570-1586`). At truth, over noise
        realizations of the catalog, both are ~ N(0, 1)."""
        sim = self.simulate(ctx)
        mv, dv, Ssel = self._assemble(ctx, sim)
        L = jnp.linalg.cholesky(Ssel)
        import jax.scipy.linalg as jsl

        return {
            "kinds": list(self.kinds),
            "pull": (dv - mv) / jnp.sqrt(jnp.diagonal(Ssel)),
            "whitened": jsl.solve_triangular(L, dv - mv, lower=True),
        }

    def pointwise_ln_like(self, ctx):
        return jnp.reshape(self.ln_like(ctx), (1,))

    def likeobj_from_epoch_subset(self, idx):
        import copy

        new = copy.copy(self)
        new.kinds = [self.kinds[i] for i in np.atleast_1d(idx)]
        return new

    def generate_from_params(self, ctx, rng, add_noise=False):
        """Synthesize catalog channel values from the model
        (`g23h.jl:2582-3002`, channel-value subset). With add_noise the
        PM channels are drawn JOINTLY from the model's selected channel
        covariance (including the DR2/DR3 cross block and deflation), so
        whitened pulls at truth are exactly ~ N(0, I)."""
        sim = self.simulate(ctx)
        mv, _, Ssel = self._assemble(ctx, sim)
        mv = np.asarray(mv)
        Ssel = np.asarray(Ssel)
        pm_rows = [i for i, k in enumerate(self.kinds) if k != "ueva_dr3"]
        draw = mv.copy()
        if add_noise and pm_rows:
            Spm = Ssel[np.ix_(pm_rows, pm_rows)]
            Lpm = np.linalg.cholesky(Spm)
            draw[pm_rows] = mv[pm_rows] + Lpm @ rng.standard_normal(len(pm_rows))
        cat = dict(self.catalog)
        for i, k in enumerate(self.kinds):
            if k == "ueva_dr3":
                continue
            cat[f"pm{k}"] = float(draw[i])  # kinds are 'ra_dr3' etc.
        import copy

        new = copy.copy(self)
        new.catalog = cat
        return new


G23HLikelihood = G23HObs
