"""Gaia Non-Single-Star (NSS) catalog integration.

TPU-native equivalent of `/root/reference/src/nss.jl`: convert Gaia DR3
NSS orbital solutions (Thiele-Innes elements) into model starting
points and pseudo-chains for warm-starting fits.

Network queries are not available in this environment; pass a local NSS
row (dict) or a cached CSV. The TAP query construction is retained for
environments with access.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from .constants import KEPLER_YEAR_DAYS, jd2mjd
from .orbits import thiele_innes_to_campbell

# DR3 NSS t_periastron values are JD offsets from this reference
# (`nss.jl:101`)
NSS_DR3_T_PERIASTRON_REF_JD = 2457389.0

NSS_TAP_QUERY = (
    "SELECT * FROM gaiadr3.nss_two_body_orbit WHERE source_id = {gaia_id}"
)


def query_nss(gaia_id=None, *, cache_csv=None, row=None) -> dict:
    """Load an NSS two-body-orbit solution.

    Provide `row` (a dict of NSS columns) or `cache_csv` (a locally
    cached TAP result); with only `gaia_id` the live TAP path
    (`net.query_nss_tap`, mirroring `nss.jl:29-93`) is used, which
    itself falls back to the on-disk response cache so previously
    fetched solutions work offline.
    """
    if row is not None:
        return dict(row)
    if cache_csv is not None:
        import pandas as pd

        df = pd.read_csv(cache_csv)
        if gaia_id is not None and "source_id" in df.columns:
            df = df[df["source_id"] == gaia_id]
        if len(df) == 0:
            raise KeyError(f"source {gaia_id} not found in {cache_csv}")
        return {k: df.iloc[0][k] for k in df.columns}
    if gaia_id is not None:
        from .net import query_nss_tap

        try:
            return query_nss_tap(gaia_id)
        except Exception as e:
            raise RuntimeError(
                f"NSS TAP query for {gaia_id} failed ({e!r}); in "
                "offline environments pass row= (dict of NSS columns) "
                "or cache_csv=."
            ) from e
    raise RuntimeError(
        "Pass gaia_id=, row= (dict of NSS columns), or cache_csv=."
    )


def ti_to_campbell(A, B, F, G):
    """(A,B,F,G) [mas] -> (i, Omega, omega, alpha_mas), angles in
    [0, 2pi) (`_ti_to_campbell`, `nss.jl:495-545`)."""
    alpha, i, omega, Omega = thiele_innes_to_campbell(
        jnp.asarray(A), jnp.asarray(B), jnp.asarray(F), jnp.asarray(G)
    )
    return (
        float(i),
        float(jnp.mod(Omega, 2 * math.pi)),
        float(jnp.mod(omega, 2 * math.pi)),
        float(alpha),
    )


def nss_to_starting_point(nss_sol: dict, model, planet_key="b") -> dict:
    """Map an NSS solution onto the model's free parameters
    (`nss_to_starting_point`, `nss.jl:134-...`).

    Returns a dict of flat parameter names -> values covering whatever
    could be mapped (e, tp, TI constants or Campbell angles + a, plx,
    UniformCircular x/y pairs).
    """
    names = model.parameter_names
    prefix = f"{planet_key}_"
    mapped = {}

    def has(n):
        return prefix + n in names

    def put(n, v):
        mapped[prefix + n] = float(v)

    def put_angle(n, val):
        if has(n):
            put(n, val)
            return True
        if has(n + "x") and has(n + "y"):
            put(n + "x", math.cos(val))
            put(n + "y", math.sin(val))
            return True
        return False

    def get(key):
        v = nss_sol.get(key)
        if v is None:
            return None
        v = float(v)
        return v if np.isfinite(v) else None

    e = get("eccentricity")
    if e is not None and has("e"):
        put("e", e)

    period_days = get("period")
    tp_off = get("t_periastron")
    tp_mjd = (
        jd2mjd(tp_off + NSS_DR3_T_PERIASTRON_REF_JD) if tp_off is not None else None
    )
    if tp_mjd is not None and has("tp"):
        put("tp", tp_mjd)

    A = get("a_thiele_innes")
    B = get("b_thiele_innes")
    F = get("f_thiele_innes")
    G = get("g_thiele_innes")
    plx = get("parallax")
    if plx is not None and "plx" in names:
        mapped["plx"] = plx

    if None not in (A, B, F, G):
        if all(has(k) for k in ("A", "B", "F", "G")):
            put("A", A)
            put("B", B)
            put("F", F)
            put("G", G)
        else:
            inc, Omega, omega, alpha = ti_to_campbell(A, B, F, G)
            if has("i"):
                put("i", inc)
            put_angle("Omega", Omega)
            put_angle("omega", omega)
            if has("a") and plx is not None:
                put("a", alpha / plx)
            elif has("a") and period_days is not None:
                # fall back to Kepler's third law with the median prior mass
                key = jax.random.PRNGKey(42)
                draws = model.sample_priors(key, 512)
                nts = jax.vmap(model.arr2nt)(draws)
                M_med = float(jnp.median(nts.M)) if "M" in nts else 1.0
                put("a", (M_med * (period_days / KEPLER_YEAR_DAYS) ** 2) ** (1 / 3))
    return mapped


def initialize_from_nss(model, nss_sol: dict, planet_key="b", key=None,
                        verbosity=1):
    """Warm-start: map the NSS solution, fill remaining free params from
    priors, and set `model.starting_points`
    (`initialize_from_nss!`, `nss.jl:298-...`)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    mapped = nss_to_starting_point(nss_sol, model, planet_key)
    names = model.parameter_names
    draws = np.array(model.sample_priors(key, 64))
    for k, v in mapped.items():
        draws[:, names.index(k)] = v
    pts_t = np.asarray(jax.vmap(model.link)(jnp.asarray(draws)))
    lps = np.asarray(jax.jit(jax.vmap(model._ln_post_py))(jnp.asarray(pts_t)))
    good = np.isfinite(lps)
    if verbosity >= 1:
        print(
            f"initialize_from_nss: mapped {sorted(mapped)}; "
            f"{good.sum()}/64 finite starting points"
        )
    model.starting_points = pts_t[good] if good.any() else pts_t
    return mapped


def nss_to_model_chain(nss_sol: dict, model, *, n_draws=10_000, planet_key="b",
                       key=None):
    """Pseudo-chain from the NSS solution's Gaussian uncertainties
    (`nss_to_model_chain`, `nss.jl:364-471`): draw TI constants (and e,
    period, tp) from their quoted errors, convert each to Campbell
    parameters, and return named arrays."""
    if key is None:
        key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    cols = {}

    def draw(name):
        mu = float(nss_sol[name])
        sig = float(nss_sol.get(name + "_error", 0.0) or 0.0)
        return mu + sig * rng.standard_normal(n_draws)

    A = draw("a_thiele_innes")
    B = draw("b_thiele_innes")
    F = draw("f_thiele_innes")
    G = draw("g_thiele_innes")
    alpha, inc, omega, Omega = thiele_innes_to_campbell(
        jnp.asarray(A), jnp.asarray(B), jnp.asarray(F), jnp.asarray(G)
    )
    cols[f"{planet_key}_i"] = np.asarray(inc)
    cols[f"{planet_key}_omega"] = np.mod(np.asarray(omega), 2 * math.pi)
    cols[f"{planet_key}_Omega"] = np.mod(np.asarray(Omega), 2 * math.pi)
    if "parallax" in nss_sol:
        plx = draw("parallax")
        cols["plx"] = plx
        cols[f"{planet_key}_a"] = np.asarray(alpha) / plx
    if "eccentricity" in nss_sol:
        cols[f"{planet_key}_e"] = draw("eccentricity")
    if "period" in nss_sol:
        cols[f"{planet_key}_P"] = draw("period")
    if "t_periastron" in nss_sol:
        cols[f"{planet_key}_tp"] = jd2mjd(
            draw("t_periastron") + NSS_DR3_T_PERIASTRON_REF_JD
        )
    from .chains import Chains

    return Chains({k: v[None, :] for k, v in cols.items()}, {}, {"sampler": "nss_pseudo"})
