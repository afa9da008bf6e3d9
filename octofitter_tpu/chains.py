"""Posterior chain container + convergence diagnostics.

Equivalent of the reference's MCMCChains integration
(`result2mcmcchain` / `mcmcchain2result`,
`/root/reference/src/sampling.jl:551-981`): flat named columns following
the naming contract `var`, `planet_var`, `obsname_var`,
`planet_obsname_var`, an `:internals` section with sampler statistics,
and an `info` metadata dict. Adds rank-normalized split-R̂ and
bulk/tail ESS diagnostics (Vehtari et al. 2021).
"""

from __future__ import annotations

import numpy as np
from scipy.special import ndtri


def _autocovariance_fft(x):
    """Per-chain autocovariance via FFT; x shape (chains, draws)."""
    n = x.shape[1]
    xc = x - x.mean(axis=1, keepdims=True)
    nfft = int(2 ** np.ceil(np.log2(2 * n)))
    f = np.fft.rfft(xc, nfft, axis=1)
    acov = np.fft.irfft(f * np.conj(f), nfft, axis=1)[:, :n].real
    return acov / n


def _rank_normalize(x: np.ndarray) -> np.ndarray:
    """Fractional-rank inverse-normal transform over ALL draws jointly
    (Vehtari et al. 2021 eq. 14): z = Phi^-1((rank - 3/8)/(S + 1/4))."""
    from scipy.stats import rankdata

    flat = x.reshape(-1)
    ranks = rankdata(flat, method="average")
    z = ndtri((ranks - 0.375) / (flat.size + 0.25))
    return z.reshape(x.shape)


def _split_ess_rhat_raw(x: np.ndarray):
    """Split-R̂ and ESS on the values as given; x shape (chains, draws)."""
    x = np.asarray(x, dtype=np.float64)
    m, n = x.shape
    if n < 4:
        return float("nan"), float("nan")
    # split chains in half
    half = n // 2
    xs = np.concatenate([x[:, :half], x[:, half : 2 * half]], axis=0)
    mm, nn = xs.shape
    chain_means = xs.mean(axis=1)
    chain_vars = xs.var(axis=1, ddof=1)
    W = chain_vars.mean()
    B = nn * chain_means.var(ddof=1)
    var_plus = (nn - 1) / nn * W + B / nn
    rhat = np.sqrt(var_plus / W) if W > 0 else float("nan")

    # combined autocovariance (Geyer initial monotone sequence)
    acov = _autocovariance_fft(xs)
    mean_acov = acov.mean(axis=0)
    rho = 1 - (W - mean_acov) / var_plus
    # pair sums
    t_max = (nn // 2) * 2
    pair = rho[:t_max].reshape(-1, 2).sum(axis=1)
    # initial positive + monotone
    pos = pair > 0
    if not pos.all():
        first_neg = np.argmax(~pos)
        pair = pair[:first_neg]
    if len(pair) > 0:
        pair = np.minimum.accumulate(pair)
        tau = -1 + 2 * pair.sum()
    else:
        tau = 1.0
    tau = max(tau, 1.0 / np.log10(nn + 10))
    ess = mm * nn / tau
    return float(ess), float(rhat)


def ess_rhat(x: np.ndarray):
    """Rank-normalized bulk ESS and split-R̂ (Vehtari et al. 2021).

    x shape (chains, draws). Rank-normalization makes the diagnostics
    robust to heavy tails and to chains stuck in minor modes — the
    honest accounting the reference community standard (posterior /
    ArviZ) uses. Constant columns return (nan, nan).
    """
    x = np.asarray(x, dtype=np.float64)
    if not np.all(np.isfinite(x)):
        return float("nan"), float("nan")
    if np.allclose(x, x.reshape(-1)[0]):
        return float("nan"), float("nan")
    z = _rank_normalize(x)
    ess_bulk, rhat_bulk = _split_ess_rhat_raw(z)
    # folded split-R̂ for scale mis-mixing; report max of the two
    zf = _rank_normalize(np.abs(x - np.median(x)))
    _, rhat_folded = _split_ess_rhat_raw(zf)
    rhat = np.nanmax([rhat_bulk, rhat_folded])
    return float(ess_bulk), float(rhat)


def _half_rank_table(S: int) -> np.ndarray:
    """Normal scores for every rank value scipy's average-tie ranking
    can produce on S samples: tie-group averages are always integers or
    half-integers, so ndtri evaluated once at ranks 1, 1.5, 2, …, S
    (index = 2·rank − 2) covers distinct AND tied data exactly."""
    ranks = np.arange(2.0, 2.0 * S + 1.0) / 2.0
    return ndtri((ranks - 0.375) / (S + 0.25))


def _rank_normalize_batch(x: np.ndarray, table=None) -> np.ndarray:
    """Vectorized `_rank_normalize` over the leading axis; x shape
    (P, S). Matches scipy's rankdata(method="average") exactly,
    including tied samples — real sampler output always has ties
    (an MH rejection duplicates the previous draw), and ordinal ranks
    would systematically overstate ESS there. ndtri never runs on the
    data: all possible average ranks are half-integers, looked up in
    the precomputed `table` (see `_half_rank_table`; pass it in to
    amortize across calls). Rows are processed one at a time — the
    (P, S) sort/take temporaries at bench scale (P≈13, S≈2.5e7) blow
    the cache and peak memory otherwise."""
    P, S = x.shape
    if table is None:
        table = _half_rank_table(S)
    distinct_scores = table[::2]  # integer ranks 1..S
    z = np.empty((P, S), dtype=np.float64)
    for p in range(P):
        order = np.argsort(x[p])
        s = x[p, order]
        boundary = np.empty(S, dtype=bool)
        boundary[0] = True
        np.not_equal(s[1:], s[:-1], out=boundary[1:])
        starts = np.flatnonzero(boundary)
        if starts.size == S:  # no ties: ordinal == average ranks
            z[p, order] = distinct_scores
        else:
            ends = np.append(starts[1:], S)
            # 1-based ranks starts+1 .. ends average to
            # (starts+ends+1)/2 → table index starts+ends-1
            z[p, order] = np.repeat(
                table[starts + ends - 1], ends - starts
            )
    return z


def _constant_rows(flat: np.ndarray) -> np.ndarray:
    """Per-row equivalent of `np.allclose(row, row[0])` without the
    full-size temporaries: max |row - row[0]| <= atol + rtol*|row[0]|
    iff both (max - row0) and (row0 - min) satisfy the bound."""
    row0 = flat[:, 0]
    tol = 1e-08 + 1e-05 * np.abs(row0)
    return ((flat.max(axis=1) - row0) <= tol) & ((row0 - flat.min(axis=1)) <= tol)


def _split_ess_rhat_raw_batch(x: np.ndarray, compute_ess: bool = True):
    """Vectorized `_split_ess_rhat_raw` over the leading axis; x shape
    (P, chains, draws). Returns (ess (P,), rhat (P,)).

    Two algebraic savings over looping the scalar path: the combined
    autocovariance uses irfft(mean over chains of |F|²) — by linearity
    of the inverse transform this equals the mean of per-chain
    irfft(|F|²), so ONE inverse FFT per parameter replaces one per
    chain — and `compute_ess=False` (the folded-R̂ pass, which only
    needs W/B) skips the FFT entirely."""
    x = np.asarray(x, dtype=np.float64)
    P, m, n = x.shape
    if n < 4:
        return np.full(P, np.nan), np.full(P, np.nan)
    half = n // 2
    xs = np.concatenate([x[:, :, :half], x[:, :, half : 2 * half]], axis=1)
    _, mm, nn = xs.shape
    chain_means = xs.mean(axis=2)
    chain_vars = xs.var(axis=2, ddof=1)
    W = chain_vars.mean(axis=1)
    B = nn * chain_means.var(axis=1, ddof=1)
    var_plus = (nn - 1) / nn * W + B / nn
    with np.errstate(divide="ignore", invalid="ignore"):
        rhat = np.where(W > 0, np.sqrt(var_plus / W), np.nan)
    if not compute_ess:
        return np.full(P, np.nan), rhat

    # combined autocovariance (Geyer initial monotone sequence),
    # accumulated in chain blocks to bound the FFT working set. Any
    # nfft >= 2*nn gives the identical linear autocovariance; the
    # smallest fast size beats the next power of two.
    from scipy.fft import next_fast_len

    xc = xs - xs.mean(axis=2, keepdims=True)
    nfft = next_fast_len(2 * nn, real=True)
    power = np.zeros((P, nfft // 2 + 1))
    block = max(1, int(2**24 // max(nfft, 1)))
    for i in range(0, mm, block):
        f = np.fft.rfft(xc[:, i : i + block], nfft, axis=2)
        power += (f * np.conj(f)).real.sum(axis=1)
    power /= mm
    mean_acov = np.fft.irfft(power, nfft, axis=1)[:, :nn] / nn
    with np.errstate(divide="ignore", invalid="ignore"):
        rho = 1 - (W[:, None] - mean_acov) / var_plus[:, None]
    t_max = (nn // 2) * 2
    pair = rho[:, :t_max].reshape(P, -1, 2).sum(axis=2)
    T = pair.shape[1]
    pos = pair > 0
    any_neg = ~pos.all(axis=1)
    first_neg = np.where(any_neg, np.argmax(~pos, axis=1), T)
    mask = np.arange(T)[None, :] < first_neg[:, None]
    cummin = np.minimum.accumulate(np.where(mask, pair, np.inf), axis=1)
    tau = -1.0 + 2.0 * np.where(mask, cummin, 0.0).sum(axis=1)
    tau = np.where(first_neg == 0, 1.0, tau)
    tau = np.maximum(tau, 1.0 / np.log10(nn + 10))
    ess = mm * nn / tau
    return ess, rhat


def ess_rhat_batch(x: np.ndarray):
    """Rank-normalized bulk ESS and split-R̂ for every parameter at
    once; x shape (chains, draws, P). Identical accounting to looping
    `ess_rhat` over the last axis (exact, including tied samples),
    but one vectorized pass — the per-parameter python loop dominates
    wall time for the 10⁷-draw chains the TPU samplers produce.
    Returns (ess (P,), rhat (P,)); non-finite or constant parameters
    get (nan, nan)."""
    x = np.asarray(x, dtype=np.float64)
    if x.ndim == 2:
        x = x[:, :, None]
    m, n, P = x.shape
    flat = np.ascontiguousarray(np.moveaxis(x, 2, 0)).reshape(P, -1)
    ok = np.isfinite(flat).all(axis=1) & ~_constant_rows(flat)
    if not ok.any():
        return np.full(P, np.nan), np.full(P, np.nan)
    sub = flat if ok.all() else flat[ok]
    S = sub.shape[1]
    table = _half_rank_table(S)
    z = _rank_normalize_batch(sub, table).reshape(-1, m, n)
    ess_b, rhat_b = _split_ess_rhat_raw_batch(z)
    folded = np.abs(sub - np.median(sub, axis=1, keepdims=True))
    zf = _rank_normalize_batch(folded, table).reshape(-1, m, n)
    _, rhat_f = _split_ess_rhat_raw_batch(zf, compute_ess=False)
    with np.errstate(invalid="ignore"):
        rhat_sub = np.fmax(rhat_b, rhat_f)
    ess = np.full(P, np.nan)
    rhat = np.full(P, np.nan)
    ess[ok] = ess_b
    rhat[ok] = rhat_sub
    return ess, rhat


def _ess_rhat_batch_jax_impl(x, nfft):
    """jnp mirror of `ess_rhat_batch`'s per-row math (rank-normalized
    bulk ESS + max of bulk/folded split-R̂), one fused device program.

    Exact average-tie ranks without host rankdata: after one sort per
    row, each position's tie-group [start, end) is recovered with a
    forward cummax over boundary indices and a reverse cummin over
    next-boundary indices, giving the average 1-based rank
    (start+end+1)/2 — identical to scipy rankdata(method="average") —
    and ndtri runs elementwise on device (cheap there, unlike the
    host where a precomputed table is needed). Degenerate rows
    (non-finite / constant, same test as `_constant_rows`) are
    replaced by arange so the program stays finite, and their outputs
    are restored to NaN at the end.

    Parameters are processed SEQUENTIALLY (`lax.map` over the row
    axis): batching the rank pass across all P rows materializes
    (P, m·n) temporaries that tile-pad up to 11.6× on TPU — measured
    17.1 GB of HBM (OOM on a 16 GB chip) at 8192 chains × 3000 draws
    × 11 params — while one row's temporaries stay ~100-200 MB at any
    chain count. x: (m, n, P); returns (ess (P,), rhat (P,))."""
    import jax
    import jax.numpy as jnp
    from jax.scipy.special import ndtri as jndtri

    m, n, P = x.shape
    dtype = x.dtype
    flat = jnp.moveaxis(x, 2, 0).reshape(P, -1)
    S = flat.shape[1]

    idx = jnp.arange(S, dtype=jnp.int32)

    def rank_normalize(row):
        order = jnp.argsort(row)
        s = row[order]
        boundary = jnp.concatenate(
            [jnp.ones((1,), bool), s[1:] != s[:-1]]
        )
        starts = jax.lax.cummax(jnp.where(boundary, idx, 0), axis=0)
        nxt = jnp.where(boundary, idx, S)
        rev_min = jnp.flip(jax.lax.cummin(jnp.flip(nxt), axis=0))
        ends = jnp.concatenate([rev_min[1:], jnp.full((1,), S, jnp.int32)])
        # Blom score for the average 1-based rank r = k/2, k = starts+
        # ends+1: p = (r - 3/8)/(S + 1/4) = (k - 3/4)/(2S + 1/2). In the
        # sampler's f32 this saturates for near-max ranks once S ≥ 2^23
        # (the bench is 1.2-2.5e7 flat draws): float32(r - 0.375) == r
        # and p rounds to exactly 1.0, so ndtri returns +inf and poisons
        # W/R-hat (measured: every untied parameter NaN at 8192×3000).
        # Evaluate the upper tail symmetrically instead — z = -ndtri(1-p)
        # with 1-p's numerator 2S - k formed in exact int32 arithmetic,
        # so the small complementary probability never cancels.
        k = starts + ends + 1
        upper = k > S
        num = jnp.where(upper, 2 * S - k, k).astype(dtype)
        off = jnp.where(upper, jnp.asarray(1.25, dtype), jnp.asarray(-0.75, dtype))
        p = (num + off) / jnp.asarray(2.0 * S + 0.5, dtype)
        z0 = jndtri(p)
        z_sorted = jnp.where(upper, -z0, z0)
        return jnp.zeros(S, dtype).at[order].set(z_sorted), s

    def split_raw(z, compute_ess):
        zc = z.reshape(m, n)
        half = n // 2
        xs = jnp.concatenate([zc[:, :half], zc[:, half : 2 * half]], axis=0)
        mm, nn = 2 * m, half
        chain_means = xs.mean(axis=1)
        chain_vars = xs.var(axis=1, ddof=1)
        W = chain_vars.mean()
        B = nn * chain_means.var(ddof=1)
        var_plus = (nn - 1) / nn * W + B / nn
        rhat = jnp.where(W > 0, jnp.sqrt(var_plus / W), jnp.nan)
        if not compute_ess:
            return None, rhat
        xc = xs - xs.mean(axis=1, keepdims=True)
        f = jnp.fft.rfft(xc, nfft, axis=1)
        power = (f.real * f.real + f.imag * f.imag).sum(axis=0) / mm
        mean_acov = jnp.fft.irfft(power, nfft)[:nn] / nn
        mean_acov = mean_acov.astype(dtype)
        rho = 1 - (W - mean_acov) / var_plus
        t_max = (nn // 2) * 2
        pair = rho[:t_max].reshape(-1, 2).sum(axis=1)
        T = pair.shape[0]
        pos = pair > 0
        any_neg = ~pos.all()
        first_neg = jnp.where(any_neg, jnp.argmax(~pos), T)
        mask = jnp.arange(T) < first_neg
        cummin = jax.lax.cummin(jnp.where(mask, pair, jnp.inf), axis=0)
        tau = -1.0 + 2.0 * jnp.where(mask, cummin, 0.0).sum()
        tau = jnp.where(first_neg == 0, 1.0, tau)
        tau = jnp.maximum(tau, 1.0 / jnp.log10(nn + 10.0))
        ess = mm * nn / tau
        return ess, rhat

    def one_row(row):
        row0 = row[0]
        tol = 1e-08 + 1e-05 * jnp.abs(row0)
        constant = ((row.max() - row0) <= tol) & ((row0 - row.min()) <= tol)
        okr = jnp.isfinite(row).all() & ~constant
        safe = jnp.where(okr, row, idx.astype(dtype))

        z, s_sorted = rank_normalize(safe)
        ess_b, rhat_b = split_raw(z, True)
        # median from the already-sorted values (matches np.median)
        med = (
            s_sorted[(S - 1) // 2] + s_sorted[S // 2]
        ) * jnp.asarray(0.5, dtype)
        folded = jnp.abs(safe - med)
        zf, _ = rank_normalize(folded)
        _, rhat_f = split_raw(zf, False)
        rhat = jnp.fmax(rhat_b, rhat_f)
        nan = jnp.asarray(jnp.nan, dtype)
        return jnp.where(okr, ess_b, nan), jnp.where(okr, rhat, nan)

    return jax.lax.map(one_row, flat)


def ess_rhat_batch_device(x):
    """`ess_rhat_batch` evaluated on the accelerator holding `x` (or
    the default device): identical accounting — rank-normalized bulk
    ESS with exact average-tie handling, max of bulk/folded split-R̂ —
    as one fused jit program, so the 10⁷-draw bench chains never
    transfer to the (single-core) host. In f64 (CPU tests) it matches
    the numpy oracle to <1e-12 (tests/test_chains_batch.py); on TPU it
    runs in the sampler's f32 — diagnostics precision ~1e-5, far
    inside the 1.05 convergence gate. Returns numpy (ess (P,),
    rhat (P,))."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    if not hasattr(x, "dtype") or isinstance(x, np.ndarray):
        x = jnp.asarray(np.asarray(x))
    if x.ndim == 2:
        x = x[:, :, None]
    m, n, P = x.shape
    if n < 4:
        return np.full(P, np.nan), np.full(P, np.nan)
    from scipy.fft import next_fast_len

    nn = n // 2
    nfft = next_fast_len(2 * nn, real=True)
    fn = jax.jit(partial(_ess_rhat_batch_jax_impl, nfft=nfft))
    ess, rhat = fn(x)
    return np.asarray(ess), np.asarray(rhat)


def ess_tail(x: np.ndarray):
    """Tail ESS: min of ESS of the 5% and 95% quantile indicators."""
    x = np.asarray(x, dtype=np.float64)
    if not np.all(np.isfinite(x)) or np.allclose(x, x.reshape(-1)[0]):
        return float("nan")
    out = []
    for q in (0.05, 0.95):
        ind = (x <= np.quantile(x, q)).astype(np.float64)
        e, _ = _split_ess_rhat_raw(ind)
        out.append(e)
    return float(np.nanmin(out))


def ess_tail_batch(x: np.ndarray):
    """Vectorized `ess_tail` over the last axis; x shape
    (chains, draws, P). Returns ess_tail (P,)."""
    x = np.asarray(x, dtype=np.float64)
    if x.ndim == 2:
        x = x[:, :, None]
    m, n, P = x.shape
    xt = np.ascontiguousarray(np.moveaxis(x, 2, 0))
    flat = xt.reshape(P, -1)
    ok = np.isfinite(flat).all(axis=1) & ~_constant_rows(flat)
    out = np.full(P, np.nan)
    if not ok.any():
        return out
    sub = xt if ok.all() else xt[ok]
    qs = np.quantile(sub.reshape(sub.shape[0], -1), [0.05, 0.95], axis=1)
    inds = np.concatenate(
        [
            (sub <= qs[0][:, None, None]).astype(np.float64),
            (sub <= qs[1][:, None, None]).astype(np.float64),
        ],
        axis=0,
    )
    e, _ = _split_ess_rhat_raw_batch(inds)
    k = ok.sum()
    out[ok] = np.fmin(e[:k], e[k:])
    return out


class Chains:
    """Named posterior samples with shape (n_chains, n_draws) per column."""

    def __init__(self, data: dict, internals: dict | None = None, info: dict | None = None):
        self.data = {k: np.asarray(v) for k, v in data.items()}
        self.internals = {k: np.asarray(v) for k, v in (internals or {}).items()}
        self.info = dict(info or {})
        shapes = {v.shape for v in self.data.values()}
        if len(shapes) > 1:
            raise ValueError(f"inconsistent column shapes: {shapes}")
        some = next(iter(self.data.values()))
        self.n_chains, self.n_draws = some.shape[0], some.shape[1]

    # --------------------------------------------------------------
    @property
    def names(self):
        return list(self.data.keys())

    def __getitem__(self, name):
        if name in self.data:
            return self.data[name]
        if name in self.internals:
            return self.internals[name]
        raise KeyError(name)

    def __contains__(self, name):
        return name in self.data or name in self.internals

    def flat(self, name):
        """Column flattened over (chains, draws)."""
        return self[name].reshape(-1)

    def subset(self, chains=None, draws=None):
        sel_c = slice(None) if chains is None else chains
        sel_d = slice(None) if draws is None else draws
        return Chains(
            {k: v[sel_c, sel_d] for k, v in self.data.items()},
            {k: v[sel_c, sel_d] if v.ndim == 2 else v for k, v in self.internals.items()},
            self.info,
        )

    # --------------------------------------------------------------
    def _diagnostics(self):
        """Batched (ess, rhat, ess_tail) for every 2-D column, one
        vectorized pass (`ess_rhat_batch`)."""
        keys = [k for k, v in self.data.items() if v.ndim == 2]
        if not keys:
            return {}
        x = np.stack([self.data[k] for k in keys], axis=-1)
        ess, rhat = ess_rhat_batch(x)
        tail = ess_tail_batch(x)
        return {
            k: (float(ess[j]), float(rhat[j]), float(tail[j]))
            for j, k in enumerate(keys)
        }

    def summary(self):
        """dict of per-parameter stats: mean, std, ess (rank-normalized
        bulk), ess_tail, rhat (rank-normalized split, max of bulk/folded)."""
        diag = self._diagnostics()
        out = {}
        for k, v in self.data.items():
            if v.ndim != 2:
                continue
            ess, rhat, tail = diag[k]
            out[k] = {
                "mean": float(v.mean()),
                "std": float(v.std()),
                "ess": ess,
                "ess_tail": tail,
                "rhat": rhat,
            }
        return out

    def describe(self):
        """Summary + quantile tables as pandas DataFrames (the reference
        re-exports MCMCChains `describe`, src/Octofitter.jl:47, which
        prints exactly these two tables). Returns (summary, quantiles):
        summary has mean/std/mcse/ess_bulk/ess_tail/rhat per parameter,
        quantiles the 2.5/25/50/75/97.5 percent points."""
        import pandas as pd

        diag = self._diagnostics()
        srows, qrows = [], []
        for k, v in self.data.items():
            if v.ndim != 2:
                continue
            ess, rhat, tail = diag[k]
            flat = v.reshape(-1)
            srows.append(
                dict(
                    parameters=k,
                    mean=float(flat.mean()),
                    std=float(flat.std()),
                    mcse=float(flat.std() / np.sqrt(max(ess, 1e-12))),
                    ess_bulk=ess,
                    ess_tail=tail,
                    rhat=rhat,
                )
            )
            q = np.percentile(flat, [2.5, 25.0, 50.0, 75.0, 97.5])
            qrows.append(
                {
                    "parameters": k,
                    "2.5%": q[0],
                    "25.0%": q[1],
                    "50.0%": q[2],
                    "75.0%": q[3],
                    "97.5%": q[4],
                }
            )
        return (
            pd.DataFrame(srows).set_index("parameters"),
            pd.DataFrame(qrows).set_index("parameters"),
        )

    def __repr__(self):
        lines = [
            f"Chains ({self.n_chains} chains, {self.n_draws} draws, "
            f"{len(self.data)} parameters)"
        ]
        s = self.summary()
        lines.append(f"{'parameter':>24} {'mean':>12} {'std':>12} {'ess':>10} {'rhat':>8}")
        for k, st in s.items():
            lines.append(
                f"{k:>24} {st['mean']:>12.5g} {st['std']:>12.5g} "
                f"{st['ess']:>10.0f} {st['rhat']:>8.4f}"
            )
        return "\n".join(lines)


def flatten_params_batch(params, prefix="") -> dict:
    """Flatten a (batched) Params tree into named arrays following the
    chain naming contract (`sampling.jl:908-981`)."""
    import numpy as np

    from .model.params import Params

    out = {}
    for k, v in params.items():
        if k in ("planets", "observations") and isinstance(v, Params):
            for name2, sub in v.items():
                if k == "planets":
                    subprefix = f"{prefix}{name2}_"
                else:
                    subprefix = f"{prefix}{name2}_"
                out.update(flatten_params_batch(sub, subprefix))
        elif isinstance(v, Params):
            out.update(flatten_params_batch(v, f"{prefix}{k}_"))
        else:
            arr = np.asarray(v)
            out[f"{prefix}{k}"] = arr
    return out
