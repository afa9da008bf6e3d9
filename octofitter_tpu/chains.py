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
    def summary(self):
        """dict of per-parameter stats: mean, std, ess (rank-normalized
        bulk), ess_tail, rhat (rank-normalized split, max of bulk/folded)."""
        out = {}
        for k, v in self.data.items():
            if v.ndim != 2:
                continue
            ess, rhat = ess_rhat(v)
            out[k] = {
                "mean": float(v.mean()),
                "std": float(v.std()),
                "ess": ess,
                "ess_tail": ess_tail(v),
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

        srows, qrows = [], []
        for k, v in self.data.items():
            if v.ndim != 2:
                continue
            ess, rhat = ess_rhat(v)
            flat = v.reshape(-1)
            srows.append(
                dict(
                    parameters=k,
                    mean=float(flat.mean()),
                    std=float(flat.std()),
                    mcse=float(flat.std() / np.sqrt(max(ess, 1e-12))),
                    ess_bulk=ess,
                    ess_tail=ess_tail(v),
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
