"""Prior distribution library.

TPU-native equivalent of the Distributions.jl surface the reference uses,
plus its custom distributions (`/root/reference/src/distributions.jl`:
`Sine` at :14, `UniformImproper` at :56, `KDEDist` at :79).

Design notes (TPU-first):
  - Distribution *hyper-parameters are static Python floats*. They are
    part of the model specification and get baked into the jitted
    log-density as constants; only the random variable is traced.
  - ``logpdf`` is a pure jnp function, written branch-free: out-of-support
    inputs yield ``-inf`` via ``jnp.where``, never an exception
    (reference behavior: `variables.jl:1224-1238` -inf gating).
  - ``sample`` uses explicit `jax.random` keys and is vmappable, which is
    how the reference's threaded prior search (`initialization.jl:14-66`)
    becomes a single vectorized draw on device.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from . import bijectors

__all__ = [
    "Distribution",
    "Normal",
    "Uniform",
    "LogNormal",
    "LogUniform",
    "Exponential",
    "Beta",
    "Gamma",
    "TruncatedNormal",
    "truncated",
    "Sine",
    "UniformImproper",
    "KDEDist",
    "DiscreteUniform",
    "Categorical",
]

_SQRT2 = math.sqrt(2.0)
_LOG_SQRT_2PI = 0.5 * math.log(2 * math.pi)


@dataclasses.dataclass(frozen=True)
class Distribution:
    """Base class: continuous univariate distribution with static params."""

    #: discrete distributions are detected by LogDensityModel and
    #: marginalized (the reference instead switches to gradient-free
    #: sampling, `logdensitymodel.jl:38-41`)
    discrete = False

    def logpdf(self, x):
        raise NotImplementedError

    def sample(self, key, shape=()):
        raise NotImplementedError

    @property
    def support(self) -> tuple[float, float]:
        return (-math.inf, math.inf)

    def bijector(self) -> bijectors.Bijector:
        lo, hi = self.support
        return bijectors.from_support(lo, hi)

    # number of scalar parameters this prior contributes (always 1 for
    # univariate; kept for interface parity with multivariate extensions)
    def __len__(self):
        return 1


def _in_support(d: Distribution, x, lp):
    # array-safe: supports scalar or stacked (array-valued) bounds
    lo, hi = d.support
    lo = jnp.asarray(lo, dtype=jnp.result_type(x))
    hi = jnp.asarray(hi, dtype=jnp.result_type(x))
    ok_lo = jnp.where(jnp.isneginf(lo), True, x > lo)
    ok_hi = jnp.where(jnp.isposinf(hi), True, x < hi)
    return jnp.where(ok_lo & ok_hi, lp, -jnp.inf)


@dataclasses.dataclass(frozen=True)
class Normal(Distribution):
    mu: float = 0.0
    sigma: float = 1.0

    def logpdf(self, x):
        z = (x - self.mu) / self.sigma
        return -0.5 * z * z - jnp.log(jnp.asarray(self.sigma)) - _LOG_SQRT_2PI

    def sample(self, key, shape=()):
        return self.mu + self.sigma * jax.random.normal(key, shape)

    def mean(self):
        return self.mu

    def std(self):
        return self.sigma


@dataclasses.dataclass(frozen=True)
class Uniform(Distribution):
    a: float = 0.0
    b: float = 1.0

    def logpdf(self, x):
        lp = jnp.broadcast_to(-jnp.log(jnp.asarray(self.b) - self.a), jnp.shape(x))
        return _in_support(self, x, lp)

    def sample(self, key, shape=()):
        return jax.random.uniform(key, shape, minval=self.a, maxval=self.b)

    @property
    def support(self):
        return (self.a, self.b)

    def mean(self):
        return 0.5 * (self.a + self.b)

    def std(self):
        return (self.b - self.a) / math.sqrt(12.0)


@dataclasses.dataclass(frozen=True)
class LogNormal(Distribution):
    mu: float = 0.0
    sigma: float = 1.0

    def logpdf(self, x):
        safe_x = jnp.where(x > 0, x, 1.0)
        lx = jnp.log(safe_x)
        z = (lx - self.mu) / self.sigma
        lp = -0.5 * z * z - lx - jnp.log(jnp.asarray(self.sigma)) - _LOG_SQRT_2PI
        return jnp.where(x > 0, lp, -jnp.inf)

    def sample(self, key, shape=()):
        return jnp.exp(self.mu + self.sigma * jax.random.normal(key, shape))

    @property
    def support(self):
        return (0.0, math.inf)

    def mean(self):
        return math.exp(self.mu + self.sigma**2 / 2)

    def std(self):
        m2 = math.exp(self.sigma**2)
        return math.sqrt((m2 - 1) * math.exp(2 * self.mu + self.sigma**2))


@dataclasses.dataclass(frozen=True)
class LogUniform(Distribution):
    a: float = 1.0
    b: float = 10.0

    def logpdf(self, x):
        safe_x = jnp.where(x > 0, x, 1.0)
        lp = -jnp.log(safe_x) - jnp.log(jnp.log(jnp.asarray(self.b) / self.a))
        return _in_support(self, x, lp)

    def sample(self, key, shape=()):
        u = jax.random.uniform(key, shape)
        return self.a * jnp.exp(u * jnp.log(jnp.asarray(self.b) / self.a))

    @property
    def support(self):
        return (self.a, self.b)

    def mean(self):
        return (self.b - self.a) / math.log(self.b / self.a)

    def std(self):
        lr = math.log(self.b / self.a)
        m1 = (self.b - self.a) / lr
        m2 = (self.b**2 - self.a**2) / (2 * lr)
        return math.sqrt(max(m2 - m1**2, 0.0))


@dataclasses.dataclass(frozen=True)
class Exponential(Distribution):
    """Exponential with *scale* (mean) theta, Distributions.jl convention."""

    theta: float = 1.0

    def logpdf(self, x):
        lp = -x / self.theta - jnp.log(jnp.asarray(self.theta))
        return jnp.where(x >= 0, lp, -jnp.inf)

    def sample(self, key, shape=()):
        return self.theta * jax.random.exponential(key, shape)

    @property
    def support(self):
        return (0.0, math.inf)

    def mean(self):
        return self.theta

    def std(self):
        return self.theta


@dataclasses.dataclass(frozen=True)
class Beta(Distribution):
    alpha: float = 1.0
    beta: float = 1.0

    def logpdf(self, x):
        from jax.scipy.special import gammaln

        a = jnp.asarray(self.alpha)
        b = jnp.asarray(self.beta)
        lbeta = gammaln(a) + gammaln(b) - gammaln(a + b)
        safe_x = jnp.clip(x, 1e-300, 1 - 1e-16)
        lp = (a - 1) * jnp.log(safe_x) + (b - 1) * jnp.log1p(-safe_x) - lbeta
        return _in_support(self, x, lp)

    def sample(self, key, shape=()):
        return jax.random.beta(key, self.alpha, self.beta, shape)

    @property
    def support(self):
        return (0.0, 1.0)

    def mean(self):
        return self.alpha / (self.alpha + self.beta)

    def std(self):
        a, b = self.alpha, self.beta
        return math.sqrt(a * b / ((a + b) ** 2 * (a + b + 1)))


@dataclasses.dataclass(frozen=True)
class Gamma(Distribution):
    """Gamma with shape alpha and *scale* theta (Distributions.jl)."""

    alpha: float = 1.0
    theta: float = 1.0

    def logpdf(self, x):
        a, t = self.alpha, self.theta
        safe_x = jnp.where(x > 0, x, 1.0)
        from jax.scipy.special import gammaln

        lp = (
            (a - 1) * jnp.log(safe_x)
            - safe_x / t
            - gammaln(jnp.asarray(a))
            - a * jnp.log(jnp.asarray(t))
        )
        return jnp.where(x > 0, lp, -jnp.inf)

    def sample(self, key, shape=()):
        return self.theta * jax.random.gamma(key, self.alpha, shape)

    @property
    def support(self):
        return (0.0, math.inf)

    def mean(self):
        return self.alpha * self.theta

    def std(self):
        return math.sqrt(self.alpha) * self.theta


def _norm_cdf(z):
    return 0.5 * math.erfc(-z / _SQRT2)


@dataclasses.dataclass(frozen=True)
class TruncatedNormal(Distribution):
    """Normal(mu, sigma) truncated to (lower, upper).

    Equivalent of `truncated(Normal(mu, sigma), lower=..., upper=...)`
    which the reference docs use pervasively for masses and parallaxes.
    """

    mu: float = 0.0
    sigma: float = 1.0
    lower: float = -math.inf
    upper: float = math.inf

    def _log_z(self):
        from jax.scipy.special import erfc

        za = (jnp.asarray(self.lower) - self.mu) / self.sigma
        zb = (jnp.asarray(self.upper) - self.mu) / self.sigma
        cdf = lambda z: 0.5 * erfc(-jnp.clip(z, -38.0, 38.0) / _SQRT2)
        return jnp.log(cdf(zb) - cdf(za))

    def logpdf(self, x):
        z = (x - self.mu) / self.sigma
        lp = (
            -0.5 * z * z
            - jnp.log(jnp.asarray(self.sigma))
            - _LOG_SQRT_2PI
            - self._log_z()
        )
        return _in_support(self, x, lp)

    def sample(self, key, shape=()):
        za = (self.lower - self.mu) / self.sigma
        zb = (self.upper - self.mu) / self.sigma
        z = jax.random.truncated_normal(key, za, zb, shape)
        return self.mu + self.sigma * z

    @property
    def support(self):
        return (self.lower, self.upper)

    def mean(self):
        return self.mu  # approximation, used only for diagnostics

    def std(self):
        return self.sigma


def truncated(dist: Normal, lower=-math.inf, upper=math.inf) -> Distribution:
    """Match the reference API `truncated(Normal(...), lower=, upper=)`."""
    if isinstance(dist, Normal):
        return TruncatedNormal(dist.mu, dist.sigma, lower, upper)
    raise NotImplementedError(
        f"truncated() currently supports Normal, got {type(dist).__name__}"
    )


@dataclasses.dataclass(frozen=True)
class Sine(Distribution):
    """pdf = sin(x)/2 on (0, pi) — the isotropic-inclination prior
    (`/root/reference/src/distributions.jl:14-39`)."""

    def logpdf(self, x):
        safe = jnp.clip(x, 1e-12, math.pi - 1e-12)
        lp = jnp.log(jnp.sin(safe) / 2)
        return _in_support(self, x, lp)

    def sample(self, key, shape=()):
        # quantile(p) = acos(1 - 2p)   (`distributions.jl:39`)
        p = jax.random.uniform(key, shape)
        return jnp.arccos(1 - 2 * p)

    @property
    def support(self):
        # reference uses 0+eps, pi-eps (`distributions.jl:31-32`)
        return (0.0, math.pi)

    def mean(self):
        return math.pi / 2

    def std(self):
        return math.sqrt(0.25 - 2 / math.pi**2)


@dataclasses.dataclass(frozen=True)
class UniformImproper(Distribution):
    """Improper flat prior on the whole real line
    (`/root/reference/src/distributions.jl:56-67`)."""

    def logpdf(self, x):
        return jnp.zeros_like(x)

    def sample(self, key, shape=()):
        # matches the reference's quantile(d, p) = p convention
        return jax.random.uniform(key, shape)

    def mean(self):
        return 0.5

    def std(self):
        return 1.0


class KDEDist(Distribution):
    """1-D kernel density estimate prior
    (`/root/reference/src/distributions.jl:79-114`).

    TPU design: the Gaussian-KDE density is precomputed on a fixed grid at
    build time (host-side numpy); ``logpdf`` is a differentiable linear
    interpolation on that grid, so it jits and vmaps with no O(N_data)
    cost in the hot loop. Sampling uses inverse-CDF on the same grid.
    """

    def __init__(self, data, bandwidth=None, lower=None, upper=None, gridsize=2048):
        data = np.asarray(data, dtype=np.float64)
        if bandwidth is None:
            # Silverman's rule, as KernelDensity.jl's default_bandwidth
            n = data.size
            sig = min(np.std(data), (np.percentile(data, 75) - np.percentile(data, 25)) / 1.349)
            bandwidth = 0.9 * sig * n ** (-1 / 5)
        self.bandwidth = float(bandwidth)
        self.lower = float(np.min(data) if lower is None else lower)
        self.upper = float(np.max(data) if upper is None else upper)
        self.data = data
        grid = np.linspace(self.lower, self.upper, gridsize)
        # density as mixture of normals, with boundary reflection to match
        # KernelDensity.jl's boundary= handling
        z = (grid[:, None] - data[None, :]) / self.bandwidth
        dens = np.exp(-0.5 * z**2).sum(axis=1)
        zl = (grid[:, None] - (2 * self.lower - data[None, :])) / self.bandwidth
        zu = (grid[:, None] - (2 * self.upper - data[None, :])) / self.bandwidth
        dens += np.exp(-0.5 * zl**2).sum(axis=1)
        dens += np.exp(-0.5 * zu**2).sum(axis=1)
        dens /= data.size * self.bandwidth * math.sqrt(2 * math.pi)
        # normalize on the truncated domain
        cdf = np.concatenate([[0.0], np.cumsum((dens[1:] + dens[:-1]) / 2) * np.diff(grid)])
        dens /= cdf[-1]
        cdf /= cdf[-1]
        self._grid = jnp.asarray(grid)
        self._dens = jnp.asarray(dens)
        self._cdf_np = cdf
        self._cdf = jnp.asarray(cdf)

    def logpdf(self, x):
        d = jnp.interp(x, self._grid, self._dens)
        lp = jnp.log(jnp.maximum(d, 1e-300))
        return _in_support(self, x, lp)

    def sample(self, key, shape=()):
        p = jax.random.uniform(key, shape)
        return jnp.interp(p, self._cdf, self._grid)

    @property
    def support(self):
        return (self.lower, self.upper)

    def mean(self):
        return float(np.mean(self.data))

    def std(self):
        return float(np.std(self.data))


# --------------------------------------------------------------------------
# Discrete distributions (small-domain; marginalized by LogDensityModel)
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class DiscreteUniform(Distribution):
    """Uniform over the integers a..b inclusive. Detected by
    LogDensityModel and marginalized over its domain via logsumexp —
    the TPU-native replacement for the reference's gradient-free switch
    on discrete priors (`logdensitymodel.jl:38-41`,
    `initialization.jl:219-263`)."""

    a: int = 0
    b: int = 1

    discrete = True

    def domain(self):
        return np.arange(int(self.a), int(self.b) + 1)

    def logpmf(self, k):
        n = int(self.b) - int(self.a) + 1
        lp = jnp.full(jnp.shape(k), -math.log(n))
        inside = (k >= self.a) & (k <= self.b)
        return jnp.where(inside, lp, -jnp.inf)

    # continuous-interface shims (used only if not marginalized)
    def logpdf(self, x):
        return self.logpmf(jnp.round(x))

    def sample(self, key, shape=()):
        return jax.random.randint(key, shape, int(self.a), int(self.b) + 1).astype(
            jnp.result_type(float)
        )

    @property
    def support(self):
        return (float(self.a) - 0.5, float(self.b) + 0.5)


@dataclasses.dataclass(frozen=True)
class Categorical(Distribution):
    """Categorical over explicit values with given probabilities
    (normalized at construction). Marginalized like DiscreteUniform."""

    probs: tuple = (0.5, 0.5)
    values: tuple | None = None

    discrete = True

    def domain(self):
        if self.values is not None:
            return np.asarray(self.values, float)
        return np.arange(len(self.probs), dtype=float)

    def _logp(self):
        p = np.asarray(self.probs, float)
        p = p / p.sum()
        return np.log(np.maximum(p, 1e-300))

    def logpmf(self, k):
        dom = self.domain()
        logp = self._logp()
        k = jnp.asarray(k)
        out = jnp.full(jnp.shape(k), -jnp.inf)
        for v, lp in zip(dom, logp):
            out = jnp.where(k == v, lp, out)
        return out

    def logpdf(self, x):
        return self.logpmf(x)

    def sample(self, key, shape=()):
        dom = jnp.asarray(self.domain())
        idx = jax.random.categorical(key, jnp.asarray(self._logp()), shape=shape)
        return dom[idx]

    @property
    def support(self):
        dom = self.domain()
        return (float(dom.min()) - 0.5, float(dom.max()) + 0.5)
