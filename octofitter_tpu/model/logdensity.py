"""LogDensityModel: the single object all samplers consume.

TPU-native equivalent of `/root/reference/src/logdensitymodel.jl` plus
the codegen layers it drives (`make_arr2nt` `variables.jl:758`,
`make_ln_prior_transformed` `variables.jl:1205`, `make_ln_like`
`system.jl:21`). Where the reference metaprograms unrolled Julia
functions, here the model is *traced once* and compiled by XLA:

    theta_t (unconstrained, flat)
      -> invlink (per-prior bijectors)
      -> arr2nt (structured Params; derived vars evaluated inline)
      -> ln_prior (with change-of-variables corrections)
      -> ln_like (orbits constructed, Kepler pre-solved at ALL epochs in
                  one vectorized call, every observation's vectorized
                  log-likelihood summed)

-Inf gating is branch-free (`jnp.where`), gradients come from
`jax.grad` (exact, replacing ForwardDiff duals), and the whole pipeline
vmaps over a chain axis.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from .params import Params
from .variables import (
    PlanetObservationContext,
    System,
    SystemObservationContext,
)
from ..orbits import orbitsolve


class LogDensityModel:
    """Posterior log-density with link/invlink, arr2nt, prior sampler.

    Attributes mirroring the reference (`logdensitymodel.jl:5-24`):
      D, ln_post(theta_t), ln_post_and_grad(theta_t), link, invlink,
      arr2nt, sample_priors, starting_points.
    """

    def __init__(self, system: System, verbosity: int = 1):
        self.system = system
        self.verbosity = verbosity

        # ------------------------------------------------------------------
        # 1. Flat prior list, ordering contract of `_list_priors`
        #    (`variables.jl:691-737`): system, system-obs, then per planet:
        #    planet priors, planet-obs priors.
        # ------------------------------------------------------------------
        entries = []  # (path, name, dist, bijector)

        def add_prior_specs(specs, path):
            for s in specs:
                if s.kind == "prior":
                    entries.append((path, s.name, s.value, s.value.bijector()))

        add_prior_specs(system.var_specs, ("sys",))
        for obs in system.observations:
            add_prior_specs(obs.var_specs, ("sysobs", obs.normalized_name))
        for planet in system.planets:
            add_prior_specs(planet.var_specs, ("planet", planet.name))
            for obs in planet.observations:
                add_prior_specs(
                    obs.var_specs, ("planetobs", planet.name, obs.normalized_name)
                )

        # Discrete priors are detected (reference: gradient-free switch,
        # `logdensitymodel.jl:38-41`) and MARGINALIZED: the continuous
        # posterior is logsumexp over the cartesian product of the
        # discrete domains, which keeps the model fully differentiable
        # on TPU. The per-draw conditional distribution of the discrete
        # variables is available via discrete_conditional_logits.
        cont = [e for e in entries if not getattr(e[2], "discrete", False)]
        disc = [e for e in entries if getattr(e[2], "discrete", False)]
        self._prior_entries = cont
        self._discrete_entries = disc
        self.D = len(cont)
        if self.D == 0:
            raise ValueError("Model has no free continuous (prior) parameters")

        def _flat_name(path, name):
            if path[0] == "sys":
                return name
            if path[0] in ("sysobs", "planet"):
                return f"{path[1]}_{name}"
            return f"{path[1]}_{path[2]}_{name}"

        # Flat parameter names using the chain naming contract
        # (`sampling.jl:551-635`): var, obs_var, planet_var, planet_obs_var.
        self.parameter_names = [
            _flat_name(path, name) for path, name, _, _ in cont
        ]
        self.discrete_names = [
            _flat_name(path, name) for path, name, _, _ in disc
        ]

        self.discrete_mode = None
        self._disc_combos = None
        self._disc_logw = None
        self._disc_domains = None
        if disc:
            domains = [np.asarray(e[2].domain(), float) for e in disc]
            self._disc_domains = domains
            K = int(np.prod([len(d) for d in domains]))
            if K > 4096:
                # domain product too large to marginalize: Gibbs mode.
                # ln_post is conditional on the discrete state; use
                # octofit(sampler="gibbs") (Gibbs-within-HMC) to sample.
                self.discrete_mode = "gibbs"
            else:
                self.discrete_mode = "marginalize"
                grids = np.meshgrid(*domains, indexing="ij")
                combos = np.stack([g.reshape(-1) for g in grids], axis=-1)
                logw = np.zeros(len(combos))
                for j, e in enumerate(disc):
                    logw += np.asarray(e[2].logpmf(jnp.asarray(combos[:, j])))
                self._disc_combos = jnp.asarray(combos)
                self._disc_logw = jnp.asarray(logw)

        # ------------------------------------------------------------------
        # 2. Epoch gathering with per-obs start indices (`system.jl:35-54`):
        #    system observations first, then per-planet observations.
        # ------------------------------------------------------------------
        all_epochs = []
        start_map = {}
        j = 0
        for obs in system.observations:
            ep = obs.epochs
            if ep is not None:
                start_map[id(obs)] = j
                j += len(ep)
                all_epochs.append(ep)
        for planet in system.planets:
            for obs in planet.observations:
                ep = obs.epochs
                if ep is not None:
                    start_map[id(obs)] = j
                    j += len(ep)
                    all_epochs.append(ep)
        self._epoch_start = start_map
        self._all_epochs = (
            np.concatenate(all_epochs) if all_epochs else np.zeros((0,))
        )
        self.n_epochs = len(self._all_epochs)

        # ------------------------------------------------------------------
        # 3. Build pure functions
        # ------------------------------------------------------------------
        self.arr2nt = self._make_arr2nt()
        self.link = self._make_link()
        self.invlink = self._make_invlink()
        self.ln_prior = self._make_ln_prior()
        self.ln_prior_transformed = self._make_ln_prior_transformed()
        self.ln_like_nt = self._make_ln_like()

        def ln_post_given_disc(theta_t, disc):
            """Posterior conditional on explicit discrete values."""
            theta_t = jnp.asarray(theta_t)
            finite_in = jnp.all(jnp.isfinite(theta_t))
            theta = self.invlink(theta_t)
            lp = self.ln_prior_transformed(theta_t)
            lp = lp + self.disc_logpmf(disc)
            ll = self.ln_like_nt(self.arr2nt(theta, disc))
            lpost = lp + ll
            return jnp.where(finite_in & jnp.isfinite(lpost), lpost, -jnp.inf)

        def ln_post(theta_t):
            theta_t = jnp.asarray(theta_t)
            finite_in = jnp.all(jnp.isfinite(theta_t))
            theta = self.invlink(theta_t)
            lp = self.ln_prior_transformed(theta_t)
            if self.discrete_mode is None:
                ll = self.ln_like_nt(self.arr2nt(theta))
            elif self.discrete_mode == "marginalize":
                # marginalize the discrete variables: logsumexp over the
                # domain product, weighted by the discrete prior pmf
                lls = jax.vmap(
                    lambda combo: self.ln_like_nt(self.arr2nt(theta, combo))
                )(self._disc_combos)
                lls = jnp.where(jnp.isnan(lls), -jnp.inf, lls)
                ll = jax.scipy.special.logsumexp(self._disc_logw + lls)
            else:
                # gibbs mode: ln_post is conditional on the default
                # (first-domain-value) discrete state — used only by
                # probes/initialization; sampling goes through
                # ln_post_given_disc + Gibbs updates (samplers/gibbs.py)
                disc0 = jnp.asarray([d[0] for d in self._disc_domains])
                ll = self.ln_like_nt(self.arr2nt(theta, disc0)) + \
                    self.disc_logpmf(disc0)
            lpost = lp + ll
            return jnp.where(
                finite_in & jnp.isfinite(lpost), lpost, -jnp.inf
            )

        self.ln_post_given_disc = ln_post_given_disc

        self._ln_post_py = ln_post
        self.ln_post = jax.jit(ln_post)
        self.ln_post_and_grad = jax.jit(jax.value_and_grad(ln_post))

        self.starting_points = None  # set by initialize()
        self.laplace_sigma = None    # H^{-1} at the mode, set by initialize()

        # probe once, like the reference's fail-fast + @showtime
        # (`logdensitymodel.jl:90-92,159-187`)
        key = jax.random.PRNGKey(0)
        theta0 = self.sample_priors(key)
        theta0_t = self.link(theta0)
        t0 = time.perf_counter()
        lp0 = float(self.ln_post(theta0_t))
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        _, g = self.ln_post_and_grad(theta0_t)
        g = np.asarray(g)
        t_gcompile = time.perf_counter() - t0
        if verbosity >= 2:
            print(
                f"LogDensityModel {system.name}: D={self.D}, "
                f"epochs={self.n_epochs}, ln_post(theta0)={lp0:.3f} "
                f"(compile {t_compile:.2f}s, grad compile {t_gcompile:.2f}s)"
            )
        if not np.isfinite(lp0) and verbosity >= 1:
            print(
                f"warning: ln_post at a prior draw is {lp0}; "
                "check your model specification"
            )

    # ----------------------------------------------------------------------
    def _make_arr2nt(self):
        system = self.system
        n_disc = len(self._discrete_entries)

        def eval_specs(specs, take, outer_scopes):
            d = {}
            for s in specs:
                if s.kind == "prior":
                    d[s.name] = take(s)
                elif s.kind == "constant":
                    d[s.name] = jnp.asarray(s.value)
                else:
                    d[s.name] = s.value(*outer_scopes, Params(d))
            return d

        def arr2nt(theta, disc=None):
            theta = jnp.asarray(theta)
            if n_disc and disc is None:
                raise ValueError(
                    "this model has discrete variables "
                    f"({self.discrete_names}); arr2nt needs their values "
                    "as a second argument"
                )
            it = iter(range(self.D))
            it_d = iter(range(n_disc))

            def take(spec):
                if getattr(spec.value, "discrete", False):
                    return jnp.asarray(disc)[..., next(it_d)]
                return theta[..., next(it)]

            sys_d = eval_specs(system.var_specs, take, ())
            sys_ns = Params(sys_d)

            sysobs_d = {}
            for obs in system.observations:
                sysobs_d[obs.normalized_name] = Params(
                    eval_specs(obs.var_specs, take, (sys_ns,))
                )

            planets_d = {}
            for planet in system.planets:
                pl_d = eval_specs(planet.var_specs, take, (sys_ns,))
                pl_ns = Params(pl_d)
                plobs_d = {}
                for obs in planet.observations:
                    plobs_d[obs.normalized_name] = Params(
                        eval_specs(obs.var_specs, take, (sys_ns, pl_ns))
                    )
                pl_d = dict(pl_d)
                pl_d["observations"] = Params(plobs_d)
                planets_d[planet.name] = Params(pl_d)

            out = dict(sys_d)
            out["planets"] = Params(planets_d)
            out["observations"] = Params(sysobs_d)
            return Params(out)

        return arr2nt

    # -- grouped (vectorized) prior/bijector machinery --------------------
    # The reference metaprograms one unrolled expression per parameter
    # (`make_ln_prior_transformed`, `variables.jl:1205`). On TPU, D
    # scalar subgraphs are overhead-bound; instead parameters are
    # grouped by distribution/bijector class and evaluated as a handful
    # of stacked array ops per class.

    def _dist_groups(self):
        if not hasattr(self, "_dist_groups_cache"):
            import dataclasses as _dc

            groups = {}
            singles = []
            for i, (_, _, dist, _) in enumerate(self._prior_entries):
                # group only classes that are THEMSELVES dataclasses
                # (not merely inheriting from one): stacking rebuilds
                # instances from their fields, which breaks classes
                # with custom __init__ state like KDEDist
                if (
                    "__dataclass_fields__" in type(dist).__dict__
                    and type(dist).__module__.endswith("distributions")
                ):
                    groups.setdefault(type(dist), []).append(i)
                else:
                    singles.append(i)
            out = []
            for cls, idxs in groups.items():
                fields = [f.name for f in _dc.fields(cls)]
                stacked = cls(
                    **{
                        f: np.asarray(
                            [getattr(self._prior_entries[j][2], f) for j in idxs]
                        )
                        for f in fields
                    }
                ) if fields else cls()
                out.append((np.asarray(idxs), stacked))
            self._dist_groups_cache = (out, singles)
        return self._dist_groups_cache

    def _bij_groups(self):
        if not hasattr(self, "_bij_groups_cache"):
            import dataclasses as _dc

            groups = {}
            for i, (_, _, _, bij) in enumerate(self._prior_entries):
                groups.setdefault(type(bij), []).append(i)
            out = []
            for cls, idxs in groups.items():
                fields = [f.name for f in _dc.fields(cls)]
                stacked = cls(
                    **{
                        f: np.asarray(
                            [getattr(self._prior_entries[j][3], f) for j in idxs]
                        )
                        for f in fields
                    }
                ) if fields else cls()
                out.append((np.asarray(idxs), stacked))
            # permutation restoring original ordering after concatenation
            order = np.concatenate([idxs for idxs, _ in out])
            perm = np.argsort(order)
            self._bij_groups_cache = (out, perm)
        return self._bij_groups_cache

    def _make_link(self):
        groups, perm = self._bij_groups()

        def link(theta):
            theta = jnp.asarray(theta)
            parts = [
                bij.forward(theta[..., idx]) for idx, bij in groups
            ]
            return jnp.concatenate(parts, axis=-1)[..., perm]

        return link

    def _make_invlink(self):
        groups, perm = self._bij_groups()

        def invlink(theta_t):
            theta_t = jnp.asarray(theta_t)
            parts = [
                bij.inverse(theta_t[..., idx]) for idx, bij in groups
            ]
            return jnp.concatenate(parts, axis=-1)[..., perm]

        return invlink

    def _make_ln_prior(self):
        groups, singles = self._dist_groups()
        dists = [e[2] for e in self._prior_entries]

        def ln_prior(theta):
            theta = jnp.asarray(theta)
            lp = jnp.zeros(theta.shape[:-1])
            for idx, dist in groups:
                lp = lp + jnp.sum(dist.logpdf(theta[..., idx]), axis=-1)
            for i in singles:
                lp = lp + dists[i].logpdf(theta[..., i])
            return lp

        return ln_prior

    def _make_ln_prior_transformed(self):
        ln_prior = self._make_ln_prior()
        invlink = self._make_invlink()
        bgroups, _ = self._bij_groups()

        def ln_prior_t(theta_t):
            # logpdf(x) + log|dx/dy| summed over parameters
            # (Bijectors.jl `logpdf_with_trans`, `variables.jl:1205-1369`)
            theta_t = jnp.asarray(theta_t)
            lp = ln_prior(invlink(theta_t))
            for idx, bij in bgroups:
                lp = lp + jnp.sum(
                    bij.logabsdet_inverse(theta_t[..., idx]), axis=-1
                )
            return lp

        return ln_prior_t

    # ----------------------------------------------------------------------
    def construct_orbits(self, theta_nt):
        """Build orbit elements for every planet from structured params
        (reference planet construction, `system.jl:116-118`)."""
        sys_kw = {
            k: v
            for k, v in theta_nt.items()
            if k not in ("planets", "observations")
        }
        orbits = []
        for planet in self.system.planets:
            pl = theta_nt.planets[planet.name]
            kw = dict(sys_kw)
            kw.update({k: v for k, v in pl.items() if k != "observations"})
            orbits.append(planet.basis.from_params(**kw))
        return tuple(orbits)

    def _make_ln_like(self):
        system = self.system
        epochs_np = self._all_epochs
        start_map = self._epoch_start

        def ln_like_nt(theta_nt):
            orbits = self.construct_orbits(theta_nt)
            if len(epochs_np) and len(orbits):
                epochs = jnp.asarray(epochs_np)
                sols = tuple(orbitsolve(o, epochs) for o in orbits)
            else:
                sols = tuple(None for _ in orbits)

            ll = jnp.asarray(0.0)
            # planet-attached observations (`system.jl:81-115`)
            for i_planet, planet in enumerate(system.planets):
                theta_planet = theta_nt.planets[planet.name]
                for obs in planet.observations:
                    theta_obs = theta_planet.observations.get(
                        obs.normalized_name, Params()
                    )
                    ctx = PlanetObservationContext(
                        theta_system=theta_nt,
                        theta_planet=theta_planet,
                        theta_obs=theta_obs,
                        orbits=orbits,
                        solutions=sols,
                        i_planet=i_planet,
                        epoch_start=start_map.get(id(obs), 0),
                    )
                    ll = ll + obs.ln_like(ctx)
            # system-attached observations (`system.jl:180-204`)
            for obs in system.observations:
                theta_obs = theta_nt.observations.get(
                    obs.normalized_name, Params()
                )
                ctx = SystemObservationContext(
                    theta_system=theta_nt,
                    theta_obs=theta_obs,
                    orbits=orbits,
                    solutions=sols,
                    epoch_start=start_map.get(id(obs), 0),
                )
                ll = ll + obs.ln_like(ctx)
            return ll

        return ln_like_nt

    # ----------------------------------------------------------------------
    def sample_priors(self, key, n: int | None = None):
        """IID draws from the priors, flat natural space
        (`make_prior_sampler`, `variables.jl:1372`); grouped by
        distribution class so a model draws in a few vector ops."""
        groups, singles = self._dist_groups()
        dists = [e[2] for e in self._prior_entries]
        n_groups = len(groups) + len(singles)
        keys = jax.random.split(key, n_groups)
        parts = []
        order = []
        ki = 0
        for idx, dist in groups:
            k = len(idx)
            shape = (k,) if n is None else (n, k)
            parts.append(dist.sample(keys[ki], shape))
            order.append(idx)
            ki += 1
        for i in singles:
            shape = (1,) if n is None else (n, 1)
            parts.append(jnp.reshape(dists[i].sample(keys[ki], shape[:-1] or ()), shape))
            order.append(np.asarray([i]))
            ki += 1
        perm = np.argsort(np.concatenate(order))
        return jnp.concatenate(parts, axis=-1)[..., perm]

    def disc_logpmf(self, disc):
        """Sum of the discrete priors' log pmf at the given values."""
        if not self._discrete_entries:
            return jnp.asarray(0.0)
        disc = jnp.asarray(disc)
        lp = jnp.asarray(0.0)
        for j, e in enumerate(self._discrete_entries):
            lp = lp + e[2].logpmf(disc[..., j])
        return lp

    def sample_disc_priors(self, key, n: int | None = None):
        """IID draws of the discrete variables from their priors;
        shape (n_disc,) or (n, n_disc)."""
        ks = jax.random.split(key, max(len(self._discrete_entries), 1))
        parts = []
        for j, e in enumerate(self._discrete_entries):
            shape = () if n is None else (n,)
            parts.append(e[2].sample(ks[j], shape))
        return jnp.stack(parts, axis=-1)

    def gibbs_update_disc(self, theta_t, disc, key):
        """One systematic-scan Gibbs sweep over the discrete variables
        given the continuous state: each variable is redrawn from its
        full conditional (enumerating only ITS domain, so the cost is
        the SUM of domain sizes, not the product — the large-domain
        fallback the reference handles by going gradient-free,
        `logdensitymodel.jl:38-41`)."""
        theta = self.invlink(jnp.asarray(theta_t))
        disc = jnp.asarray(disc)
        keys = jax.random.split(key, len(self._discrete_entries))
        for j, e in enumerate(self._discrete_entries):
            dom = jnp.asarray(self._disc_domains[j])

            def logit_at(v, disc=disc, j=j, e=e):
                d2 = disc.at[j].set(v)
                return (
                    e[2].logpmf(v)
                    + self.ln_like_nt(self.arr2nt(theta, d2))
                )

            logits = jax.vmap(logit_at)(dom)
            logits = jnp.where(jnp.isnan(logits), -jnp.inf, logits)
            i = jax.random.categorical(keys[j], logits)
            disc = disc.at[j].set(dom[i])
        return disc

    def discrete_conditional_logits(self, theta_t):
        """Unnormalized log P(discrete combo | theta_t): logpmf + loglike
        per combo. Sample with jax.random.categorical to recover the
        discrete variables per posterior draw."""
        if self._disc_combos is None:
            raise ValueError("model has no discrete variables")
        theta = self.invlink(jnp.asarray(theta_t))
        lls = jax.vmap(
            lambda combo: self.ln_like_nt(self.arr2nt(theta, combo))
        )(self._disc_combos)
        lls = jnp.where(jnp.isnan(lls), -jnp.inf, lls)
        return self._disc_logw + lls

    def drawfrompriors(self, key):
        """Structured prior draw (`drawfrompriors`, `variables.jl:1507`)."""
        if self._disc_combos is not None:
            k1, k2 = jax.random.split(key)
            i = jax.random.categorical(k1, self._disc_logw)
            return self.arr2nt(self.sample_priors(k2), self._disc_combos[i])
        return self.arr2nt(self.sample_priors(key))

    # ----------------------------------------------------------------------
    def initialize(self, key=None, **kwargs):
        """Run the initialization pipeline (prior search -> multistart
        optimization -> Laplace draws); see model/initialization.py.
        Mirrors the reference `initialize!` (`initialization.jl:184`)."""
        from .initialization import initialize as _init

        return _init(self, key, **kwargs)

    def startingpoints(self, points):
        """Manually set starting points (natural-space flat draws), like
        the reference `startingpoints!` (`initialization.jl:344`)."""
        pts = jnp.asarray(points)
        if pts.ndim == 1:
            pts = pts[None, :]
        self.starting_points = np.asarray(jax.vmap(self.link)(pts))
        return self

    def get_starting_point(self, key=None):
        """Return one starting point (unconstrained), initializing first
        if needed (`get_starting_point!!`, `initialization.jl:85-93`)."""
        if self.starting_points is None:
            self.initialize(key)
        pts = np.asarray(self.starting_points)
        i = 0 if key is None else int(
            jax.random.randint(key, (), 0, len(pts))
        )
        return jnp.asarray(pts[i])

    # ----------------------------------------------------------------------
    def prior_search(self, key, n_samples: int = 10_000, n_keep: int = 1000):
        """Vectorized prior search for starting points.

        TPU-native version of the reference's threaded
        `guess_starting_position` (`initialization.jl:14-66`): draw
        n_samples IID from the priors, evaluate the posterior density in
        one vmapped call, keep the best n_keep (finite) draws.
        Returns (theta_t_points [n_keep, D], logposts [n_keep]).
        """
        draws = self.sample_priors(key, n_samples)
        draws_t = self.link(draws)
        lps = jax.jit(jax.vmap(self._ln_post_py))(draws_t)
        lps = jnp.where(jnp.isnan(lps), -jnp.inf, lps)
        order = jnp.argsort(-lps)
        keep = order[:n_keep]
        return draws_t[keep], lps[keep]
