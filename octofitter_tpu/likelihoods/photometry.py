"""Photometry likelihood.

Equivalent of the reference `PhotometryObs`
(`/root/reference/src/likelihoods/photometry.jl:30-103`): compares a
model variable (by convention ``flux``) against measured band fluxes /
magnitudes with Gaussian errors. Attachable to a planet or the system.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..model.variables import (
    AbstractObs,
    PlanetObservationContext,
    prepare_table,
)
from .utils import gauss_logpdf


class PhotometryObs(AbstractObs):
    def __init__(self, observations, variables=None, name="photometry"):
        super().__init__(variables=variables, name=name)
        if isinstance(observations, dict):
            observations = {
                k.replace("sigma_", "σ_") if k.startswith("sigma_") else k: v
                for k, v in observations.items()
            }
        self.table = prepare_table(
            observations, (("phot", "σ_phot"),), type(self).__name__
        )

    def _theta(self, ctx):
        if isinstance(ctx, PlanetObservationContext):
            return ctx.theta_system.merge(ctx.theta_planet).merge(ctx.theta_obs)
        return ctx.theta_system.merge(ctx.theta_obs)

    def simulate(self, ctx):
        theta = self._theta(ctx)
        return {"phot_model": jnp.broadcast_to(theta["flux"], self.table["phot"].shape)}

    def pointwise_ln_like(self, ctx):
        model = self.simulate(ctx)["phot_model"]
        resid = jnp.asarray(self.table["phot"]) - model
        return gauss_logpdf(resid, jnp.asarray(self.table["σ_phot"]))

    def ln_like(self, ctx):
        return jnp.sum(self.pointwise_ln_like(ctx))

    def generate_from_params(self, ctx, rng, add_noise=False):
        model = np.asarray(self.simulate(ctx)["phot_model"], dtype=np.float64)
        table = {k: np.array(v) for k, v in self.table.items()}
        phot = model
        if add_noise:
            phot = phot + rng.standard_normal(phot.shape) * table["σ_phot"]
        table["phot"] = phot
        new = object.__new__(type(self))
        AbstractObs.__init__(new, variables=None, name=self.name)
        new.var_specs = self.var_specs
        new.table = table
        return new

    def likeobj_from_epoch_subset(self, idx):
        new = object.__new__(type(self))
        AbstractObs.__init__(new, variables=None, name=self.name)
        new.var_specs = self.var_specs
        new.table = {k: np.asarray(v)[idx] for k, v in self.table.items()}
        return new


PhotometryLikelihood = PhotometryObs
