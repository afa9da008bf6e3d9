"""Radial-velocity subpackage (reference `OctofitterRadialVelocity`)."""

from .likelihoods import (
    StarAbsoluteRVObs,
    StarAbsoluteRVLikelihood,
    MarginalizedStarAbsoluteRVObs,
    MarginalizedStarAbsoluteRVLikelihood,
    PlanetRelativeRVObs,
    PlanetRelativeRVLikelihood,
)
from .celerite import (
    CeleriteTerm,
    RealTerm,
    ComplexTerm,
    SHOTerm,
    celerite_loglike,
)
from .kernels import (
    Kernel,
    SqExponentialKernel,
    Matern32Kernel,
    QuasiPeriodicKernel,
    gp_loglike,
    gp_predict,
)

__all__ = [
    "StarAbsoluteRVObs",
    "StarAbsoluteRVLikelihood",
    "MarginalizedStarAbsoluteRVObs",
    "MarginalizedStarAbsoluteRVLikelihood",
    "PlanetRelativeRVObs",
    "PlanetRelativeRVLikelihood",
    "Kernel",
    "SqExponentialKernel",
    "Matern32Kernel",
    "QuasiPeriodicKernel",
    "gp_loglike",
    "gp_predict",
    "CeleriteTerm",
    "RealTerm",
    "ComplexTerm",
    "SHOTerm",
    "celerite_loglike",
]
