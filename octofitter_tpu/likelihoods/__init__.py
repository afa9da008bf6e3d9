"""Observation / likelihood layer (reference `src/likelihoods/`)."""

from .relastrom import PlanetRelAstromObs, PlanetRelAstromLikelihood
from .photometry import PhotometryObs, PhotometryLikelihood
from .hgca import HGCAInstantaneousObs, HGCAInstantaneousLikelihood, gaia_plx, load_hgca
from .obs_priors import (
    ObsPriorAstromONeil2019,
    LimitClosestApproachAUPrior,
    NonCrossingPrior,
    HillStabilityPrior,
    PlanetOrderPrior,
)

__all__ = [
    "PlanetRelAstromObs",
    "PlanetRelAstromLikelihood",
    "PhotometryObs",
    "PhotometryLikelihood",
    "HGCAInstantaneousObs",
    "HGCAInstantaneousLikelihood",
    "gaia_plx",
    "load_hgca",
    "ObsPriorAstromONeil2019",
    "LimitClosestApproachAUPrior",
    "NonCrossingPrior",
    "HillStabilityPrior",
    "PlanetOrderPrior",
]
