"""Observation / likelihood layer (reference `src/likelihoods/`)."""

from .relastrom import PlanetRelAstromObs, PlanetRelAstromLikelihood
from .photometry import PhotometryObs, PhotometryLikelihood

__all__ = [
    "PlanetRelAstromObs",
    "PlanetRelAstromLikelihood",
    "PhotometryObs",
    "PhotometryLikelihood",
]
