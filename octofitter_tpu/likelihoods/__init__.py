"""Observation / likelihood layer (reference `src/likelihoods/`)."""

from .relastrom import PlanetRelAstromObs, PlanetRelAstromLikelihood
from .photometry import PhotometryObs, PhotometryLikelihood
from .hgca import HGCAInstantaneousObs, HGCAInstantaneousLikelihood, gaia_plx, load_hgca

__all__ = [
    "PlanetRelAstromObs",
    "PlanetRelAstromLikelihood",
    "PhotometryObs",
    "PhotometryLikelihood",
    "HGCAInstantaneousObs",
    "HGCAInstantaneousLikelihood",
    "gaia_plx",
    "load_hgca",
]
