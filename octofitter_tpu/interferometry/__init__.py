"""Interferometry likelihoods (reference `OctofitterInterferometry`)."""

from .likelihoods import (
    InterferometryObs,
    InterferometryLikelihood,
    cvis_point_sources,
    closure_phases_deg,
)

__all__ = [
    "InterferometryObs",
    "InterferometryLikelihood",
    "cvis_point_sources",
    "closure_phases_deg",
]
