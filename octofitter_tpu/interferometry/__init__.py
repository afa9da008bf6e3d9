"""Interferometry likelihoods (reference `OctofitterInterferometry`)."""

from .likelihoods import (
    InterferometryObs,
    InterferometryLikelihood,
    cvis_point_sources,
    closure_phases_deg,
)
from .gravity import (
    GRAVITYWideKPObs,
    GRAVITYWideKPLikelihood,
    fiber_coupling_fraction,
)

__all__ = [
    "InterferometryObs",
    "InterferometryLikelihood",
    "cvis_point_sources",
    "closure_phases_deg",
    "GRAVITYWideKPObs",
    "GRAVITYWideKPLikelihood",
    "fiber_coupling_fraction",
]
