"""Visualization (reference `ext/OctofitterMakieExt/`, `OctofitterPairPlotsExt`)."""

from .octoplot import octoplot, astromplot, rvtimeplot, pmaplot, rvpostplot
from .corner import octocorner
from .panels import (
    absastromplot,
    astromtimeplot,
    completenessplot,
    dotplot,
    gaiastarplot,
    gaiatimeplot,
    hgcaplot,
    hipparcosplot,
    masspostplot,
    physorbitplot,
    skytrackplot,
)

__all__ = [
    "octoplot",
    "octocorner",
    "astromplot",
    "rvtimeplot",
    "pmaplot",
    "rvpostplot",
    "astromtimeplot",
    "physorbitplot",
    "masspostplot",
    "dotplot",
    "hgcaplot",
    "hipparcosplot",
    "gaiastarplot",
    "gaiatimeplot",
    "skytrackplot",
    "absastromplot",
    "completenessplot",
]
