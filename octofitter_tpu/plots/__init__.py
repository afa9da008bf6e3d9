"""Visualization (reference `ext/OctofitterMakieExt/`, `OctofitterPairPlotsExt`)."""

from .octoplot import octoplot, astromplot, rvtimeplot, pmaplot, rvpostplot
from .corner import octocorner

__all__ = ["octoplot", "octocorner", "astromplot", "rvtimeplot", "pmaplot", "rvpostplot"]
