"""Samplers: vectorized NUTS (octofit), rejection, parallel tempering."""

from .driver import octofit, octofit_rejection
from .nuts import run_nuts, nuts_step

__all__ = ["octofit", "octofit_rejection", "run_nuts", "nuts_step"]
