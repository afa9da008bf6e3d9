"""Samplers: vectorized NUTS (octofit), rejection, parallel tempering."""

from .driver import octofit, octofit_rejection
from .nuts import run_nuts, nuts_step
from .chees import run_chees
from .tempering import octofit_pigeons
from .nested import octofit_nested, dysample

__all__ = [
    "octofit",
    "octofit_rejection",
    "run_chees",
    "octofit_pigeons",
    "octofit_nested",
    "dysample",
    "run_nuts",
    "nuts_step",
]
