"""Post-processing & validation: SBC, cross-validation, completeness."""

from .crossvalidation import (
    pointwise_like,
    prior_only_model,
    generate_kfold_systems,
    generate_system_per_epoch,
    psis_loo,
)
from .sbc import sbc_trial, calibrate

__all__ = [
    "pointwise_like",
    "prior_only_model",
    "generate_kfold_systems",
    "generate_system_per_epoch",
    "psis_loo",
    "sbc_trial",
    "calibrate",
]
