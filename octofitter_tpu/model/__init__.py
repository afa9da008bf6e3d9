"""Model specification and posterior construction."""

from .params import Params, hasproperty
from .variables import (
    AbstractObs,
    BlankLikelihood,
    Derived,
    DirectLL,
    Planet,
    PlanetObservationContext,
    System,
    SystemObservationContext,
    IIDVector,
    UniformCircular,
    UnitLengthPrior,
    UserLikelihood,
    likelihoodname,
    normalizename,
)
from .logdensity import LogDensityModel
from .parameterizations import (
    theta_at_epoch_to_tperi,
    ofti_linear_solve,
    theta_omegatheta_at_epoch_to_omega_tperi,
    theta_sep_at_epoch_to_tperi_sma,
)
from .chain_tools import construct_elements, mcmcchain2result, chain_to_flat
from .generate import generate_from_params

__all__ = [
    "Params",
    "hasproperty",
    "AbstractObs",
    "BlankLikelihood",
    "Derived",
    "DirectLL",
    "Planet",
    "PlanetObservationContext",
    "System",
    "SystemObservationContext",
    "IIDVector",
    "UniformCircular",
    "UnitLengthPrior",
    "UserLikelihood",
    "likelihoodname",
    "normalizename",
    "LogDensityModel",
    "theta_at_epoch_to_tperi",
    "ofti_linear_solve",
    "theta_omegatheta_at_epoch_to_omega_tperi",
    "theta_sep_at_epoch_to_tperi_sma",
    "construct_elements",
    "mcmcchain2result",
    "chain_to_flat",
    "generate_from_params",
]
