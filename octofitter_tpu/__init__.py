"""octofitter_tpu: TPU-native Bayesian orbit-fitting framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
Octofitter.jl (reference mounted at /root/reference): probabilistic
model specification for Keplerian orbits of exoplanets and binary
stars, heterogeneous astronomical likelihoods, and massively
vectorized samplers that map onto TPU meshes.
"""

from . import constants
from . import distributions
from .distributions import Sine, UniformImproper, KDEDist
from . import bijectors
from . import orbits
from .constants import mjd, mjd2jd, jd2mjd, years2mjd, mjd2years
from .orbits import (
    KepOrbit,
    VisualOrbit,
    ThieleInnesOrbit,
    RadialVelocityOrbit,
    orbitsolve,
    kepler_solver,
)
from .model import (
    Params,
    Derived,
    DirectLL,
    Planet,
    System,
    IIDVector,
    UniformCircular,
    UserLikelihood,
    LogDensityModel,
    theta_at_epoch_to_tperi,
    ofti_linear_solve,
    construct_elements,
    mcmcchain2result,
    generate_from_params,
    likelihoodname,
)
from .nss import (
    query_nss,
    nss_to_starting_point,
    initialize_from_nss,
    nss_to_model_chain,
)
from .likelihoods import (
    PlanetRelAstromObs,
    PlanetRelAstromLikelihood,
    PhotometryObs,
    PhotometryLikelihood,
    HGCAInstantaneousObs,
    HGCAInstantaneousLikelihood,
    gaia_plx,
    ObsPriorAstromONeil2019,
    LimitClosestApproachAUPrior,
    NonCrossingPrior,
    HillStabilityPrior,
    PlanetOrderPrior,
)
from . import rv
from . import images
from . import transits
from . import analysis
from . import astrom
from .astrom import (
    HipparcosIADObs,
    HipparcosIADLikelihood,
    GaiaCatalogFitObs,
    GaiaCatalogFitLikelihood,
    HGCAObs,
    HGCALikelihood,
    GaiaDR4AstromObs,
    GaiaDR4Astrom,
    G23HObs,
    G23HLikelihood,
)
from .orbits import AbsoluteVisualOrbit
from . import interferometry
from . import atmosphere
from .config import OctofitterConfig, get_config, set_config
from . import datadeps
from . import utils
from . import plots
from .interferometry import (
    InterferometryObs,
    InterferometryLikelihood,
    GRAVITYWideKPObs,
    GRAVITYWideKPLikelihood,
)
from .rv import (
    StarAbsoluteRVObs,
    StarAbsoluteRVLikelihood,
    MarginalizedStarAbsoluteRVObs,
    MarginalizedStarAbsoluteRVLikelihood,
    PlanetRelativeRVObs,
    PlanetRelativeRVLikelihood,
)
from .atmosphere import (
    sonora_photometry_interpolator,
    sonora_cooling_interpolator,
    bhac15_mass_age_interpolator,
)
from .plots import octoplot, octocorner
from .images import ImageObs, LogLikelihoodMapObs
from .transits import LightCurveObs
from . import io as octo_io
from .io import savechain, loadchain
from .samplers import octofit, octofit_rejection, octofit_pigeons, octofit_nested
from .chains import Chains, ess_rhat

__version__ = "0.1.0"
