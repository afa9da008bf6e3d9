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
    AbstractInterferometryObs,
    AbstractInterferometryLikelihood,
    GRAVITYWideKPObs,
    GRAVITYWideKPLikelihood,
)
from .rv import (
    StarAbsoluteRVObs,
    StarAbsoluteRVLikelihood,
    MarginalizedStarAbsoluteRVObs,
    MarginalizedStarAbsoluteRVLikelihood,
    StarAbsoluteRVMarginLikelihood,
    PlanetRelativeRVObs,
    PlanetRelativeRVLikelihood,
)
from .atmosphere import (
    sonora_photometry_interpolator,
    sonora_cooling_interpolator,
    bhac15_mass_age_interpolator,
)
from .plots import octoplot, octocorner
from .images import ImageObs, ImageLikelihood, LogLikelihoodMapObs
from .images.likelihoods import LogLikelihoodMap
from .transits import LightCurveObs, LightCurveLikelihood
from . import io as octo_io
from .io import savechain, loadchain
from .io.orbitize import (
    loadhdf5,
    savehdf5,
    Whereistheplanet_search,
    Whereistheplanet_astrom,
)
from .net import GOST_forecast, query_gaia_catalog, query_nss_tap, tap_query
from .samplers import octofit, octofit_rejection, octofit_pigeons, octofit_nested
from .samplers.nested import dysample
from .chains import Chains, ess_rhat, ess_rhat_batch, ess_tail, ess_tail_batch


def describe(chain):
    """Summary + quantile tables for a Chains object (the reference
    re-exports MCMCChains `describe`, src/Octofitter.jl:47)."""
    return chain.describe()
from .analysis.crossvalidation import (
    prior_only_model,
    pointwise_like,
    generate_kfold_systems,
    psis_loo,
)
from .analysis.completeness import (
    CompletenessJob,
    CompletenessResult,
    CompletenessMap,
    completeness_jobs,
    run_completeness_trial,
    assemble_completeness,
    completeness_map,
)
from .rv.data_sources import (
    HARPS_RVBank_rvs,
    HARPS_DR1_rvs,
    HIRES_rvs,
    Lick_rvs,
    CES_lc_rvs,
    CES_vlc_rvs,
    radvel_posterior,
)


def drawfrompriors(model, key):
    """Draw a structured parameter set from the model priors (reference
    `drawfrompriors`, src/variables.jl:1507) — thin delegate to
    `LogDensityModel.drawfrompriors`."""
    return model.drawfrompriors(key)


def sample_priors(model, key, n=None):
    """Sample flat prior vectors (reference `sample_priors`,
    src/sampling.jl:6) — thin delegate to
    `LogDensityModel.sample_priors`."""
    return model.sample_priors(key, n)


def initialize(model, *args, **kwargs):
    """Run the starting-point pipeline (reference `initialize!`,
    src/initialization.jl:184) and return the init chain of starting
    points, like the reference — pass it to `octoplot` to check data
    entry before sampling. (The `LogDensityModel.initialize` method
    form returns the MAP point in unconstrained coordinates instead.)"""
    from .model.initialization import starting_points_chain

    model.initialize(*args, **kwargs)
    return starting_points_chain(model)


def startingpoints(model, points):
    """Set explicit starting points (reference `startingpoints!`,
    src/initialization.jl:293) — thin delegate to
    `LogDensityModel.startingpoints`."""
    return model.startingpoints(points)


__version__ = "0.1.0"
