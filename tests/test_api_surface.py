"""Public API surface parity (SURVEY.md Appendix A).

Every user-facing export of the reference (grep export across
`/root/reference/src/**.jl` + subpackages, catalogued in SURVEY.md
Appendix A) must have an importable equivalent at the package top
level, including the backwards-compat `*Likelihood` aliases
(`src/Octofitter.jl` export blocks).
"""

import numpy as np

import octofitter_tpu as oc

# Reference export -> our top-level name (identical unless noted).
APPENDIX_A = [
    # model definition
    "Planet", "System", "UniformCircular", "Sine", "KDEDist",
    "theta_at_epoch_to_tperi", "ofti_linear_solve", "drawfrompriors",
    "sample_priors", "likelihoodname",
    # observation types (core)
    "PlanetRelAstromObs", "PlanetRelAstromLikelihood",
    "PhotometryObs", "PhotometryLikelihood",
    "HGCAObs", "HGCALikelihood",
    "HGCAInstantaneousObs", "HGCAInstantaneousLikelihood",
    "HipparcosIADObs", "HipparcosIADLikelihood",
    "GaiaDR4AstromObs", "GaiaDR4Astrom",
    "G23HObs", "G23HLikelihood",
    "ObsPriorAstromONeil2019", "PlanetOrderPrior", "NonCrossingPrior",
    "LimitClosestApproachAUPrior", "HillStabilityPrior",
    # observation types (subpackages)
    "StarAbsoluteRVObs", "StarAbsoluteRVLikelihood",
    "MarginalizedStarAbsoluteRVObs", "MarginalizedStarAbsoluteRVLikelihood",
    "PlanetRelativeRVObs", "PlanetRelativeRVLikelihood",
    "ImageObs", "ImageLikelihood",
    "LogLikelihoodMapObs", "LogLikelihoodMap",
    "InterferometryObs", "InterferometryLikelihood",
    "AbstractInterferometryObs", "AbstractInterferometryLikelihood",
    "StarAbsoluteRVMarginLikelihood",
    "GRAVITYWideKPObs", "GRAVITYWideKPLikelihood",
    "LightCurveObs", "LightCurveLikelihood",
    # inference
    "octofit", "octofit_pigeons", "octofit_rejection", "dysample",
    "initialize", "startingpoints", "LogDensityModel",
    "generate_from_params", "prior_only_model",
    # analysis / vis
    "octoplot", "octocorner", "Chains", "describe",
    # catalog/data utilities
    "gaia_plx", "query_nss", "nss_to_starting_point",
    "initialize_from_nss", "nss_to_model_chain",
    "sonora_photometry_interpolator", "sonora_cooling_interpolator",
    "Whereistheplanet_search", "Whereistheplanet_astrom",
    "loadhdf5", "savehdf5", "savechain", "loadchain", "mjd2jd", "jd2mjd",
    "HARPS_RVBank_rvs", "HARPS_DR1_rvs", "HIRES_rvs", "Lick_rvs",
    "CES_lc_rvs", "CES_vlc_rvs", "radvel_posterior",
    # completeness
    "CompletenessJob", "CompletenessResult", "CompletenessMap",
    "completeness_jobs", "run_completeness_trial",
    "assemble_completeness", "completeness_map",
]


def test_appendix_a_exports():
    missing = [n for n in APPENDIX_A if not hasattr(oc, n)]
    assert not missing, f"Appendix-A exports missing: {missing}"


def test_likelihood_aliases_are_the_same_objects():
    assert oc.ImageLikelihood is oc.ImageObs
    assert oc.LogLikelihoodMap is oc.LogLikelihoodMapObs
    assert oc.LightCurveLikelihood is oc.LightCurveObs
    assert oc.GaiaDR4Astrom is oc.GaiaDR4AstromObs
    assert oc.PlanetRelAstromLikelihood is oc.PlanetRelAstromObs


def test_describe_tables():
    rng = np.random.default_rng(0)
    ch = oc.Chains(
        {"a": rng.standard_normal((4, 400)),
         "b": 2.0 * rng.standard_normal((4, 400)) + 1.0}
    )
    s, q = oc.describe(ch)
    assert list(s.index) == ["a", "b"]
    for col in ("mean", "std", "mcse", "ess_bulk", "ess_tail", "rhat"):
        assert col in s.columns
    assert abs(s.loc["b", "mean"] - 1.0) < 0.2
    assert abs(q.loc["a", "50.0%"]) < 0.2
    assert q.loc["b", "2.5%"] < q.loc["b", "97.5%"]


def test_function_form_delegates_exist():
    assert callable(oc.initialize)
    assert callable(oc.startingpoints)
