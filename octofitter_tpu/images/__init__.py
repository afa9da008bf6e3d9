"""Direct-imaging likelihoods (reference `OctofitterImages`)."""

from .likelihoods import ImageObs, ImageLikelihood, LogLikelihoodMapObs, contrast_curve

__all__ = ["ImageObs", "ImageLikelihood", "LogLikelihoodMapObs", "contrast_curve"]
