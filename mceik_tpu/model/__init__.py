"""Probabilistic model (SURVEY.md §1 L2): parameter pytrees, priors,
Gaussian traveltime-residual likelihood, posterior builder."""

from mceik_tpu.model.params import Params, slowness_from_u  # noqa: F401
from mceik_tpu.model.posterior import PosteriorModel, build_posterior  # noqa: F401
from mceik_tpu.model.data import TomoData, EventData  # noqa: F401
