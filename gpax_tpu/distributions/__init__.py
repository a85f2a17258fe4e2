from . import constraints
from .transforms import ExpTransform, IdentityTransform, SigmoidTransform, Transform, biject_to
from .distributions import (
    Cauchy,
    Delta,
    Distribution,
    Exponential,
    Gamma,
    HalfCauchy,
    HalfNormal,
    Independent,
    LogNormal,
    LowRankMultivariateNormal,
    MultivariateNormal,
    Normal,
    Uniform,
)

__all__ = [
    "constraints",
    "biject_to",
    "Transform",
    "IdentityTransform",
    "ExpTransform",
    "SigmoidTransform",
    "Distribution",
    "Normal",
    "LogNormal",
    "HalfNormal",
    "Cauchy",
    "HalfCauchy",
    "Gamma",
    "Exponential",
    "Uniform",
    "Delta",
    "Independent",
    "MultivariateNormal",
    "LowRankMultivariateNormal",
]
