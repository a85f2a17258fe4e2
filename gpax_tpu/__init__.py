"""gpax-tpu: a TPU-native Bayesian Gaussian-process framework.

Provides the full capability surface of gpax (fully-Bayesian / variational GPs, deep
kernel learning, multi-task GPs, acquisition functions, hypothesis learning) on top of
an in-house on-device inference substrate (distributions, effect handlers, jitted
NUTS and SVI) designed for TPU: MXU-form gram matrices, Cholesky-solve posterior math
batched across posterior samples, and sharding over `jax.sharding.Mesh` for chains,
ensembles, and acquisition grids.
"""

from ._version import __version__
from . import acquisition, distributions, infer, kernels, ppl, priors, utils
from .config import enable_x64, get_config, set_config
from .hypo import sample_next
from .models import (
    BNN,
    DKL,
    UIGP,
    CoregGP,
    ExactGP,
    LinReg,
    MeasuredNoiseGP,
    MultiTaskGP,
    VarNoiseGP,
    iBNN,
    sPM,
    vExactGP,
    vi_iBNN,
    viDKL,
    viGP,
    viMTDKL,
    viSparseGP,
)

__all__ = [
    "__version__",
    "priors",
    "utils",
    "kernels",
    "acquisition",
    "distributions",
    "infer",
    "ppl",
    "enable_x64",
    "get_config",
    "set_config",
    "ExactGP",
    "vExactGP",
    "DKL",
    "viDKL",
    "iBNN",
    "vi_iBNN",
    "MultiTaskGP",
    "viMTDKL",
    "viGP",
    "sPM",
    "VarNoiseGP",
    "UIGP",
    "MeasuredNoiseGP",
    "viSparseGP",
    "CoregGP",
    "BNN",
    "LinReg",
    "sample_next",
]
