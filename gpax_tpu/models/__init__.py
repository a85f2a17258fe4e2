from .gp import ExactGP
from .vigp import viGP
from .sparse_gp import viSparseGP
from .linreg import LinReg
from .spm import sPM
from .bnn import BNN
from .dkl import DKL
from .vidkl import viDKL

__all__ = ["ExactGP", "viGP", "viSparseGP", "LinReg", "sPM", "BNN", "DKL", "viDKL"]
