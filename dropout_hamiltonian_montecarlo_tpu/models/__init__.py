"""Model zoo (parity with /root/reference/hamiltonian/models/ — SURVEY.md §2)."""

from .base import Model
from .gaussian import Gaussian
from .mvn_gaussian import MVNGaussian
from .logistic import Logistic
from .softmax import Softmax
from .poisson import Poisson
from .mlp import DropoutMLP

__all__ = [
    "Model",
    "Gaussian",
    "MVNGaussian",
    "Logistic",
    "Softmax",
    "Poisson",
    "DropoutMLP",
]
