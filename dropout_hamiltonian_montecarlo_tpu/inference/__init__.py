"""Inference layer (parity with /root/reference/hamiltonian/inference/ — SURVEY.md §2)."""

from . import base, hmc, metropolis, sampling, sgd, sgmcmc, vi, warmup

__all__ = [
    "base",
    "hmc",
    "metropolis",
    "sampling",
    "sgd",
    "sgmcmc",
    "vi",
    "warmup",
]
