"""Inference layer (parity with /root/reference/hamiltonian/inference/ — SURVEY.md §2)."""

from . import (
    base,
    chees,
    hmc,
    metropolis,
    nuts,
    sampling,
    sgd,
    sgmcmc,
    smc,
    vi,
    warmup,
)

__all__ = [
    "base",
    "chees",
    "hmc",
    "metropolis",
    "nuts",
    "sampling",
    "sgd",
    "sgmcmc",
    "smc",
    "vi",
    "warmup",
]
