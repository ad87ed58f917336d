"""Utility functions (parity with /root/reference/hamiltonian/utils.py)."""

from .preprocessing import MinMaxScaler, flatten, one_hot
from .gradcheck import check_gradient

__all__ = ["one_hot", "MinMaxScaler", "flatten", "check_gradient"]
