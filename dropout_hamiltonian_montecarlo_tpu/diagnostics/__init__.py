"""Convergence diagnostics (new capability — the reference has none,
SURVEY.md §5 'no ESS/R-hat anywhere')."""

from .ess import effective_sample_size
from .rhat import potential_scale_reduction, split_rhat
from .summary import summarize

__all__ = [
    "effective_sample_size",
    "potential_scale_reduction",
    "split_rhat",
    "summarize",
]
