"""Convergence diagnostics (new capability — the reference has none,
SURVEY.md §5 'no ESS/R-hat anywhere')."""

from .ess import effective_sample_size
from .rhat import potential_scale_reduction, split_rhat
from .summary import summarize
from .calibration import (
    calibration_report,
    expected_calibration_error,
    posterior_predictive_probs,
    predictive_nll,
    reliability_bins,
)

__all__ = [
    "effective_sample_size",
    "potential_scale_reduction",
    "split_rhat",
    "summarize",
    "calibration_report",
    "expected_calibration_error",
    "posterior_predictive_probs",
    "predictive_nll",
    "reliability_bins",
]
