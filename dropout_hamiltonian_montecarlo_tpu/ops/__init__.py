"""Core sampler ops: pytree arithmetic, integrators, metrics, adaptation."""

from . import adaptation, integrators, kron_metric, metrics, tree

__all__ = ["tree", "integrators", "metrics", "adaptation", "kron_metric"]
