"""Core sampler ops: pytree arithmetic, integrators, metrics, adaptation."""

from . import adaptation, integrators, metrics, tree

__all__ = ["tree", "integrators", "metrics", "adaptation"]
