"""Parallel layer: mesh-sharded multi-scalar multiplication and helpers."""

from .msm import horner_spine, msm, msm_sharded, window_sums

__all__ = ["horner_spine", "msm", "msm_sharded", "window_sums"]
