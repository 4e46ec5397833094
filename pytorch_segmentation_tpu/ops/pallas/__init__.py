"""Pallas TPU kernels for the framework's hot fused ops."""

from .softmax_ce import fused_upsample_ce

__all__ = ["fused_upsample_ce"]
