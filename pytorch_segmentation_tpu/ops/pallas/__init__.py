"""Pallas TPU kernels for the framework's hot fused ops."""

from .eval_confusion import fused_eval_confusion
from .softmax_ce import fused_upsample_ce

__all__ = ["fused_upsample_ce", "fused_eval_confusion"]
