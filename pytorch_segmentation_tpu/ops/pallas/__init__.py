"""Pallas TPU kernels for the framework's hot fused ops."""

from .eval_confusion import fused_eval_confusion
from .softmax_ce import fused_upsample_ce
from .upsample_argmax import fused_upsample_argmax

__all__ = ["fused_upsample_ce", "fused_eval_confusion",
           "fused_upsample_argmax"]
