from .loss import (compute_loss, focal_bce_loss, lovasz_softmax_loss,
                   softmax_cross_entropy)
from .metrics import compute_metrics, confusion_update
from .rect_loss import rect_loss, rect_targets
from .resize import resize_bilinear, resize_nearest, upsample2x

__all__ = [
    "compute_loss", "softmax_cross_entropy", "focal_bce_loss",
    "lovasz_softmax_loss", "rect_loss", "rect_targets",
    "compute_metrics", "confusion_update",
    "resize_bilinear", "resize_nearest", "upsample2x",
]
