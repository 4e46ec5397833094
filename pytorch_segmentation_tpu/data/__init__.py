from .colormap import VOC_COLORMAP, colorize_mask, mask_from_colors, voc_colormap
from .datasets import (IMAGENET_MEAN, IMAGENET_STD, IMG_EXT, BasicDataset,
                       CocoDataset, CocoInstance, IdImgDataset,
                       SegImgDataset)
from .loader import Batch, DataLoader, Fetcher
from .pipeline import PostFetch, normalize_images

__all__ = [
    "VOC_COLORMAP", "voc_colormap", "colorize_mask", "mask_from_colors",
    "IMG_EXT", "IMAGENET_MEAN", "IMAGENET_STD",
    "BasicDataset", "CocoDataset", "CocoInstance", "IdImgDataset",
    "SegImgDataset",
    "DataLoader", "Fetcher", "Batch", "PostFetch", "normalize_images",
]
