from .visualize import show_batch

__all__ = ["show_batch"]
