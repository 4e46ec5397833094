from .visualize import show_batch

__all__ = ["show_batch"]

# heavier utilities are intentionally not imported here to keep import
# time low: utils.port_torch (pretrained weight porting), utils.synthetic
# (dataset generator), utils.runtime (compile cache / sanitizers)
