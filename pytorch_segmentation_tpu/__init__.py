"""pytorch_segmentation_tpu — a TPU-native (JAX/XLA/Pallas) semantic
segmentation framework with the full capabilities of
WoodsGao/pytorch_segmentation, redesigned for TPU hardware:

  - NHWC layout, bf16 compute / f32 params, MXU-matmul bilinear resizing
  - jit-compiled train/eval steps; data parallelism via jax.sharding.Mesh
    + shard_map with psum gradient/metric reduction over ICI
  - on-device batched augmentation replacing the imgaug CPU pipeline
  - Pallas kernels for hot fused ops
"""

__version__ = "0.1.0"
