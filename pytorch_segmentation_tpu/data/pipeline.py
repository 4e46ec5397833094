"""Device-side batch pipeline: augmentation hook + normalization +
multi-scale resize.

This is the TPU-native rebuild of the reference's `post_fetch_fn`
(utils/datasets.py:199-213) plus the imgaug augmentation that the reference
ran per-sample in DataLoader workers. Everything here is one jitted function
per (shape, train) signature; per-batch randomness comes from folding a step
counter into a base PRNG key on the host (cheap) so the jitted function stays
pure.

Multi-scale: the reference snaps a random 0.7–1.5 scale of the base size to
multiples of 32 and resizes the *normalized* batch with nearest interpolation
(F.interpolate default). We pick the size on the host (a handful of distinct
sizes -> a bounded set of XLA specializations) and resize on device.
"""

from __future__ import annotations

import random as _pyrandom

import jax
import jax.numpy as jnp
import numpy as np

from .datasets import IMAGENET_MEAN, IMAGENET_STD
from .loader import Batch
from .resize_host import multi_scale_sizes
from ..ops.resize import resize_nearest

__all__ = ["normalize_images", "PostFetch", "multi_scale_sizes"]


def normalize_images(images: jax.Array, dtype=jnp.float32) -> jax.Array:
    """uint8 RGB NHWC -> ImageNet-normalized float NHWC
    (reference utils/datasets.py:199-205)."""
    mean = jnp.asarray(IMAGENET_MEAN, dtype=jnp.float32)
    std = jnp.asarray(IMAGENET_STD, dtype=jnp.float32)
    x = images.astype(jnp.float32)
    return ((x - mean) / std).astype(dtype)


class PostFetch:
    """Callable applied to each host Batch; returns device arrays
    (images f32/bf16 normalized, segs int32, valid int)."""

    def __init__(self, augment_fn=None, multi_scale: bool = False,
                 base_hw=None, seed: int = 0, dtype=jnp.float32,
                 sharding=None, mix_fn=None):
        self.augment_fn = augment_fn
        self.mix_fn = mix_fn
        self.multi_scale = multi_scale
        self.base_hw = base_hw
        self.dtype = dtype
        self.sharding = sharding
        self._rng = _pyrandom.Random(seed)
        self._base_key = jax.random.PRNGKey(seed)
        self._step = 0
        self._jitted = {}

    def _fn(self, out_hw):
        key = (out_hw, self.augment_fn is not None,
               self.mix_fn is not None)
        if key not in self._jitted:
            augment_fn = self.augment_fn
            mix_fn = self.mix_fn
            dtype = self.dtype
            base_key = self._base_key

            def run(step, images, segs):
                # fold the batch counter INSIDE the program: a host-side
                # jax.random.fold_in per batch is a separate tiny dispatch
                # that serializes against the previous batch's transfers on
                # this tunneled runtime (~190 ms/batch measured —
                # tools/bench_e2e_diag.py)
                if mix_fn is not None:
                    # batch-level CutMix/Mosaic on the uint8 batch BEFORE
                    # the per-image policy (data/mix.py): the stitched
                    # canvas is then augmented as one image. Double-fold
                    # (0x6d69 = 'mi') keeps this stream disjoint from the
                    # augment policy's fold_in(base_key, step) at EVERY
                    # step, not just this one.
                    rng = jax.random.fold_in(
                        jax.random.fold_in(base_key, np.uint32(0x6d69)),
                        step)
                    images, segs = mix_fn(rng, images, segs)
                if augment_fn is not None:
                    rng = jax.random.fold_in(base_key, step)
                    images, segs = augment_fn(rng, images, segs)
                images = normalize_images(images, dtype=dtype)
                segs = segs.astype(jnp.int32)
                if out_hw is not None:
                    # nearest, matching torch F.interpolate default
                    images = resize_nearest(images, out_hw)
                return images, segs

            kw = {}
            if self.sharding is not None:
                # outputs carry exactly the injected batch sharding, so the
                # engine's put_global_batch recognizes them and passes them
                # through without any further placement/transfer
                kw["out_shardings"] = (self.sharding, self.sharding)
            self._jitted[key] = jax.jit(run, **kw)
        return self._jitted[key]

    def __call__(self, batch: Batch):
        out_hw = None
        if self.multi_scale and self.base_hw is not None:
            sizes = multi_scale_sizes(self.base_hw)
            out_hw = self._rng.choice(sizes)
        rng = np.uint32(self._step)
        self._step += 1
        if self.sharding is not None and jax.process_count() > 1:
            # multi-host: assemble the GLOBAL batch from each process's rank
            # shard while it is still HOST uint8 — the augment/normalize
            # program then runs SPMD over the whole mesh and its outputs
            # feed the train step directly. (Assembling after the device
            # program would bounce every batch device->host->device;
            # VERDICT r2 Weak #4.) uint8 assembly also moves 4x fewer bytes
            # than normalized f32 would.
            images = jax.make_array_from_process_local_data(
                self.sharding, np.asarray(batch.images))
            segs = jax.make_array_from_process_local_data(
                self.sharding, np.asarray(batch.segs))
        else:
            images = jnp.asarray(batch.images)
            segs = jnp.asarray(batch.segs)
            if self.sharding is not None:
                images = jax.device_put(images, self.sharding)
                segs = jax.device_put(segs, self.sharding)
        images, segs = self._fn(out_hw)(rng, images, segs)
        return images, segs, batch.valid
