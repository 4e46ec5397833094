#!/usr/bin/env python3
"""Trace the PRODUCTION-style augmentation dispatch (prep called per batch,
full outputs materialized) — the scan-chained microbench consumes one pixel
and may be DCE-sliced. Prints the module + top-op breakdown."""

import glob
import os
import sys

import jax
import jax.numpy as jnp


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pseg_prep_trace"
    from pytorch_segmentation_tpu.data.augment import (AugmentConfig,
                                                       make_augment_fn)
    from pytorch_segmentation_tpu.data.pipeline import normalize_images
    from pytorch_segmentation_tpu.utils.runtime import setup_runtime

    setup_runtime()
    on_tpu = jax.devices()[0].platform == "tpu"
    b, h = (32, 513) if on_tpu else (4, 129)
    aug = make_augment_fn(AugmentConfig())

    @jax.jit
    def prep(rng, images, segs):
        img, seg = aug(rng, images, segs)
        return normalize_images(img, jnp.float32), seg

    key = jax.random.PRNGKey(1)
    images = jax.random.randint(key, (b, h, h, 3), 0, 255, jnp.uint8)
    segs = jnp.zeros((b, h, h), jnp.uint8)
    im, sg = prep(key, images, segs)
    float(jnp.max(im))
    with jax.profiler.trace(outdir):
        for i in range(3):
            im, sg = prep(jax.random.fold_in(key, i), images, segs)
        float(jnp.max(im) + jnp.max(sg))
    pbs = sorted(glob.glob(os.path.join(outdir,
                                        "plugins/profile/*/*.xplane.pb")))
    print("trace:", pbs[-1] if pbs else "NOT FOUND")
    if pbs:
        sys.path.insert(0, os.path.dirname(__file__))
        import xplane_summary
        xplane_summary.main(pbs[-1])


if __name__ == "__main__":
    main()
