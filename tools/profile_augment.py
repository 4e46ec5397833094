#!/usr/bin/env python3
"""Trace the default on-device augmentation batch (32x513^2) and print the
per-op breakdown via tools/xplane_summary.py.

Usage: python tools/profile_augment.py [outdir=/tmp/pseg_aug_trace]
"""

import glob
import os
import sys

import jax
import jax.numpy as jnp


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pseg_aug_trace"
    from pytorch_segmentation_tpu.data.augment import (AugmentConfig,
                                                       make_augment_fn)
    from pytorch_segmentation_tpu.utils.runtime import setup_runtime

    setup_runtime()
    on_tpu = jax.devices()[0].platform == "tpu"
    b, h = (32, 513) if on_tpu else (4, 129)
    fn = make_augment_fn(AugmentConfig())
    images = jnp.ones((b, h, h, 3), jnp.uint8)
    segs = jnp.zeros((b, h, h), jnp.uint8)

    @jax.jit
    def run(rng, images, segs):
        out_i, out_s = fn(rng, images, segs)
        return jnp.sum(out_i[0, 0, 0].astype(jnp.int32))

    rng = jax.random.PRNGKey(0)
    v = int(run(rng, images, segs))
    with jax.profiler.trace(outdir):
        for i in range(3):
            v = int(run(jax.random.fold_in(rng, v % 7 + i), images, segs))
    pbs = sorted(glob.glob(os.path.join(outdir,
                                        "plugins/profile/*/*.xplane.pb")))
    print("trace:", pbs[-1] if pbs else "NOT FOUND")
    if pbs:
        sys.path.insert(0, os.path.dirname(__file__))
        import xplane_summary
        xplane_summary.main(pbs[-1])


if __name__ == "__main__":
    main()
