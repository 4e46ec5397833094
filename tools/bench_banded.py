"""Microbench: banded-matmul resample pass vs the warp-gather cost it
replaces (PERF.md: packed single-tap gather ~64 ms of the 99 ms default
policy at 32x513^2; exact 4-tap 263 ms).

Chained-scan protocol (CLAUDE.md): reps inside ONE jit, the planes
operand loop-carried so XLA can neither hoist nor DCE the op; host sync
via a float() read that depends on the whole chain."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from pytorch_segmentation_tpu.ops.pallas.banded_resample import (
    banded_resample_rows)

B, R, C = 32, 520, 640
REPS = 20


def main():
    rng = np.random.default_rng(0)
    planes = jnp.asarray(rng.integers(0, 256, (B, 4, R, C)),
                         jnp.bfloat16)
    base = np.linspace(2, C - 3, C)[None, None, :]
    slope = rng.uniform(0.75, 1.3, (B, R, 1))
    coords = jnp.asarray(np.clip(base * slope + rng.uniform(-3, 3,
                                                            (B, R, C)),
                                 0, C - 1), jnp.float32)
    ubil = jnp.asarray(rng.integers(0, 2, (B,)).astype(bool))

    @jax.jit
    def chain(p0):
        def body(p, _):
            out = banded_resample_rows(p, coords, ubil)
            return out.astype(jnp.bfloat16), out[0, 0, 0, 0]
        p, keep = jax.lax.scan(body, p0, None, length=REPS)
        return p, keep.sum()

    p, s = chain(planes)
    print("compiled; first value", float(s))
    best = 1e9
    for _ in range(4):
        t0 = time.time()
        p2, s = chain(planes)
        _ = float(s)
        best = min(best, (time.time() - t0) / REPS)
    elems = B * R * C
    print(f"banded pass: {best * 1e3:.2f} ms "
          f"({best * 1e9 / elems:.2f} ns/coord-elem, "
          f"{4 * elems / best / 1e9:.1f} Gelem/s planes) "
          f"[B={B} R={R} C=W={C}]")


if __name__ == "__main__":
    main()
