"""bs=1 serving latency verdict (VERDICT r3 next #8).

The reference's inference.py mode is effectively batch-1
(utils/inference.py:8-21); our serving numbers are throughput-batched
(bs32). This measures where batch-1 latency actually goes:

1. DEVICE latency: chained executions of the fused serve program
   (normalize -> DLV3+ -> fused upsample+argmax) at bs=1 — the floor a
   co-located client would see.
2. WALL latency: one dispatch + host read per call — what a client of
   THIS tunneled chip sees (includes the ~33 ms tunnel round trip).
3. Program-structure floor: executable fusion count x the measured
   per-op dispatch floor (PERF.md: small-shape ops sit on ~3 ms floors
   at 129^2; at bs1 most of DLV3+'s ~200 fused ops are far below the
   shapes that fill the MXU), plus a bs-sweep point to show where
   compute starts to dominate.
"""

import sys
import time

import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, ".")
from pytorch_segmentation_tpu.data.pipeline import normalize_images
from pytorch_segmentation_tpu.engine.steps import create_train_state
from pytorch_segmentation_tpu.models import DeepLabV3Plus
from pytorch_segmentation_tpu.ops.pallas.upsample_argmax import (
    fused_upsample_argmax)
from pytorch_segmentation_tpu.utils.runtime import setup_runtime


def main():
    setup_runtime()
    assert jax.devices()[0].platform == "tpu"
    img = 513
    model = DeepLabV3Plus(num_classes=21, dtype=jnp.bfloat16,
                          full_res_output=False)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3), jnp.float32),
                               optax.sgd(1e-3))

    def make_serve():
        @jax.jit
        def serve(params, stats, images_u8, tok):
            x = normalize_images(images_u8 + tok, jnp.float32)
            logits = model.apply({"params": params, "batch_stats": stats},
                                 x, train=False)
            masks = fused_upsample_argmax(logits, (img, img),
                                          align_corners=True)
            return masks, (masks[0, 0, 0] * 0).astype(jnp.uint8)
        return serve

    serve = make_serve()
    for bs in (1, 2, 4, 8):
        images = jax.random.randint(jax.random.PRNGKey(3),
                                    (bs, img, img, 3), 0, 255, jnp.uint8)
        tok = jnp.zeros((), jnp.uint8)
        masks, tok = serve(state.params, state.batch_stats, images, tok)
        int(masks[0, 0, 0])
        # device latency: chained reps, one host read per window
        n, best = 16, float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            for _ in range(n):
                masks, tok = serve(state.params, state.batch_stats,
                                   images, tok)
            int(tok)
            best = min(best, (time.perf_counter() - t0) / n)
        dev_ms = best * 1e3
        # wall latency: dispatch + read per call (the tunnel's view)
        wall = float("inf")
        for _ in range(8):
            t0 = time.perf_counter()
            masks, tok = serve(state.params, state.batch_stats, images,
                               tok)
            int(tok)
            wall = min(wall, time.perf_counter() - t0)
        print(f"bs{bs}: device {dev_ms:6.2f} ms/call "
              f"({bs / best:6.1f} img/s) | wall {wall * 1e3:6.2f} ms",
              flush=True)
        if bs == 1:
            try:
                txt = serve.lower(state.params, state.batch_stats, images,
                                  tok).compile().as_text()
                nfus = txt.count(" fusion(") + txt.count(" convolution(")
                print(f"bs1 executable: ~{nfus} fused ops -> "
                      f"{dev_ms * 1e3 / max(nfus, 1):.0f} us/op mean "
                      f"(per-op floor evidence)", flush=True)
            except Exception as e:
                print("hlo text unavailable:", e)


if __name__ == "__main__":
    main()
