"""Batched HTTP mask-serving runtime (beyond the reference: it has no
serving daemon — its inference.py:17-34 is a one-shot directory CLI).

TPU-native design points:

- ONE compiled program: every request batch is padded to a fixed
  `max_batch` so the device sees a single static shape — no per-size
  recompiles, the XLA executable is reused for the whole server lifetime.
- Micro-batching: concurrent requests within a `batch_window_ms` window
  coalesce into one device batch (TPU serving throughput is batch-driven:
  bf16 bs1 = 153 img/s vs bs32 = 842 img/s on DLV3+ 513^2 — PERF.md).
  A single dispatcher thread owns the device; handler threads block on a
  per-request event, so the GIL is released during device execution.
- The device path is inference.make_mask_fn: normalize -> forward ->
  fused Pallas upsample+argmax (int8 PTQ / EMA weights / flip+multi-scale
  TTA all compose via the same flags as the CLIs).

Endpoints:
  GET  /healthz            -> {"status": "ok", "model": ..., ...}
  POST /predict            -> body: encoded image (jpg/png, any size);
                              response: VOC-palette PNG mask at the
                              image's own resolution
  POST /predict?format=raw -> response: PNG with raw class ids (grayscale)

Stdlib http.server + threads only — no web framework dependencies.
"""

from __future__ import annotations

import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import cv2
import numpy as np

__all__ = ["MaskServer"]


class _Pending:
    __slots__ = ("image", "done", "mask", "error")

    def __init__(self, image):
        self.image = image  # [h, w, 3] u8 RGB at model input size
        self.done = threading.Event()
        self.mask = None
        self.error = None


class MaskServer:
    """Owns the compiled serving program and the micro-batching dispatcher.

    model: engine.trainer.ModelBundle; img_size: (W, H) model input size
    (requests are resized to it, masks resized back to each request's own
    resolution with nearest interpolation — the reference CLI contract).
    """

    def __init__(self, model, img_size=(513, 513), max_batch: int = 8,
                 batch_window_ms: float = 5.0, legacy_preproc: bool = False,
                 int8: bool = False, quant_stats=None, tta_flip: bool = False,
                 tta_scales=(), colormap=None, mesh=None):
        from .data.colormap import VOC_COLORMAP
        from .inference import make_infer_fn, make_mask_fn

        self.img_size = (int(img_size[0]), int(img_size[1]))  # (W, H)
        self.max_batch = max(1, int(max_batch))
        if mesh is not None:
            # multi-chip serving (serve.py --dp): the padded batch shards
            # over 'data', so it must divide by the axis size
            n = mesh.shape[mesh.axis_names[0]]
            self.max_batch = -(-self.max_batch // n) * n
            if int8 and (tta_flip or tta_scales):
                raise ValueError("--dp composes with --int8 or TTA, not "
                                 "the int8+TTA probability path (host "
                                 "argmax; shard it yourself if needed)")
        self.batch_window_s = max(0.0, float(batch_window_ms)) / 1e3
        self.colormap = colormap if colormap is not None else VOC_COLORMAP
        hw = (self.img_size[1], self.img_size[0])
        if int8 or quant_stats is not None:
            if tta_flip or tta_scales:
                # int8 + TTA: serve probabilities via make_infer_fn (the
                # quantized forward composes with the TTA ensemble there);
                # argmax on host
                self._probs_fn = make_infer_fn(
                    model, legacy_preproc, int8=True,
                    quant_stats=quant_stats, tta_flip=tta_flip,
                    tta_scales=tta_scales)
                self._mask_fn = None
            else:
                # int8 twin of the fused mask path (quant.py)
                from .quant import make_quant_mask_fn
                self._mask_fn = make_quant_mask_fn(
                    model, out_hw=hw, legacy_preproc=legacy_preproc,
                    quant_stats=quant_stats, mesh=mesh)
                self._probs_fn = None
        else:
            self._mask_fn = make_mask_fn(model, out_hw=hw,
                                         legacy_preproc=legacy_preproc,
                                         tta_flip=tta_flip,
                                         tta_scales=tta_scales, mesh=mesh)
            self._probs_fn = None
        self.model_name = type(model.module).__name__
        self._queue: queue.Queue = queue.Queue()
        self._stop = threading.Event()
        self._dispatcher = threading.Thread(target=self._dispatch_loop,
                                            daemon=True)
        self._httpd = None
        self.stats = {"requests": 0, "batches": 0}

    # -- device side ------------------------------------------------------

    def warmup(self):
        """Compile the padded-batch program before serving traffic."""
        w, h = self.img_size
        dummy = np.zeros((self.max_batch, h, w, 3), np.uint8)
        self._run_batch(dummy)

    def _run_batch(self, images_u8):
        if self._mask_fn is not None:
            return np.asarray(self._mask_fn(images_u8))
        probs = np.asarray(self._probs_fn(images_u8))
        return probs.argmax(axis=-1).astype(np.int32)

    def _dispatch_loop(self):
        while not self._stop.is_set():
            try:
                first = self._queue.get(timeout=0.1)
            except queue.Empty:
                continue
            batch = [first]
            t_end = time.perf_counter() + self.batch_window_s
            while len(batch) < self.max_batch:
                remaining = t_end - time.perf_counter()
                if remaining <= 0:
                    # drain whatever is already queued, but stop waiting
                    try:
                        batch.append(self._queue.get_nowait())
                        continue
                    except queue.Empty:
                        break
                try:
                    batch.append(self._queue.get(timeout=remaining))
                except queue.Empty:
                    break
            # pad to the static max_batch shape (ONE compiled program)
            w, h = self.img_size
            images = np.zeros((self.max_batch, h, w, 3), np.uint8)
            for i, p in enumerate(batch):
                images[i] = p.image
            try:
                masks = self._run_batch(images)
                for i, p in enumerate(batch):
                    p.mask = masks[i]
            except Exception as e:  # surface device errors to the clients
                for p in batch:
                    p.error = e
            self.stats["batches"] += 1
            for p in batch:
                p.done.set()

    # -- request side -----------------------------------------------------

    def predict_bytes(self, body: bytes, timeout: float = 60.0):
        """Decode an encoded image, run the batched device path, return
        the int32 class-id mask at the image's ORIGINAL resolution."""
        arr = np.frombuffer(body, np.uint8)
        img = cv2.imdecode(arr, cv2.IMREAD_COLOR)  # BGR
        if img is None:
            raise ValueError("request body is not a decodable image")
        oh, ow = img.shape[:2]
        resized = cv2.resize(img, self.img_size)[:, :, ::-1]  # -> RGB
        pending = _Pending(np.ascontiguousarray(resized))
        self._queue.put(pending)
        self.stats["requests"] += 1
        if not pending.done.wait(timeout):
            raise TimeoutError("serving dispatch timed out")
        if pending.error is not None:
            raise pending.error
        mask = pending.mask
        if (oh, ow) != mask.shape:
            mask = cv2.resize(mask.astype(np.int32), (ow, oh),
                              interpolation=cv2.INTER_NEAREST)
        return mask

    # -- HTTP layer -------------------------------------------------------

    def _handler_class(server):  # noqa: N805 — closure over the server
        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet by default
                pass

            def do_GET(self):
                if self.path.split("?")[0] != "/healthz":
                    self.send_error(404)
                    return
                body = json.dumps({
                    "status": "ok", "model": server.model_name,
                    "img_size": list(server.img_size),
                    "max_batch": server.max_batch,
                    **server.stats}).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_POST(self):
                path, _, q = self.path.partition("?")
                if path != "/predict":
                    self.send_error(404)
                    return
                raw = "format=raw" in q
                length = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(length)
                try:
                    mask = server.predict_bytes(body)
                except ValueError as e:
                    self.send_error(400, str(e))
                    return
                except Exception as e:
                    self.send_error(500, f"{type(e).__name__}: {e}")
                    return
                if raw:
                    out = mask.astype(np.uint8)  # class ids (<=255)
                else:
                    from .data.colormap import colorize_mask
                    out = colorize_mask(mask, server.colormap)
                ok, png = cv2.imencode(".png", out)
                if not ok:
                    self.send_error(500, "png encode failed")
                    return
                data = png.tobytes()
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)
        return Handler

    def start(self, host: str = "127.0.0.1", port: int = 8500,
              warmup: bool = True):
        """Compile, start the dispatcher and the HTTP listener. Returns the
        bound (host, port) — pass port=0 for an ephemeral port (tests)."""
        if warmup:
            self.warmup()
        self._dispatcher.start()
        self._httpd = ThreadingHTTPServer((host, port),
                                          self._handler_class())
        threading.Thread(target=self._httpd.serve_forever,
                         daemon=True).start()
        return self._httpd.server_address

    def stop(self):
        self._stop.set()
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
        if self._dispatcher.is_alive():
            self._dispatcher.join(timeout=5)

    def serve_forever(self):
        """Block the main thread (CLI use)."""
        try:
            self._stop.wait()
        except KeyboardInterrupt:
            self.stop()
