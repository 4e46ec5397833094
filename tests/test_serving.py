"""Serving daemon (serve.py / pytorch_segmentation_tpu/serving.py).

Contract: concurrent POST /predict requests coalesce into one padded
statically-shaped device batch; each response is the mask of ITS image at
its own resolution; /healthz reports server state; undecodable bodies are
a client error (400), not a server crash.
"""

import json
import threading
import urllib.error
import urllib.request

import cv2
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_segmentation_tpu.engine.trainer import ModelBundle
from pytorch_segmentation_tpu.serving import MaskServer


class TinyCNN(nn.Module):
    num_classes: int = 3

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(8, (3, 3), padding="SAME")(x)
        x = nn.relu(x)
        return nn.Conv(self.num_classes, (1, 1))(x)


def _bundle(rng=0, num_classes=3, hw=(32, 32)):
    model = TinyCNN(num_classes=num_classes)
    variables = model.init({"params": jax.random.PRNGKey(rng)},
                           jnp.zeros((1, *hw, 3)), train=False)
    return ModelBundle(model, variables["params"], {})


@pytest.fixture
def server():
    srv = MaskServer(_bundle(), img_size=(32, 32), max_batch=4,
                     batch_window_ms=30.0)
    host, port = srv.start(port=0)[:2]
    yield srv, f"http://{host}:{port}"
    srv.stop()


def _png_bytes(img_bgr):
    ok, buf = cv2.imencode(".png", img_bgr)
    assert ok
    return buf.tobytes()


def _post(url, body, timeout=60):
    req = urllib.request.Request(url, data=body, method="POST")
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.read()


def test_healthz_and_roundtrip(server):
    srv, base = server
    with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
        info = json.loads(r.read())
    assert info["status"] == "ok"
    assert info["model"] == "TinyCNN"
    assert info["img_size"] == [32, 32]

    img = np.random.RandomState(0).randint(0, 255, (32, 32, 3), np.uint8)
    raw = _post(base + "/predict?format=raw", _png_bytes(img))
    mask = cv2.imdecode(np.frombuffer(raw, np.uint8), cv2.IMREAD_GRAYSCALE)
    assert mask.shape == (32, 32)

    # must equal the direct device path on the same preprocessed input
    from pytorch_segmentation_tpu.inference import make_mask_fn
    want = np.asarray(make_mask_fn(_bundle(), out_hw=(32, 32))(
        img[None, :, :, ::-1]))[0]
    np.testing.assert_array_equal(mask.astype(np.int32), want)

    # colorized variant: valid color PNG at the image's resolution
    col = _post(base + "/predict", _png_bytes(img))
    seg = cv2.imdecode(np.frombuffer(col, np.uint8), cv2.IMREAD_COLOR)
    assert seg.shape == (32, 32, 3)


def test_native_resolution_resize(server):
    srv, base = server
    # a 48x40 request: resized to 32x32 for the model, mask returned 48x40
    img = np.random.RandomState(1).randint(0, 255, (48, 40, 3), np.uint8)
    raw = _post(base + "/predict?format=raw", _png_bytes(img))
    mask = cv2.imdecode(np.frombuffer(raw, np.uint8), cv2.IMREAD_GRAYSCALE)
    assert mask.shape == (48, 40)
    assert set(np.unique(mask)) <= {0, 1, 2}


def test_concurrent_requests_coalesce(server):
    srv, base = server
    imgs = [np.random.RandomState(10 + i).randint(0, 255, (32, 32, 3),
                                                  np.uint8)
            for i in range(4)]
    results = [None] * 4

    def worker(i):
        raw = _post(base + "/predict?format=raw", _png_bytes(imgs[i]))
        results[i] = cv2.imdecode(np.frombuffer(raw, np.uint8),
                                  cv2.IMREAD_GRAYSCALE)

    before = dict(srv.stats)
    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert all(r is not None for r in results)
    # per-request correctness inside the coalesced batch
    from pytorch_segmentation_tpu.inference import make_mask_fn
    mask_fn = make_mask_fn(_bundle(), out_hw=(32, 32))
    for i in range(4):
        want = np.asarray(mask_fn(imgs[i][None, :, :, ::-1]))[0]
        np.testing.assert_array_equal(results[i].astype(np.int32), want)
    made_requests = srv.stats["requests"] - before["requests"]
    made_batches = srv.stats["batches"] - before["batches"]
    assert made_requests == 4
    # the 30 ms window must have coalesced at least some of the 4
    assert made_batches < 4


def test_int8_and_tta_paths_wire_up():
    """int8 routes to quant.make_quant_mask_fn (fused argmax twin);
    int8+TTA routes to the probs path; both serve correct-shape masks."""
    for kwargs in ({"int8": True}, {"int8": True, "tta_flip": True},
                   {"tta_flip": True, "tta_scales": (0.5,)}):
        srv = MaskServer(_bundle(), img_size=(32, 32), max_batch=2,
                         batch_window_ms=0.0, **kwargs)
        try:
            srv.start(port=0)
            img = np.random.RandomState(5).randint(0, 255, (32, 32, 3),
                                                   np.uint8)
            mask = srv.predict_bytes(_png_bytes(img))
            assert mask.shape == (32, 32)
            assert set(np.unique(mask)) <= {0, 1, 2}
        finally:
            srv.stop()


def test_bad_body_is_client_error(server):
    srv, base = server
    with pytest.raises(urllib.error.HTTPError) as exc_info:
        _post(base + "/predict", b"this is not an image")
    assert exc_info.value.code == 400


def test_dp_serving_mesh_equivalence():
    """Multi-chip serving (inference.make_mask_fn mesh= / serve.py --dp):
    on the 8-device CPU mesh the sharded program must produce the same
    masks as the single-device path, the params must be replicated, and
    the batch must arrive sharded over 'data'. Also: the int8dyn twin
    takes the same mesh, and a non-divisible batch is a clear error."""
    from pytorch_segmentation_tpu.inference import make_mask_fn
    from pytorch_segmentation_tpu.parallel import make_mesh
    from pytorch_segmentation_tpu.quant import make_quant_mask_fn

    bundle = _bundle(hw=(32, 32))
    mesh = make_mesh()
    assert mesh.devices.size == 8
    imgs = np.random.RandomState(7).randint(
        0, 255, (8, 32, 32, 3), np.uint8)

    single = np.asarray(make_mask_fn(bundle, out_hw=(32, 32))(imgs))
    fn = make_mask_fn(bundle, out_hw=(32, 32), mesh=mesh)
    sharded = fn(imgs)
    assert {s.data.shape[0] for s in sharded.addressable_shards} == {1}
    np.testing.assert_array_equal(np.asarray(sharded), single)

    q = make_quant_mask_fn(bundle, out_hw=(32, 32), mesh=mesh)(imgs)
    assert np.asarray(q).shape == (8, 32, 32)

    with pytest.raises(ValueError, match="divisible"):
        fn(imgs[:6])


def test_dp_mask_server_rounds_batch():
    """MaskServer(mesh=...): max_batch rounds up to a multiple of the
    data-axis size and requests serve end to end through the sharded
    program."""
    from pytorch_segmentation_tpu.parallel import make_mesh

    srv = MaskServer(_bundle(), img_size=(32, 32), max_batch=3,
                     batch_window_ms=0.0, mesh=make_mesh())
    assert srv.max_batch == 8  # 3 -> next multiple of 8 devices
    try:
        srv.start(port=0)
        img = np.random.RandomState(9).randint(0, 255, (32, 32, 3),
                                               np.uint8)
        mask = srv.predict_bytes(_png_bytes(img))
        assert mask.shape == (32, 32)
    finally:
        srv.stop()
