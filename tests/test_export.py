"""Conv-BN fusion numerical parity + StableHLO export round-trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_segmentation_tpu.export import export_stablehlo, fuse_conv_bn
from pytorch_segmentation_tpu.models import UNet
from pytorch_segmentation_tpu.nn.blocks import ConvNormAct


@pytest.fixture(scope="module")
def trained_block():
    """A ConvNormAct with non-trivial BN stats (run a few train steps)."""
    m = ConvNormAct(8, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3)) * 3 + 1
    variables = m.init(jax.random.PRNGKey(1), x, train=False)
    for i in range(3):
        _, mut = m.apply(variables, x + i, train=True,
                         mutable=["batch_stats"])
        variables = {"params": variables["params"], **mut}
    return m, variables, x


def test_fuse_conv_bn_parity(trained_block):
    m, variables, x = trained_block
    ref = m.apply(variables, x, train=False)
    fp, fs = fuse_conv_bn(variables["params"], variables["batch_stats"])
    fused = m.apply({"params": fp, "batch_stats": fs}, x, train=False)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    # kernel actually changed (stats were non-trivial)
    assert not np.allclose(np.asarray(fp["conv"]["kernel"]),
                           np.asarray(variables["params"]["conv"]["kernel"]))
    # BN reduced to a bias add
    np.testing.assert_allclose(np.asarray(fs["bn"]["mean"]), 0.0)
    np.testing.assert_allclose(np.asarray(fp["bn"]["scale"]), 1.0)


def test_fuse_full_model_parity():
    m = UNet(num_classes=2, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
    variables = m.init(jax.random.PRNGKey(1), x, train=False)
    _, mut = m.apply(variables, x, train=True, mutable=["batch_stats"])
    variables = {"params": variables["params"], **mut}
    ref = m.apply(variables, x, train=False)
    fp, fs = fuse_conv_bn(variables["params"], variables["batch_stats"])
    fused = m.apply({"params": fp, "batch_stats": fs}, x, train=False)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_stablehlo_export(tmp_path):
    m = UNet(num_classes=2, dtype=jnp.float32)
    variables = m.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 32, 32, 3)), train=False)
    out = str(tmp_path / "unet.stablehlo")
    blob, mlir = export_stablehlo(m, variables["params"],
                                  variables["batch_stats"], (32, 32),
                                  path=out)
    assert len(blob) > 1000
    assert "stablehlo" in str(mlir) or "mhlo" in str(mlir)
    import os.path as osp
    assert osp.getsize(out) == len(blob)
    # round-trip: deserialize and call
    from jax import export as jax_export
    rt = jax_export.deserialize(blob)
    y = rt.call(jnp.zeros((1, 32, 32, 3), jnp.float32))
    assert y.shape == (1, 32, 32, 2)
    np.testing.assert_allclose(np.asarray(jnp.sum(y, -1)), 1.0, rtol=1e-5)
