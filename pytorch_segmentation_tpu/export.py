"""Model export: conv-BN folding + StableHLO serialization.

TPU-native analog of the reference's Caffe export path (export2caffe.py:12-22:
load ckpt -> fuse(model) conv-BN fold -> trace -> artifact). Here:

  - `fuse_conv_bn` folds BatchNorm statistics into the preceding conv kernel
    (the `pytorch_modules.utils.fuse` contract, SURVEY.md §2.9). Our ConvNormAct
    blocks keep their structure; after folding, BN becomes a pure bias add
    (scale=1, mean=0, var=1), which XLA folds into the conv at compile time.
  - `export_stablehlo` serializes the jitted inference function with
    jax.export — the portable deployment artifact (StableHLO bytes run under
    any XLA runtime: TPU serving, IREE, TF SavedModel wrapping).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .nn.blocks import BatchNorm2d

__all__ = ["fuse_conv_bn", "export_stablehlo"]

# single source of truth: the folding math must cancel exactly the eps the
# BatchNorm2d module applies at inference (y = (x-mean)*scale/sqrt(var+eps))
_BN_EPS = BatchNorm2d.epsilon


def _is_conv_bn_block(d: dict) -> bool:
    return (isinstance(d, dict) and "conv" in d and "bn" in d
            and isinstance(d["conv"], dict) and "kernel" in d["conv"])


def fuse_conv_bn(params, batch_stats):
    """Fold BN running stats into conv kernels for every ConvNormAct block.

    Returns (fused_params, fused_batch_stats). After fusion the BN reduces to
    y = conv(x, k') + b' with k' = k * gamma/sqrt(var+eps) (per out-channel)
    and b' = beta - mean * gamma/sqrt(var+eps), expressed by setting
    scale=1, mean=0, var=1-eps, bias=b' so no module changes are needed.
    """
    params = jax.tree.map(np.asarray, params)
    batch_stats = jax.tree.map(np.asarray, batch_stats)

    def walk(p: dict, s: dict):
        for key, sub in list(p.items()):
            if not isinstance(sub, dict):
                continue
            stats = s.get(key) if isinstance(s, dict) else None
            if _is_conv_bn_block(sub) and stats is not None and "bn" in stats:
                kernel = sub["conv"]["kernel"]  # HWIO
                gamma = sub["bn"].get("scale", np.ones(kernel.shape[-1],
                                                       np.float32))
                beta = sub["bn"].get("bias", np.zeros(kernel.shape[-1],
                                                      np.float32))
                mean = stats["bn"]["mean"]
                var = stats["bn"]["var"]
                factor = gamma / np.sqrt(var + _BN_EPS)
                sub["conv"]["kernel"] = (kernel * factor).astype(kernel.dtype)
                sub["bn"]["scale"] = np.ones_like(gamma)
                sub["bn"]["bias"] = (beta - mean * factor).astype(beta.dtype)
                stats["bn"]["mean"] = np.zeros_like(mean)
                stats["bn"]["var"] = np.full_like(var, 1.0 - _BN_EPS)
            else:
                walk(sub, stats if isinstance(stats, dict) else {})

    # wrap so the walk also sees a bare ConvNormAct at the root
    walk({"root": params}, {"root": batch_stats})
    to_jnp = lambda t: jax.tree.map(jnp.asarray, t)
    return to_jnp(params), to_jnp(batch_stats)


def export_stablehlo(model, params, batch_stats, img_hw, batch_size: int = 1,
                     path: str | None = None, with_softmax: bool = True,
                     quant_stats=None, int8: bool = False):
    """Serialize the jitted inference fn (normalize-free: takes normalized
    NHWC f32) to StableHLO bytes; optionally write to `path`.

    quant_stats / int8: export the int8 PTQ forward instead (quant.py) —
    pass calibrated quant_stats for static activation scales, or int8=True
    alone for dynamic scales. The int8 convs and rescale chain serialize
    like any other StableHLO ops, so the deployment artifact keeps the
    quantized MXU path.

    Returns (serialized_bytes, mlir_text).
    """
    from jax import export as jax_export

    h, w = img_hw
    variables = {"params": params, "batch_stats": batch_stats}
    mode = None
    if quant_stats is not None:
        mode = "int8"
        variables = {**variables, "quant_stats": quant_stats}
    elif int8:
        mode = "int8dyn"

    def infer(x):
        if mode is not None:
            from .quant import quant_mode
            with quant_mode(mode):
                logits = model.apply(variables, x, train=False)
        else:
            logits = model.apply(variables, x, train=False)
        if with_softmax:
            return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return logits

    x_spec = jax.ShapeDtypeStruct((batch_size, h, w, 3), jnp.float32)
    exported = jax_export.export(jax.jit(infer))(x_spec)
    blob = exported.serialize()
    mlir = exported.mlir_module()
    if path:
        with open(path, "wb") as f:
            f.write(blob)
    return blob, mlir
