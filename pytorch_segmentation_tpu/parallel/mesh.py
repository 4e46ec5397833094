"""Device mesh + sharding helpers.

TPU-native replacement for the reference's NCCL/DDP stack (reference
train.py:108-123, SURVEY.md §2.3-2.4). Instead of per-process NCCL ranks and
explicit allreduce, we build a `jax.sharding.Mesh` over all local (or
distributed) devices with a 'data' axis, shard the batch dimension across it,
and keep parameters replicated. The train/eval steps are written as global
(single-program) functions; XLA's SPMD partitioner inserts the gradient
all-reduces and metric psums over ICI automatically — including cross-replica
BatchNorm statistics, since batch-dim reductions inside BN become collectives.

Multi-host: call `initialize_distributed()` (jax.distributed.initialize) once
per host before building the mesh; `jax.devices()` then spans the slice.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "initialize_distributed", "make_mesh", "data_sharding",
    "replicated_sharding", "shard_batch", "put_global_batch",
    "put_replicated_tree",
]


def initialize_distributed():
    """Multi-host rendezvous (the `init_process_group` analog,
    reference train.py:112-117). No-op when single-process."""
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
            "COORDINATOR_ADDRESS"):
        jax.distributed.initialize()


def make_mesh(devices=None, axis_name: str = "data",
              spatial: int = 1) -> Mesh:
    """Device mesh. spatial=1: 1-D data-parallel mesh (the default — the
    reference's only strategy, SURVEY.md §2.3). spatial>1: 2-D
    (data, space) mesh; batches are then sharded (batch, H) and XLA's SPMD
    partitioner inserts conv halo exchanges automatically — the spatial
    sharding extension for very large images (SURVEY.md §5)."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    if spatial > 1:
        assert devices.size % spatial == 0, (devices.size, spatial)
        return Mesh(devices.reshape(devices.size // spatial, spatial),
                    (axis_name, "space"))
    return Mesh(devices, (axis_name,))


def data_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Batch sharding: leading (batch) axis over 'data'; on a 2-D mesh the
    image H axis additionally shards over 'space'."""
    if "space" in mesh.axis_names:
        return NamedSharding(mesh, P(axis_name, "space"))
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays, axis_name: str = "data"):
    """Place host arrays onto the mesh with the batch axis sharded."""
    sh = data_sharding(mesh, axis_name)
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out[0] if len(out) == 1 else out


def _already_placed(a, sharding: NamedSharding) -> bool:
    cur = getattr(a, "sharding", None)
    if cur is None:
        return False
    try:
        return cur.is_equivalent_to(sharding, a.ndim)
    except Exception:
        return cur == sharding


def put_global_batch(sharding: NamedSharding, *arrays):
    """Assemble device arrays for the train/eval step from this process's
    LOCAL batch.

    Arrays that already carry `sharding` (the PostFetch sharded path —
    single-host placed or multi-host globally assembled BEFORE the augment
    program) pass through untouched: the multi-host batch path must never
    np.asarray a device-resident array, which would bounce every batch
    device->host->device after augmentation.

    Otherwise — single-process: a plain device_put onto `sharding`.
    Multi-host: each process's loader yields its rank shard of the data
    (DataLoader(rank, world_size) — the DistributedSampler contract,
    reference train.py:33-35), and the HOST shards combine into one global
    jax Array via jax.make_array_from_process_local_data, so the global
    batch is bs * process_count. device_put of a host-local array onto a
    mesh that spans non-addressable devices would fail — this is the
    supported path.
    """
    out = []
    for a in arrays:
        if _already_placed(a, sharding):
            out.append(a)
        elif jax.process_count() == 1:
            out.append(jax.device_put(a, sharding))
        else:
            out.append(
                jax.make_array_from_process_local_data(sharding,
                                                       np.asarray(a)))
    return out[0] if len(out) == 1 else tuple(out)


def put_replicated_tree(sharding: NamedSharding, tree):
    """Replicate a pytree (params/optimizer state) onto the mesh. Multi-host:
    every process holds an identical host copy (same PRNG init / checkpoint),
    and each contributes its addressable replicas."""
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)), tree)


def put_tree(shardings, tree):
    """Place a pytree with PER-LEAF shardings (the tensor-parallel state
    placement, parallel/tp.py). Multi-host assumption: every process holds
    the full host copy of each leaf and any non-replicated param axis
    ('model') is process-local (make_tp_mesh puts it innermost, and
    jax.devices() is process-major), so the local portion of every leaf is
    the full array."""
    if jax.process_count() == 1:
        return jax.device_put(tree, shardings)
    return jax.tree.map(
        lambda s, x: jax.make_array_from_process_local_data(
            s, np.asarray(x)), shardings, tree)
