"""Device mesh + sharding helpers: batch-dimension data parallelism over ICI.

The reference is single-device (SURVEY.md §2.7); the TPU-native equivalent shards the batch
axis of every array across a 1-D ``dp`` mesh and replicates parameters — XLA then inserts the
gradient ``psum`` over ICI automatically inside the jitted train step. No TP/PP/SP is built:
wav2vec2-base (~95 M params) and both vocoders fit comfortably per chip and sequences are
≤ ~200 tokens, so data parallelism is the whole story at this workload's scale.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_parallel_mesh(num_devices: int | None = None, devices=None) -> Mesh:
    """A 1-D ``dp`` mesh over the available (or given) devices."""
    if devices is None:
        devices = jax.devices()
        if num_devices is not None:
            devices = devices[:num_devices]
    return Mesh(np.asarray(devices), axis_names=("dp",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def replicate(tree, mesh: Mesh | None):
    """Place every leaf fully replicated on the mesh (no-op without a mesh)."""
    if mesh is None or len(tree) == 0:
        return tree
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def maybe_shard_batch(array, mesh: Mesh | None):
    """Shard the leading (batch) axis across ``dp``; plain device_put without a mesh."""
    if mesh is None:
        return jax.device_put(array)
    n = mesh.devices.size
    if array.shape[0] % n:
        raise ValueError(
            f"batch size {array.shape[0]} is not divisible by the {n}-device dp mesh; "
            f"pick a batch size that is a multiple of {n} (the Batcher pads partial "
            "batches, so any multiple works)")
    return jax.device_put(array, batch_sharding(mesh))
