"""Parallelism layer: mesh construction and data-parallel sharding helpers."""

from .mesh import (
    batch_sharding,
    data_parallel_mesh,
    maybe_shard_batch,
    replicate,
    replicated,
)

__all__ = [
    "data_parallel_mesh",
    "batch_sharding",
    "replicated",
    "replicate",
    "maybe_shard_batch",
]
