"""Device mesh + sharding for batch-parallel serving.

The model is ~200M params: every chip holds the full weights, and scaling is
pure data parallelism over independent streams (SURVEY.md §2 "Parallelism &
communication inventory"). The mesh is 1-D over the batch axis; there are NO
collectives in the hot path -- XLA only inserts an initial broadcast of the
replicated weights. Multi-host slices extend the same mesh over DCN.

Usage:
    mesh = make_mesh()                        # all local devices
    sw = shard_weights(mesh, weights)          # replicate weights
    cache = shard_batch(mesh, cache)           # shard KV cache on B
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXIS = "batch"


def make_mesh(devices: Optional[Sequence] = None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (BATCH_AXIS,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, batch_dim: int = 0) -> NamedSharding:
    spec = [None] * batch_dim + [BATCH_AXIS]
    return NamedSharding(mesh, P(*spec))


def shard_weights(mesh: Mesh, weights: Any) -> Any:
    """Replicate the weight pytree across the mesh."""
    sharding = replicated(mesh)

    def place(x):
        if x is None or isinstance(x, int):
            return x
        return jax.device_put(x, sharding)

    return jax.tree.map(place, weights, is_leaf=lambda x: x is None)


def shard_batch_array(mesh: Mesh, x, batch_dim: int = 0):
    """Place an array with its ``batch_dim`` sharded over the mesh."""
    return jax.device_put(x, batch_sharding(mesh, batch_dim))


def shard_cache(mesh: Mesh, cache):
    """Shard a flowlm.KVCache: k/v are [L, B, T, H, D] (B at dim 1);
    per-stream scalars are [B]; the cursor is replicated."""
    from ..models.flowlm import KVCache

    return KVCache(
        k=shard_batch_array(mesh, cache.k, batch_dim=1),
        v=shard_batch_array(mesh, cache.v, batch_dim=1),
        prefix_len=shard_batch_array(mesh, cache.prefix_len, batch_dim=0),
        start=shard_batch_array(mesh, cache.start, batch_dim=0),
        cursor=jax.device_put(cache.cursor, replicated(mesh)),
    )


def pad_batch_to_mesh(batch: int, mesh: Mesh) -> int:
    """Round a batch size up to a multiple of the mesh size."""
    n = mesh.size
    return ((batch + n - 1) // n) * n
