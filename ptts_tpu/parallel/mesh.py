"""Device mesh + sharding for batch-parallel serving.

The model is ~200M params: every chip holds the full weights, and scaling is
pure data parallelism over independent streams (SURVEY.md §2 "Parallelism &
communication inventory"). There are NO collectives in the hot path -- XLA
only inserts an initial broadcast of the replicated weights.

Single-host: a 1-D mesh over the batch axis. Multi-host: a HYBRID 2-D mesh
(``dcn`` x ``batch``) built so that mesh neighbors along the fast axis are
ICI neighbors and only the slow ``dcn`` axis crosses hosts
(jax.experimental.mesh_utils.create_hybrid_device_mesh); the batch shards
over BOTH axes (PartitionSpec(("dcn", "batch"))), weights replicate, and
because serving is embarrassingly data-parallel the once-per-load weight
broadcast is the only DCN traffic -- streams never communicate. The same
jitted step runs unchanged under either mesh.

Usage:
    mesh = make_mesh()                         # 1-D, all local devices
    mesh = make_multihost_mesh()               # 2-D (dcn, batch), all hosts
    sw = shard_weights(mesh, weights)          # replicate weights
    cache = shard_cache(mesh, cache)           # shard KV cache on B
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXIS = "batch"
DCN_AXIS = "dcn"


def make_mesh(devices: Optional[Sequence] = None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (BATCH_AXIS,))


def make_multihost_mesh(num_hosts: Optional[int] = None,
                        devices: Optional[Sequence] = None) -> Mesh:
    """2-D (dcn, batch) mesh over all hosts' devices.

    ``num_hosts`` defaults to jax.process_count(); pass it explicitly to
    simulate a multi-host topology on a flat device list (the CPU-mesh
    dryrun). Axis 0 ("dcn") spans hosts, axis 1 ("batch") spans the ICI
    slice within a host.
    """
    if devices is None:
        devices = jax.devices()
    if num_hosts is None:
        num_hosts = jax.process_count()
    n = len(devices)
    assert n % num_hosts == 0, (n, num_hosts)
    per_host = n // num_hosts
    if jax.process_count() == num_hosts and num_hosts > 1:
        from jax.experimental import mesh_utils

        # per-axis products of (ici, dcn) shapes -> [num_hosts, per_host],
        # hosts varying along axis 0 only
        arr = mesh_utils.create_hybrid_device_mesh(
            (1, per_host), (num_hosts, 1), devices=devices
        )
    else:
        arr = np.asarray(devices).reshape(num_hosts, per_host)
    return Mesh(arr, (DCN_AXIS, BATCH_AXIS))


def _batch_axes(mesh: Mesh):
    """The mesh axis (or axis tuple) the batch dimension shards over."""
    if DCN_AXIS in mesh.axis_names:
        return (DCN_AXIS, BATCH_AXIS)
    return BATCH_AXIS


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, batch_dim: int = 0) -> NamedSharding:
    spec = [None] * batch_dim + [_batch_axes(mesh)]
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
        t0=jax.device_put(cache.t0, replicated(mesh)),
    )


def pad_batch_to_mesh(batch: int, mesh: Mesh) -> int:
    """Round a batch size up to a multiple of the mesh size."""
    n = mesh.size
    return ((batch + n - 1) // n) * n


def num_host_groups(mesh: Mesh) -> int:
    """Host groups along the slow (DCN) axis; 1 for single-host meshes."""
    if DCN_AXIS in mesh.axis_names:
        return mesh.shape[DCN_AXIS]
    return 1


def shard_mimi_stream_state(mesh: Mesh, state):
    """Shard a mimi_stream state pytree on its batch dims.

    Layout (mimi_stream.init_state): every leaf is [B, ...] except the
    transformer ring K/V, which are [L, B, RING, H, D] (batch at dim 1)."""

    def put(x, batch_dim=0):
        return shard_batch_array(mesh, x, batch_dim)

    return {
        "up": put(state["up"]),
        "ring": {
            "k": put(state["ring"]["k"], 1),
            "v": put(state["ring"]["v"], 1),
            "pos": put(state["ring"]["pos"]),
            "kpos": put(state["ring"]["kpos"]),
            "wc": jax.device_put(state["ring"]["wc"], replicated(mesh)),
        },
        "dec_in": put(state["dec_in"]),
        "stages": [{k: put(v) for k, v in st.items()} for st in state["stages"]],
        "dec_out": put(state["dec_out"]),
    }
