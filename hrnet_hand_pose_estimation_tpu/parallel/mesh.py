"""Device mesh construction and sharding helpers.

TPU-native replacement for the reference's entire distribution stack
(DataParallel tools/train.py:254, DDP+NCCL :221-249, DistributedSampler
dataset/build.py:79, SyncBatchNorm :227-228): one SPMD program over a
``jax.sharding.Mesh``.  Batches shard along the ``data`` axis; parameters
are replicated except for wide head kernels which can shard along an
optional ``model`` axis (tensor parallelism for the 480-channel head).
Gradient/BN-stat cross-replica reductions are inserted by XLA from the
sharding annotations — no hand-written collectives, they ride ICI.

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh`` and
the same code spans slices (DCN) unchanged.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axes: Sequence[str] = ("data",), shape: Sequence[int] = ()) -> Mesh:
    """Build a mesh over all available devices.

    ``shape`` pins per-axis sizes; an empty/partial shape fills the leading
    axis with the remaining devices.  E.g. axes=('data','model'), shape=(4,2).
    """
    devices = jax.devices()
    n = len(devices)
    axes = tuple(axes)
    if not shape:
        shape = (n,) + (1,) * (len(axes) - 1)
    shape = tuple(int(s) for s in shape)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} does not cover {n} devices")
    return Mesh(np.asarray(devices).reshape(shape), axes)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch) over the 'data' mesh axis, replicate the rest."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_shardings(mesh: Mesh, params, min_shard_dim: int = 256):
    """Per-parameter shardings: replicate everything except large kernels
    whose output-channel dim divides the 'model' axis — those shard channel-
    wise (tensor parallelism).  With a 1-sized (or absent) 'model' axis this
    degenerates to full replication.
    """
    model_size = mesh.shape.get("model", 1)

    def spec(path, leaf):
        if (
            model_size > 1
            and leaf.ndim >= 2
            and leaf.shape[-1] >= min_shard_dim
            and leaf.shape[-1] % model_size == 0
        ):
            return NamedSharding(mesh, P(*([None] * (leaf.ndim - 1) + ["model"])))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_batch(mesh: Mesh, batch):
    """Place a host batch with batch-axis sharding over the mesh.

    Single-process: a plain device_put of the global batch.  Multi-host
    (``jax.process_count() > 1``): ``batch`` is this host's LOCAL slice
    (what ``data.pipeline.DataLoader`` yields under ``host_local_slice``)
    and the global array is assembled from the per-process shards —
    host_local_slice's contiguous per-process chunks line up with the
    mesh's process-major device order.
    """
    multi = jax.process_count() > 1

    def put(x):
        sh = NamedSharding(mesh, P(*(["data"] + [None] * (x.ndim - 1))))
        if multi:
            import numpy as np

            return jax.make_array_from_process_local_data(sh, np.asarray(x))
        return jax.device_put(x, sh)

    return jax.tree.map(put, batch)
