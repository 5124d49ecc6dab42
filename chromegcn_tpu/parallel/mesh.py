"""Device-mesh helpers: DP for the CNN stage, node-sharding for the GCN stage.

The reference's only parallelism is single-process ``nn.DataParallel``
scatter/gather over <=4 GPUs (reference: main.py:92-94). The TPU-native
equivalent is SPMD over a named mesh: batch-axis sharding for pretraining
(gradient psum compiled by XLA over ICI) and contiguous node-sharding of
chromosome graphs for the GCN stage (XLA inserts the boundary-feature
collectives; an explicit shard_map halo-exchange path lives in
``parallel.graph``).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim; replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, axis: str = "data"):
    """Return a placement function for host batches: pads are already static
    so only device placement is needed."""
    sharding = batch_sharding(mesh, axis)

    def place(x):
        return jax.device_put(x, sharding)

    return place


def node_sharding(mesh: Mesh, axis: str = "graph") -> NamedSharding:
    """Contiguous node-dimension sharding for (N, d) chromosome features."""
    return NamedSharding(mesh, P(axis))
