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


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the multi-host JAX runtime (SURVEY §2.6: the reference has
    no distributed backend at all — nn.DataParallel is single-process; here
    collectives ride ICI within a slice and DCN across slices, compiled by
    XLA once the distributed runtime is up).

    No-op on a single host or when already initialized. On TPU pods the
    arguments are auto-detected from the environment; pass them explicitly
    for CPU/GPU multi-process runs.
    """
    if jax.process_count() > 1:
        return  # already initialized
    try:
        if coordinator_address is None and num_processes is None:
            import os

            if not (
                os.environ.get("COORDINATOR_ADDRESS")
                or os.environ.get("TPU_WORKER_HOSTNAMES")
                or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
            ):
                return  # single host; nothing to do
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError:
        pass  # already initialized by the launcher


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"mesh axis {axis!r} needs {n_devices} devices, have "
                f"{len(devices)} (on this backend set "
                f"XLA_FLAGS=--xla_force_host_platform_device_count=N and "
                f"force CPU via jax.config.update('jax_platforms','cpu'))"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def make_mesh_2d(
    dp: int, graph: int, axes: Sequence[str] = ("data", "graph")
) -> Mesh:
    """dp x graph 2D mesh: batch-axis DP for the CNN stage on one axis,
    node-sharding for the GCN stage on the other. Lay the graph axis on
    the mesh minor dimension so halo all-to-alls ride ICI neighbors."""
    devices = jax.devices()
    if dp * graph > len(devices):
        raise ValueError(
            f"mesh {dp}x{graph} needs {dp * graph} devices, have {len(devices)}"
        )
    arr = np.asarray(devices[: dp * graph]).reshape(dp, graph)
    return Mesh(arr, tuple(axes))


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
