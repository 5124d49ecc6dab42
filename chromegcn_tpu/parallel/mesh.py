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

    Ordering contract: ``jax.distributed.initialize`` MUST run before any
    backend-initializing jax call (``jax.devices``, ``jax.process_count``,
    any computation) — querying the backend first silently initializes the
    *local* runtime and turns the distributed init into a failure on a real
    pod. So this function decides purely from its arguments and environment
    variables, and only then touches jax (tests/test_aux.py asserts the
    call order).
    """
    import os
    import warnings

    explicit = any(
        a is not None for a in (coordinator_address, num_processes, process_id)
    )
    # TPU_WORKER_HOSTNAMES with a single entry means a single-host slice
    # (this image sets it to "localhost"), not a pod
    workers = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    multi_host = len([w for w in workers.split(",") if w.strip()]) > 1
    if not explicit and not (
        os.environ.get("COORDINATOR_ADDRESS")
        or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
        or multi_host
    ):
        return  # single host; never touch the backend
    if jax.distributed.is_initialized():
        return  # launcher already brought the runtime up
    from jax._src import xla_bridge

    if xla_bridge.backends_are_initialized():
        # a backend query slipped in before us — initialize would raise.
        # Explicit request: surface it loudly; auto-detection: warn (the
        # env hint may be stale, as with single-host TPU_WORKER_HOSTNAMES).
        msg = (
            "init_distributed called after the XLA backend was initialized; "
            "call it before any jax.devices()/computation"
        )
        if explicit:
            raise RuntimeError(msg)
        warnings.warn(msg + " — continuing single-process", RuntimeWarning)
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


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
    so only device placement is needed. Multi-process aware: on a pod each
    host contributes only its own batch rows (parallel.multihost)."""
    from chromegcn_tpu.parallel.multihost import put_global

    sharding = batch_sharding(mesh, axis)

    def place(x):
        return put_global(x, sharding)

    return place


def node_sharding(mesh: Mesh, axis: str = "graph") -> NamedSharding:
    """Contiguous node-dimension sharding for (N, d) chromosome features."""
    return NamedSharding(mesh, P(axis))
