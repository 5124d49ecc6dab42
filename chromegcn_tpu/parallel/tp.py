"""Tensor parallelism for the window-model stage.

The reference has no TP at all (SURVEY §2.6); the only weight worth
sharding is the CNN's flatten->feature Dense kernel (101,760 x d_model for
Expecto at seq 2000 — reference: models/WindowModels.py:54-61), which
dominates the parameter count. TP here is a pure *placement policy*: large
kernels are sharded over a named ``model`` mesh axis and XLA's GSPMD
partitioner propagates the sharding through the jitted train step,
inserting the contraction psum over ICI. No step code changes.

Because optimizer moments mirror parameter shapes, the same shape-based
rule shards them identically — so the whole TrainState is placed with one
tree_map.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# kernels at or above this element count get sharded; everything smaller is
# replicated (the conv kernels and biases are tiny — sharding them would
# cost more in collective latency than it saves)
MIN_SHARD_ELEMENTS = 1 << 20


def shard_large_arrays(
    tree,
    mesh: Mesh,
    axis: str = "model",
    min_elements: int = MIN_SHARD_ELEMENTS,
):
    """Place every array in the pytree: big >=2D arrays sharded over their
    largest divisible dimension on ``axis``, everything else replicated."""
    n_shards = mesh.shape[axis]

    def place(x):
        if not hasattr(x, "shape") or not hasattr(x, "dtype"):
            return x
        if x.ndim >= 2 and x.size >= min_elements:
            # shard the largest dimension that divides evenly
            for dim in np.argsort(x.shape)[::-1]:
                if x.shape[dim] % n_shards == 0:
                    spec = [None] * x.ndim
                    spec[int(dim)] = axis
                    return jax.device_put(x, NamedSharding(mesh, P(*spec)))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(place, tree)


def place_window_state(
    state,
    mesh: Mesh,
    axis: str = "model",
    min_elements: int = MIN_SHARD_ELEMENTS,
):
    """Shard a WindowTrainState for TP: params, optimizer moments, and batch
    stats placed by the shape rule (moments share param shapes, so they get
    the identical layout)."""
    return shard_large_arrays(state, mesh, axis, min_elements)


def tp_batch_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    """Batches shard over the data axis only; activations stay replicated
    over the model axis until they meet a sharded kernel."""
    return NamedSharding(mesh, P(data_axis))
