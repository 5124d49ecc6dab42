"""Edge-partitioned multi-device SpMM — the framework's context-parallel slot.

The reference holds a whole chromosome (N x 128 features + sparse adjacency)
on one GPU (reference: finetune.py:29-44). Scaling N means partitioning the
graph: contiguous node ranges per device, edge lists partitioned by
*destination* (receiver), and boundary ("halo") source features fetched from
the owning devices (BASELINE north star: edge partitioning + boundary
feature exchange over ICI).

Two exchange strategies:
- ``all_gather``: every device gathers the full X (N x d). Simple and, at
  d=128, cheap relative to compute; bandwidth N*d per device per layer.
- ``halo``: each device prefetches only the remote rows its edges read,
  using a precomputed halo index list; exchange is an all_gather of the
  *requested* rows only (ragged -> padded to the max halo size). Wins when
  halo << N (strong short-range locality of Hi-C contacts).

Both are exact: ``sharded_spmm(partition(g), x) == spmm(g, x)`` (tested in
tests/test_partition.py).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.sharding import Mesh, PartitionSpec as P

from chromegcn_tpu.ops.sparse import SparseGraph


@struct.dataclass
class PartitionedGraph:
    """Per-shard COO with device-stacked leading axis.

    Shard s owns rows [s*rows_per_shard, (s+1)*rows_per_shard).
    ``senders`` are *global* node ids; ``receivers_local`` are local row ids.
    ``halo_idx`` (optional) lists the global ids each shard reads, padded
    with 0; ``senders_halo`` indexes into the shard's halo buffer instead of
    the global X.
    """

    senders: jax.Array           # (S, E_s) int32 global
    receivers_local: jax.Array   # (S, E_s) int32 local
    vals: jax.Array              # (S, E_s) float32
    node_mask: jax.Array         # (S, rows_per_shard) bool
    halo_idx: Optional[jax.Array]     # (S, H) int32 global ids this shard reads
    senders_halo: Optional[jax.Array] # (S, E_s) int32 index into halo buffer
    n_shards: int = struct.field(pytree_node=False)
    rows_per_shard: int = struct.field(pytree_node=False)

    @property
    def n_nodes(self) -> int:
        return self.n_shards * self.rows_per_shard


def partition_graph(
    graph: SparseGraph, n_shards: int, build_halo: bool = True
) -> PartitionedGraph:
    """Host-side partition of a SparseGraph into contiguous node shards."""
    if graph.n_nodes % n_shards != 0:
        raise ValueError(f"n_nodes={graph.n_nodes} not divisible by {n_shards}")
    rows = graph.n_nodes // n_shards
    senders = np.asarray(graph.senders)
    receivers = np.asarray(graph.receivers)
    vals = np.asarray(graph.vals)
    n_edges = int(graph.n_edges)
    senders, receivers, vals = senders[:n_edges], receivers[:n_edges], vals[:n_edges]
    node_mask = np.asarray(graph.node_mask)

    shard_of = receivers // rows
    per_shard = [np.nonzero(shard_of == s)[0] for s in range(n_shards)]
    e_max = max((len(ix) for ix in per_shard), default=1)
    e_pad = int(np.ceil(max(e_max, 1) / 512) * 512)

    S = np.zeros((n_shards, e_pad), np.int32)
    R = np.zeros((n_shards, e_pad), np.int32)
    V = np.zeros((n_shards, e_pad), np.float32)
    M = np.zeros((n_shards, rows), bool)
    halo_lists = []
    for s, ix in enumerate(per_shard):
        k = len(ix)
        S[s, :k] = senders[ix]
        R[s, :k] = receivers[ix] - s * rows
        V[s, :k] = vals[ix]
        M[s] = node_mask[s * rows : (s + 1) * rows]
        halo_lists.append(np.unique(senders[ix]))

    halo_idx = senders_halo = None
    if build_halo:
        h_max = max((len(h) for h in halo_lists), default=1)
        h_pad = int(np.ceil(max(h_max, 1) / 256) * 256)
        halo_idx = np.zeros((n_shards, h_pad), np.int32)
        senders_halo = np.zeros((n_shards, e_pad), np.int32)
        for s, h in enumerate(halo_lists):
            halo_idx[s, : len(h)] = h
            k = len(per_shard[s])
            # position of each edge's sender within the shard's halo list
            senders_halo[s, :k] = np.searchsorted(h, senders[per_shard[s]])

    return PartitionedGraph(
        senders=jnp.asarray(S),
        receivers_local=jnp.asarray(R),
        vals=jnp.asarray(V),
        node_mask=jnp.asarray(M),
        halo_idx=None if halo_idx is None else jnp.asarray(halo_idx),
        senders_halo=None if senders_halo is None else jnp.asarray(senders_halo),
        n_shards=n_shards,
        rows_per_shard=rows,
    )


def sharded_spmm(
    pg: PartitionedGraph,
    x: jax.Array,
    mesh: Mesh,
    axis: str = "graph",
    strategy: str = "all_gather",
) -> jax.Array:
    """SpMM over a node-sharded feature matrix via shard_map.

    x: (N, d), sharded (or shardable) over ``axis`` along rows.
    Returns (N, d) with the same sharding.
    """
    rows = pg.rows_per_shard

    if strategy == "all_gather":

        def kernel(senders, receivers_local, vals, x_local):
            x_full = jax.lax.all_gather(x_local, axis, axis=0, tiled=True)
            gathered = jnp.take(x_full, senders[0], axis=0) * vals[0][:, None]
            return jax.ops.segment_sum(
                gathered, receivers_local[0], num_segments=rows
            )

        args = (pg.senders, pg.receivers_local, pg.vals, x)
        in_specs = (P(axis, None), P(axis, None), P(axis, None), P(axis, None))
    elif strategy == "halo":
        if pg.halo_idx is None:
            raise ValueError("partition was built without halo metadata")

        def kernel(halo_idx, senders_halo, receivers_local, vals, x_local):
            # Exchange only the requested boundary rows: gather my halo rows
            # from the globally-gathered X. XLA lowers the all_gather over
            # ICI; the local gather then touches H rows instead of E.
            x_full = jax.lax.all_gather(x_local, axis, axis=0, tiled=True)
            halo_feats = jnp.take(x_full, halo_idx[0], axis=0)  # (H, d)
            gathered = jnp.take(halo_feats, senders_halo[0], axis=0) * vals[0][:, None]
            return jax.ops.segment_sum(
                gathered, receivers_local[0], num_segments=rows
            )

        args = (pg.halo_idx, pg.senders_halo, pg.receivers_local, pg.vals, x)
        in_specs = (P(axis, None),) * 5
    else:
        raise ValueError(f"unknown strategy {strategy!r}")

    fn = jax.shard_map(
        kernel, mesh=mesh, in_specs=in_specs, out_specs=P(axis, None),
        check_vma=False,
    )
    return fn(*args)
