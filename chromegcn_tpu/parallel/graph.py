"""Edge-partitioned multi-device SpMM — the framework's context-parallel slot.

The reference holds a whole chromosome (N x 128 features + sparse adjacency)
on one GPU (reference: finetune.py:29-44). Scaling N means partitioning the
graph: contiguous node ranges per device, edge lists partitioned by
*destination* (receiver), and boundary ("halo") source features fetched from
the owning devices (BASELINE north star: edge partitioning + boundary
feature exchange over ICI).

Three exchange strategies:
- ``all_gather``: every device gathers the full X (N x d). Simple; traffic
  per device = N x d per layer.
- ``halo``: a true boundary exchange. At partition time each shard records
  exactly which remote rows its edges read, grouped by owning shard; at
  run time every owner gathers the rows each peer requested into a send
  buffer and a single ``all_to_all`` delivers them. Traffic per device =
  S x H_max x d where H_max is the (padded) largest per-owner request —
  for diagonal-dominant Hi-C graphs the halo is a thin boundary band, so
  H_max << N and the exchange rides ICI at a fraction of the all_gather
  cost.
- ``halo_bsr``: the same halo exchange feeding a per-shard *Pallas BSR*
  matmul (ops/spmm_pallas.py) instead of gather+segment-sum. At partition
  time each shard's edges are re-keyed into (local row, halo column)
  coordinates and converted to a rectangular block-sparse operator
  (rows_per_shard x S*H). This composes the measured-fast kernel with the
  exchange — every device computes at single-chip BSR speed (the plain
  gather/segment-sum shard compute is the measured 5-6x-slower path,
  DESIGN.md SS1/SS4).

All are exact: ``sharded_spmm(partition(g), x) == spmm(g, x)`` (tested in
tests/test_partition.py).
"""

from __future__ import annotations

from typing import Optional

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

    Halo metadata (present when built with build_halo=True):
      send_map:     (S, S, H) int32 — send_map[owner, dest] lists the
                    *local* row ids ``owner`` must ship to ``dest`` (padded
                    with 0; padding slots are ignored by construction
                    because no edge reads them).
      senders_halo: (S, E_s) int32 — per edge, the position of its sender
                    inside the shard's received halo buffer, which is laid
                    out as S owner-blocks of H rows each.
    """

    senders: jax.Array           # (S, E_s) int32 global
    receivers_local: jax.Array   # (S, E_s) int32 local
    vals: jax.Array              # (S, E_s) float32
    node_mask: jax.Array         # (S, rows_per_shard) bool
    send_map: Optional[jax.Array]     # (S, S, H) int32
    senders_halo: Optional[jax.Array] # (S, E_s) int32
    n_shards: int = struct.field(pytree_node=False)
    rows_per_shard: int = struct.field(pytree_node=False)
    halo_width: int = struct.field(pytree_node=False, default=0)

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
    # needed[s][o]: sorted unique global rows shard s reads from owner o
    needed = [[None] * n_shards for _ in range(n_shards)]
    for s, ix in enumerate(per_shard):
        k = len(ix)
        S[s, :k] = senders[ix]
        R[s, :k] = receivers[ix] - s * rows
        V[s, :k] = vals[ix]
        M[s] = node_mask[s * rows : (s + 1) * rows]
        uniq = np.unique(senders[ix])
        owner = uniq // rows
        for o in range(n_shards):
            needed[s][o] = uniq[owner == o]

    send_map = senders_halo = None
    h_pad = 0
    if build_halo:
        h_max = max(
            (len(needed[s][o]) for s in range(n_shards) for o in range(n_shards)),
            default=1,
        )
        h_pad = int(np.ceil(max(h_max, 1) / 128) * 128)
        send_map = np.zeros((n_shards, n_shards, h_pad), np.int32)
        senders_halo = np.zeros((n_shards, e_pad), np.int32)
        for s in range(n_shards):
            for o in range(n_shards):
                req = needed[s][o]
                # owner o ships these (local ids) to destination s
                send_map[o, s, : len(req)] = req - o * rows
            # halo buffer layout at shard s: owner-blocks of h_pad rows each;
            # edge sender g sits at o*h_pad + rank of g within needed[s][o]
            k = len(per_shard[s])
            es = senders[per_shard[s]]
            owner = es // rows
            pos = np.zeros(k, np.int64)
            for o in range(n_shards):
                sel = owner == o
                if sel.any():
                    pos[sel] = o * h_pad + np.searchsorted(needed[s][o], es[sel])
            senders_halo[s, :k] = pos

    return PartitionedGraph(
        senders=jnp.asarray(S),
        receivers_local=jnp.asarray(R),
        vals=jnp.asarray(V),
        node_mask=jnp.asarray(M),
        send_map=None if send_map is None else jnp.asarray(send_map),
        senders_halo=None if senders_halo is None else jnp.asarray(senders_halo),
        n_shards=n_shards,
        rows_per_shard=rows,
        halo_width=h_pad,
    )


def sharded_spmm(
    pg: PartitionedGraph,
    x: jax.Array,
    mesh: Mesh,
    axis: str = "graph",
    strategy: str = "halo",
) -> jax.Array:
    """SpMM over a node-sharded feature matrix via shard_map.

    x: (N, d), sharded (or shardable) over ``axis`` along rows.
    Returns (N, d) with the same sharding.
    """
    rows = pg.rows_per_shard
    n_shards = pg.n_shards

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
        if pg.send_map is None:
            raise ValueError("partition was built without halo metadata")

        def kernel(send_map, senders_halo, receivers_local, vals, x_local):
            # Gather the rows each peer requested from me: (S, H, d)
            send_buf = jnp.take(x_local, send_map[0], axis=0)
            # One all_to_all delivers every shard's requests: slice o of the
            # result is what owner o shipped to me == the rows I requested.
            recv = jax.lax.all_to_all(
                send_buf, axis, split_axis=0, concat_axis=0, tiled=False
            )
            halo = recv.reshape(-1, x_local.shape[-1])  # (S*H, d) owner-blocks
            gathered = jnp.take(halo, senders_halo[0], axis=0) * vals[0][:, None]
            return jax.ops.segment_sum(
                gathered, receivers_local[0], num_segments=rows
            )

        args = (pg.send_map, pg.senders_halo, pg.receivers_local, pg.vals, x)
        in_specs = (P(axis, None, None), P(axis, None), P(axis, None), P(axis, None), P(axis, None))
    else:
        raise ValueError(f"unknown strategy {strategy!r}")

    fn = jax.shard_map(
        kernel, mesh=mesh, in_specs=in_specs, out_specs=P(axis, None),
        check_vma=False,
    )
    return fn(*args)
