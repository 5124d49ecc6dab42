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
- ``halo_bsr``: the same halo exchange feeding per-shard *Pallas BSR*
  matmuls (ops/spmm_pallas.py) instead of gather+segment-sum, SPLIT into
  ``A_local @ x_local + A_halo @ halo``. The local matmul
  (rows_per_shard x rows_per_shard) has no data dependency on the
  all_to_all, so XLA's async collectives overlap the exchange with the
  bulk of the compute (diagonal-dominant Hi-C graphs put most edges in
  A_local); the halo matmul (rows_per_shard x S*H) consumes the received
  rows. This composes the measured-fast kernel with the exchange — every
  device computes at single-chip BSR speed (the plain gather/segment-sum
  shard compute is the measured 5-6x-slower path, DESIGN.md SS1/SS4) —
  and hides the halo latency whenever t(local matmul) >= t(exchange).

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
class ShardedBSRMats:
    """Stacked per-shard block arrays for one matmul direction (leading
    axis S). Tile/strip counts are padded to the max across shards so every
    device runs one identical kernel (pad blocks sit at (0,0) with zero
    values — exact no-ops under the kernel's `+=`; the per-shard ``live``
    counts let the kernel's pipeline elide their DMA entirely)."""

    tiles: jax.Array     # (S, nt, tile_r, tile_c)
    tile_rb: jax.Array   # (S, nt) int32
    tile_cb: jax.Array   # (S, nt) int32
    strips: jax.Array    # (S, ns, 8, tile_c)
    strip_rb: jax.Array  # (S, ns) int32
    strip_cb: jax.Array  # (S, ns) int32
    live: jax.Array      # (S, 2) int32 live (tile, strip) grid steps


@struct.dataclass
class ShardedBSR:
    """Device-stacked per-shard rectangular BSR operators, SPLIT into a
    local and a halo matmul so the exchange overlaps with compute.

    Shard s's SpMM is ``out = A_local @ x_local + A_halo @ halo`` where
    - ``fwd_local`` is (rows x rows): edges whose sender lives on this
      shard. This matmul has NO data dependency on the all_to_all, so
      XLA's async collectives run the exchange underneath it —
      compute/comm overlap for free from the dependency structure
      (SURVEY §7 "halo exchange overlap" hard part). On diagonal-dominant
      Hi-C graphs this is the bulk of the work, so the halo latency is
      fully hidden whenever t(local matmul) >= t(exchange).
    - ``fwd_halo`` is (rows x S*H): edges with remote senders, columns in
      halo-buffer coordinates (owner-blocks of H rows from the
      all_to_all).
    ``bwd_*`` are the per-shard transposes consumed by the SpMM custom
    VJP: d(x_local) = A_local^T g (plus the scattered d(send_buf)), and
    d(halo) = A_halo^T g flows back through the all_to_all to the owners.
    """

    fwd_local: ShardedBSRMats  # rows x rows
    fwd_halo: ShardedBSRMats   # rows x (S*H)
    bwd_local: ShardedBSRMats  # rows x rows (transpose of fwd_local)
    bwd_halo: ShardedBSRMats   # (S*H) x rows (transpose of fwd_halo)
    tile_r: int = struct.field(pytree_node=False)
    tile_c: int = struct.field(pytree_node=False)
    n_rows: int = struct.field(pytree_node=False)    # rows_per_shard
    halo_cols: int = struct.field(pytree_node=False)  # S * halo_width


@struct.dataclass
class PartitionedGraph:
    """Per-shard COO with device-stacked leading axis.

    Shard s owns rows [s*rows_per_shard, (s+1)*rows_per_shard).
    ``senders`` are *global* node ids; ``receivers_local`` are local row ids.

    Halo metadata (present when built with build_halo=True):
      send_map:     (S, S, H) int32 — send_map[owner, dest] lists the
                    *local* row ids ``owner`` must ship to ``dest`` (padded
                    with 0; padding slots are ignored by construction
                    because no edge reads them). The self row
                    send_map[o, o] is all-zero: local senders never ride
                    the exchange — Hi-C graphs are diagonal-dominant, so a
                    shard's own rows dominate its reads, and routing them
                    through the all_to_all would inflate H (a global max)
                    to ~rows_per_shard, making "halo" cost what all_gather
                    costs. Excluding them leaves H the true boundary band.
      senders_halo: (S, E_s) int32 — per edge, the position of its sender
                    inside the shard's concatenated read buffer
                    [x_local (rows) ; halo (S owner-blocks of H rows)]:
                    local senders index [0, rows), remote senders index
                    rows + owner*H + rank.
      bsr:          optional ShardedBSR (attach_shard_bsr) — per-shard
                    block-sparse forms in buffer coordinates, so the halo
                    exchange feeds the Pallas kernel instead of
                    gather+segment-sum.
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
    bsr: Optional[ShardedBSR] = None

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
        # H is sized by REMOTE requests only: local senders read x_local
        # directly (see class docstring — including them makes halo cost
        # what all_gather costs on diagonal-dominant graphs)
        h_max = max(
            (
                len(needed[s][o])
                for s in range(n_shards)
                for o in range(n_shards)
                if o != s
            ),
            default=1,
        )
        h_pad = int(np.ceil(max(h_max, 1) / 128) * 128)
        send_map = np.zeros((n_shards, n_shards, h_pad), np.int32)
        senders_halo = np.zeros((n_shards, e_pad), np.int32)
        for s in range(n_shards):
            for o in range(n_shards):
                if o == s:
                    continue  # self block stays a dummy (no ICI traffic)
                req = needed[s][o]
                # owner o ships these (local ids) to destination s
                send_map[o, s, : len(req)] = req - o * rows
            # read-buffer layout at shard s: [x_local (rows) ; halo
            # owner-blocks of h_pad rows each]; a local sender g sits at
            # g - s*rows, a remote one at rows + o*h_pad + rank of g
            # within needed[s][o]
            k = len(per_shard[s])
            es = senders[per_shard[s]]
            owner = es // rows
            pos = np.zeros(k, np.int64)
            local = owner == s
            pos[local] = es[local] - s * rows
            for o in range(n_shards):
                if o == s:
                    continue
                sel = owner == o
                if sel.any():
                    pos[sel] = (
                        rows + o * h_pad + np.searchsorted(needed[s][o], es[sel])
                    )
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


def attach_shard_bsr(
    pg: PartitionedGraph,
    tile: Optional[int] = None,
    tile_c: Optional[int] = None,
    min_edges_per_tile: "int | str" = "auto",
    dtype: str = "float32",
) -> PartitionedGraph:
    """Build per-shard rectangular BSR operators, split local/halo.

    Each shard's edge set, already re-keyed to (local row, buffer column) by
    ``partition_graph``, is split on sender locality — local senders
    (column < rows) form the (rows x rows) local operator, remote senders
    the (rows x S*H) halo operator in halo-buffer coordinates — and each
    half is converted with the same host-side tiling the single-device
    kernel uses (ops/spmm_pallas._build_one_direction), then stacked along
    a leading shard axis with tile/strip counts padded to the max across
    shards (one compiled kernel for all devices). The split is what lets
    the all_to_all overlap the local matmul (see ShardedBSR docstring).
    """
    from chromegcn_tpu.ops.spmm_pallas import (
        TILE,
        TILE_C,
        _build_one_direction,
    )

    if pg.send_map is None:
        raise ValueError("partition was built without halo metadata")
    tile = TILE if tile is None else tile
    tile_c = TILE_C if tile_c is None else tile_c
    rows = pg.rows_per_shard
    halo_cols = pg.n_shards * pg.halo_width
    if rows % tile or rows % tile_c or halo_cols % tile_c or halo_cols % tile:
        raise ValueError(
            f"rows_per_shard={rows} and halo block={halo_cols} must be "
            f"multiples of tile={tile} and tile_c={tile_c}"
        )
    np_dtype = {"float32": np.float32, "bfloat16": jnp.bfloat16}[dtype]

    cols_h = np.asarray(pg.senders_halo)
    rows_l = np.asarray(pg.receivers_local)
    vals = np.asarray(pg.vals)
    fwd_l, fwd_h, bwd_l, bwd_h = [], [], [], []
    for s in range(pg.n_shards):
        live = vals[s] != 0.0  # padding edges carry val 0 (exact no-ops)
        c, r, v = cols_h[s][live], rows_l[s][live], vals[s][live]
        loc = c < rows
        cl, rl, vl = c[loc], r[loc], v[loc]
        ch, rh, vh = c[~loc] - rows, r[~loc], v[~loc]

        def build(src, dst, val, n_rows, n_cols):
            return _build_one_direction(
                src, dst, val, n_rows=n_rows, tile_r=tile, tile_c=tile_c,
                min_edges_per_tile=min_edges_per_tile, dtype=np_dtype,
                n_cols=n_cols,
            )

        fwd_l.append(build(cl, rl, vl, rows, rows))
        fwd_h.append(build(ch, rh, vh, rows, halo_cols))
        bwd_l.append(build(rl, cl, vl, rows, rows))
        bwd_h.append(build(rh, ch, vh, halo_cols, rows))

    def stack_mats(mats) -> ShardedBSRMats:
        def stack(field):
            arrs = [np.asarray(getattr(m, field)) for m in mats]
            n_max = max(a.shape[0] for a in arrs)
            out = np.zeros((len(arrs), n_max) + arrs[0].shape[1:], arrs[0].dtype)
            for i, a in enumerate(arrs):
                out[i, : a.shape[0]] = a
            return jnp.asarray(out)

        return ShardedBSRMats(
            tiles=stack("tiles"),
            tile_rb=stack("tile_rb"),
            tile_cb=stack("tile_cb"),
            strips=stack("strips"),
            strip_rb=stack("strip_rb"),
            strip_cb=stack("strip_cb"),
            live=stack("live"),
        )

    return pg.replace(
        bsr=ShardedBSR(
            fwd_local=stack_mats(fwd_l),
            fwd_halo=stack_mats(fwd_h),
            bwd_local=stack_mats(bwd_l),
            bwd_halo=stack_mats(bwd_h),
            tile_r=tile,
            tile_c=tile_c,
            n_rows=rows,
            halo_cols=halo_cols,
        )
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
            # read buffer = [local rows ; halo]: local senders skip the
            # exchange entirely (see PartitionedGraph docstring)
            buffer = jnp.concatenate([x_local, halo], axis=0)
            gathered = jnp.take(buffer, senders_halo[0], axis=0) * vals[0][:, None]
            return jax.ops.segment_sum(
                gathered, receivers_local[0], num_segments=rows
            )

        args = (pg.send_map, pg.senders_halo, pg.receivers_local, pg.vals, x)
        in_specs = (P(axis, None, None), P(axis, None), P(axis, None), P(axis, None), P(axis, None))
    elif strategy == "halo_bsr":
        if pg.bsr is None:
            raise ValueError(
                "strategy='halo_bsr' needs per-shard block-sparse forms; "
                "attach them with parallel.graph.attach_shard_bsr(pg)"
            )
        from chromegcn_tpu.ops.spmm_pallas import BSRMatrix, BSROperator, _spmm_bsr

        sb = pg.bsr

        def shard_mat(mats: ShardedBSRMats, n_rows: int, n_cols: int) -> BSRMatrix:
            return BSRMatrix(
                tiles=mats.tiles[0], tile_rb=mats.tile_rb[0],
                tile_cb=mats.tile_cb[0], strips=mats.strips[0],
                strip_rb=mats.strip_rb[0], strip_cb=mats.strip_cb[0],
                live=mats.live[0],
                n_rows=n_rows, n_cols=n_cols,
                tile_r=sb.tile_r, tile_c=sb.tile_c,
            )

        def kernel(send_map, fl, fh, bl, bh, x_local):
            # identical halo exchange to 'halo' ...
            send_buf = jnp.take(x_local, send_map[0], axis=0)
            recv = jax.lax.all_to_all(
                send_buf, axis, split_axis=0, concat_axis=0, tiled=False
            )
            halo = recv.reshape(-1, x_local.shape[-1])  # (S*H, d) owner-blocks
            # ... feeding TWO Pallas block-sparse matmuls: the local one
            # (rows x rows over x_local) has no dependency on the
            # all_to_all, so XLA's async collectives overlap the exchange
            # with the bulk of the compute; the halo one (rows x S*H)
            # consumes the received rows. The custom VJPs route
            # d(x_local) = A_local^T g and d(halo) = A_halo^T g, the
            # latter back through the all_to_all transpose automatically.
            out_local = _spmm_bsr(
                BSROperator(
                    fwd=shard_mat(fl, rows, rows),
                    bwd=shard_mat(bl, rows, rows),
                ),
                x_local,
            )
            out_halo = _spmm_bsr(
                BSROperator(
                    fwd=shard_mat(fh, rows, sb.halo_cols),
                    bwd=shard_mat(bh, sb.halo_cols, rows),
                ),
                halo,
            )
            return out_local + out_halo

        def mats_specs(mats: ShardedBSRMats):
            return jax.tree_util.tree_map(
                lambda a: P(axis, *([None] * (a.ndim - 1))), mats
            )

        args = (
            pg.send_map, sb.fwd_local, sb.fwd_halo, sb.bwd_local,
            sb.bwd_halo, x,
        )
        in_specs = (
            P(axis, None, None),
            mats_specs(sb.fwd_local), mats_specs(sb.fwd_halo),
            mats_specs(sb.bwd_local), mats_specs(sb.bwd_halo),
            P(axis, None),
        )
    else:
        raise ValueError(f"unknown strategy {strategy!r}")

    fn = jax.shard_map(
        kernel, mesh=mesh, in_specs=in_specs, out_specs=P(axis, None),
        check_vma=False,
    )
    return fn(*args)


@struct.dataclass
class ShardedGraph:
    """Node-sharded drop-in for SparseGraph in the chrome model.

    Carries the partitioned operator plus the mesh/strategy statics, so the
    unchanged ChromeGCN forward (models/chrome.py) runs multi-device: the
    ops.spmm dispatch routes to ``sharded_spmm`` (shard_map halo exchange
    + per-shard compute), while the pointwise model math and MaskedBatchNorm
    stay ordinary jit code that GSPMD shards over the same mesh. This is the
    trainer-integrated form the reference's nn.DataParallel wiring
    corresponds to (reference: main.py:92-94 — its one parallelism is wired
    into the real training path; ours is the GCN-stage node partition).

    ``node_mask`` is the full (N,) mask (loss + BatchNorm statistics);
    ``mesh``/``axis``/``strategy`` are pytree-static (Mesh is hashable).
    """

    pg: PartitionedGraph
    node_mask: jax.Array  # (N,) bool
    mesh: Mesh = struct.field(pytree_node=False)
    axis: str = struct.field(pytree_node=False, default="graph")
    strategy: str = struct.field(pytree_node=False, default="halo")
    n_nodes: int = struct.field(pytree_node=False, default=0)


def shard_graph(
    graph: SparseGraph,
    mesh: Mesh,
    axis: str = "graph",
    strategy: str = "auto",
    spmm_dtype: str = "float32",
) -> ShardedGraph:
    """Partition a chromosome graph for multi-device training.

    strategy: 'auto' picks 'halo_bsr' (halo exchange feeding the per-shard
    Pallas BSR kernel) when the single-device graph carries a BSR form (the
    trainer attaches one on TPU), else 'halo'; or pass
    'halo' | 'halo_bsr' | 'all_gather' explicitly.
    """
    n_shards = mesh.shape[axis]
    if strategy == "auto":
        strategy = "halo_bsr" if getattr(graph, "bsr", None) is not None else "halo"
    pg = partition_graph(graph, n_shards, build_halo=True)
    if strategy == "halo_bsr":
        pg = attach_shard_bsr(pg, dtype=spmm_dtype)
    return ShardedGraph(
        pg=pg,
        node_mask=graph.node_mask,
        mesh=mesh,
        axis=axis,
        strategy=strategy,
        n_nodes=graph.n_nodes,
    )


def sharded_graph_spmm(graph: ShardedGraph, x: jax.Array) -> jax.Array:
    """SpMM entry used by the ops.spmm dispatch for ShardedGraph."""
    return sharded_spmm(
        graph.pg, x, graph.mesh, axis=graph.axis, strategy=graph.strategy
    )
