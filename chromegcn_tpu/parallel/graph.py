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
  run time the exchange runs as S-1 ``ppermute`` ring rounds, one per
  shard offset k, each shipping a buffer of H_k rows (the LARGEST request
  at that offset, padded to 128). Per-offset widths matter: Hi-C contact
  probability decays with genomic distance, so for contiguous node
  shards H_k collapses with k — a single global-max width (the round-2
  design, one all_to_all of (S, H_max)) let one dense boundary pair
  inflate every shard's buffer, the wrong shape for pods. Traffic per
  device = sum_k H_k x d per layer; zero-width offsets skip their round
  entirely.
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

from typing import Optional, Tuple

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
    local and a halo matmul so the exchange can overlap with compute.

    Shard s's SpMM is ``out = A_local @ x_local + A_halo @ halo`` where
    - ``fwd_local`` is (rows x rows): edges whose sender lives on this
      shard. This matmul has NO data dependency on the exchange, which
      permits XLA's async collectives to run the ppermute rounds
      underneath it (SURVEY §7 "halo exchange overlap" hard part; needs a
      multi-chip profile to confirm — DESIGN.md §4). On diagonal-dominant
      Hi-C graphs this is the bulk of the work.
    - ``fwd_halo`` is (rows x halo_cols): edges with remote senders,
      columns in halo-buffer coordinates (per-offset blocks of H_k rows
      from the ring exchange). None when the partition has no remote
      edges (e.g. n_shards == 1).
    ``bwd_*`` are the per-shard transposes consumed by the SpMM custom
    VJP: d(x_local) = A_local^T g (plus the scattered d(send_buf)), and
    d(halo) = A_halo^T g flows back through the ppermute transposes to
    the owners.
    """

    fwd_local: ShardedBSRMats  # rows x rows
    fwd_halo: Optional[ShardedBSRMats]   # rows x halo_cols
    bwd_local: ShardedBSRMats  # rows x rows (transpose of fwd_local)
    bwd_halo: Optional[ShardedBSRMats]   # halo_cols x rows (transpose of fwd_halo)
    tile_r: int = struct.field(pytree_node=False)
    tile_c: int = struct.field(pytree_node=False)
    n_rows: int = struct.field(pytree_node=False)    # rows_per_shard
    halo_cols: int = struct.field(pytree_node=False)  # sum of padded H_k


@struct.dataclass
class PartitionedGraph:
    """Per-shard COO with device-stacked leading axis.

    Shard s owns rows [s*rows_per_shard, (s+1)*rows_per_shard).
    ``senders`` are *global* node ids; ``receivers_local`` are local row ids.

    Halo metadata (present when built with build_halo=True):
      send_maps:    tuple of S-1 arrays, one per ring offset k=1..S-1,
                    each (S, H_k) int32 — send_maps[k-1][o] lists the
                    *local* row ids ``owner o`` must ship to dest
                    (o+k) %% S (padded with 0; padding slots are ignored
                    by construction because no edge reads them). H_k is
                    the largest request AT THAT OFFSET (padded to 128),
                    not a global max — Hi-C contact probability decays
                    with genomic distance, so H_k collapses with k and a
                    global max would let one dense boundary pair inflate
                    every buffer. Local senders never ride the exchange:
                    a shard's own rows dominate its reads on
                    diagonal-dominant graphs.
      halo_widths:  static tuple of the padded H_k (0 entries mean that
                    offset's ring round is skipped entirely).
      senders_halo: (S, E_s) int32 — per edge, the position of its sender
                    inside the shard's concatenated read buffer
                    [x_local (rows) ; offset-1 block (H_1) ; ... ;
                    offset-(S-1) block]: local senders index [0, rows),
                    a remote sender from owner o at offset k=(s-o)%%S
                    indexes rows + sum(H_j, j<k) + rank.
      bsr:          optional ShardedBSR (attach_shard_bsr) — per-shard
                    block-sparse forms in buffer coordinates, so the halo
                    exchange feeds the Pallas kernel instead of
                    gather+segment-sum.
    """

    senders: jax.Array           # (S, E_s) int32 global
    receivers_local: jax.Array   # (S, E_s) int32 local
    vals: jax.Array              # (S, E_s) float32
    node_mask: jax.Array         # (S, rows_per_shard) bool
    send_maps: Optional[Tuple[jax.Array, ...]]  # per offset: (S, H_k) int32
    senders_halo: Optional[jax.Array] # (S, E_s) int32
    n_shards: int = struct.field(pytree_node=False)
    rows_per_shard: int = struct.field(pytree_node=False)
    halo_widths: Tuple[int, ...] = struct.field(
        pytree_node=False, default=()
    )
    bsr: Optional[ShardedBSR] = None

    @property
    def n_nodes(self) -> int:
        return self.n_shards * self.rows_per_shard

    @property
    def halo_cols(self) -> int:
        return sum(self.halo_widths)


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

    send_maps = senders_halo = None
    halo_widths: Tuple[int, ...] = ()
    if build_halo:
        # H is sized by REMOTE requests only: local senders read x_local
        # directly (see class docstring — including them makes halo cost
        # what all_gather costs on diagonal-dominant graphs). Widths are
        # PER RING OFFSET k = (dest - owner) mod S, not a global max: one
        # dense boundary pair only inflates its own offset's round.
        widths = []
        for k in range(1, n_shards):
            h_k = max(
                (len(needed[(o + k) % n_shards][o]) for o in range(n_shards)),
                default=0,
            )
            widths.append(0 if h_k == 0 else int(np.ceil(h_k / 128) * 128))
        halo_widths = tuple(widths)
        base = rows + np.concatenate([[0], np.cumsum(widths)]).astype(np.int64)

        send_maps_np = [
            np.zeros((n_shards, w), np.int32) for w in widths
        ]
        senders_halo = np.zeros((n_shards, e_pad), np.int32)
        for k in range(1, n_shards):
            for o in range(n_shards):
                req = needed[(o + k) % n_shards][o]
                # owner o ships these (local ids) at ring offset k
                send_maps_np[k - 1][o, : len(req)] = req - o * rows
        for s in range(n_shards):
            # read-buffer layout at shard s: [x_local (rows) ; offset
            # blocks of H_k rows]; a local sender g sits at g - s*rows, a
            # remote one from owner o at base[k-1] + rank within
            # needed[s][o], k = (s - o) mod S
            ke = len(per_shard[s])
            es = senders[per_shard[s]]
            owner = es // rows
            pos = np.zeros(ke, np.int64)
            local = owner == s
            pos[local] = es[local] - s * rows
            for o in range(n_shards):
                if o == s:
                    continue
                sel = owner == o
                if sel.any():
                    k = (s - o) % n_shards
                    pos[sel] = base[k - 1] + np.searchsorted(
                        needed[s][o], es[sel]
                    )
            senders_halo[s, :ke] = pos
        send_maps = tuple(jnp.asarray(a) for a in send_maps_np)

    return PartitionedGraph(
        senders=jnp.asarray(S),
        receivers_local=jnp.asarray(R),
        vals=jnp.asarray(V),
        node_mask=jnp.asarray(M),
        send_maps=send_maps,
        senders_halo=None if senders_halo is None else jnp.asarray(senders_halo),
        n_shards=n_shards,
        rows_per_shard=rows,
        halo_widths=halo_widths,
    )


def attach_shard_bsr(
    pg: PartitionedGraph,
    tile: Optional[int] = None,
    tile_c: Optional[int] = None,
    min_edges_per_tile: "int | str" = "auto",
    dtype: str = "float32",
    mesh: Optional[Mesh] = None,
    axis: str = "graph",
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

    **Per-process construction** (the pod path): with a multi-process
    ``mesh``, each process MATERIALIZES dense blocks only for the shards
    whose devices it owns — the other shards get a cheap count-only pass
    (so the stacked shapes still agree globally) and the global stacked
    arrays are assembled from process-local slabs via
    ``jax.make_array_from_process_local_data``. Host+device bytes per
    process scale as S_local/S instead of every host paying for all S
    shards' blocks (SCALING_r04 measured 83.6x stacked-form inflation at
    S=64; this is the deployment note turned into code). Single-process
    (mesh=None or one process) builds everything as before.
    """
    from chromegcn_tpu.ops.spmm_pallas import (
        TILE,
        TILE_C,
        _build_one_direction,
    )

    if pg.send_maps is None:
        raise ValueError("partition was built without halo metadata")
    tile = TILE if tile is None else tile
    tile_c = TILE_C if tile_c is None else tile_c
    rows = pg.rows_per_shard
    halo_cols = pg.halo_cols  # per-offset padded widths summed
    if rows % tile or rows % tile_c or halo_cols % tile_c:
        raise ValueError(
            f"rows_per_shard={rows} and halo block={halo_cols} must be "
            f"multiples of tile={tile} and tile_c={tile_c}"
        )
    np_dtype = {"float32": np.float32, "bfloat16": jnp.bfloat16}[dtype]

    own_lo, own_hi = 0, pg.n_shards
    multiproc = mesh is not None and jax.process_count() > 1
    if multiproc:
        from jax.sharding import NamedSharding

        from chromegcn_tpu.parallel.multihost import local_row_range

        own_lo, own_hi = local_row_range(
            NamedSharding(mesh, P(axis)), (pg.n_shards,)
        )

    cols_h = np.asarray(pg.senders_halo)
    rows_l = np.asarray(pg.receivers_local)
    vals = np.asarray(pg.vals)
    # per group: materialized BSRMatrix for owned shards, (nt, ns) shape
    # counts for every shard (to agree on the global stacked padding)
    groups = {k: {"mats": [], "shapes": []} for k in ("fl", "bl", "fh", "bh")}
    for s in range(pg.n_shards):
        live = vals[s] != 0.0  # padding edges carry val 0 (exact no-ops)
        c, r, v = cols_h[s][live], rows_l[s][live], vals[s][live]
        loc = c < rows
        cl, rl, vl = c[loc], r[loc], v[loc]
        ch, rh, vh = c[~loc] - rows, r[~loc], v[~loc]
        owned = own_lo <= s < own_hi

        def build(group, src, dst, val, n_rows, n_cols):
            groups[group]["shapes"].append(
                _build_one_direction(
                    src, dst, val, n_rows=n_rows, tile_r=tile, tile_c=tile_c,
                    min_edges_per_tile=min_edges_per_tile, dtype=np_dtype,
                    n_cols=n_cols, count_only=True,
                )
            )
            if owned:
                groups[group]["mats"].append(
                    _build_one_direction(
                        src, dst, val, n_rows=n_rows, tile_r=tile,
                        tile_c=tile_c, min_edges_per_tile=min_edges_per_tile,
                        dtype=np_dtype, n_cols=n_cols,
                    )
                )

        build("fl", cl, rl, vl, rows, rows)
        build("bl", rl, cl, vl, rows, rows)
        if halo_cols:
            # halo tile columns: pad halo_cols up to a tile_r multiple for
            # the transposed (halo_cols x rows) operator's row blocking
            hc_pad = int(np.ceil(halo_cols / max(tile, tile_c)) * max(tile, tile_c))
            build("fh", ch, rh, vh, rows, hc_pad)
            build("bh", rh, ch, vh, hc_pad, rows)

    def place(local: np.ndarray) -> jax.Array:
        if not multiproc:
            return jnp.asarray(local)
        from jax.sharding import NamedSharding

        from chromegcn_tpu.parallel.multihost import put_global

        spec = P(axis, *([None] * (local.ndim - 1)))
        return put_global(
            local, NamedSharding(mesh, spec), already_local=True
        )

    def stack_mats(group) -> Optional[ShardedBSRMats]:
        mats, shapes = groups[group]["mats"], groups[group]["shapes"]
        if not shapes:
            return None
        # global padding targets: max bucketed counts over ALL shards
        nt_max = max(s[0] for s in shapes)
        ns_max = max(s[1] for s in shapes)

        def stack(field, n_max):
            arrs = [np.asarray(getattr(m, field)) for m in mats]
            out = np.zeros((len(arrs), n_max) + arrs[0].shape[1:], arrs[0].dtype)
            for i, a in enumerate(arrs):
                out[i, : a.shape[0]] = a
            return place(out)

        return ShardedBSRMats(
            tiles=stack("tiles", nt_max),
            tile_rb=stack("tile_rb", nt_max),
            tile_cb=stack("tile_cb", nt_max),
            strips=stack("strips", ns_max),
            strip_rb=stack("strip_rb", ns_max),
            strip_cb=stack("strip_cb", ns_max),
            live=place(np.stack([np.asarray(m.live) for m in mats])),
        )

    return pg.replace(
        bsr=ShardedBSR(
            fwd_local=stack_mats("fl"),
            fwd_halo=stack_mats("fh"),
            bwd_local=stack_mats("bl"),
            bwd_halo=stack_mats("bh"),
            tile_r=tile,
            tile_c=tile_c,
            n_rows=rows,
            # operator-view column count (halo_cols padded to a tile_r
            # multiple when tile_r > tile_c; the kernel zero-pads the
            # runtime halo buffer to match)
            halo_cols=(
                int(np.ceil(halo_cols / max(tile, tile_c)) * max(tile, tile_c))
                if halo_cols else 0
            ),
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
        if pg.send_maps is None:
            raise ValueError("partition was built without halo metadata")

        def kernel(send_maps, senders_halo, receivers_local, vals, x_local):
            # read buffer = [local rows ; per-offset halo blocks]: local
            # senders skip the exchange entirely (see PartitionedGraph
            # docstring); each ring round k ships only that offset's
            # width H_k (zero-width offsets skip their round)
            parts = [x_local]
            for k, sm in enumerate(send_maps, start=1):
                if sm.shape[-1] == 0:
                    continue
                buf = jnp.take(x_local, sm[0], axis=0)  # (H_k, d)
                recv = jax.lax.ppermute(
                    buf, axis,
                    [(o, (o + k) % n_shards) for o in range(n_shards)],
                )
                parts.append(recv)
            buffer = jnp.concatenate(parts, axis=0)
            gathered = jnp.take(buffer, senders_halo[0], axis=0) * vals[0][:, None]
            return jax.ops.segment_sum(
                gathered, receivers_local[0], num_segments=rows
            )

        args = (pg.send_maps, pg.senders_halo, pg.receivers_local, pg.vals, x)
        in_specs = (
            tuple(P(axis, None) for _ in pg.send_maps),
            P(axis, None), P(axis, None), P(axis, None), P(axis, None),
        )
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

        def kernel(send_maps, fl, fh, bl, bh, x_local):
            # identical per-offset ring exchange to 'halo' ...
            parts = []
            for k, sm in enumerate(send_maps, start=1):
                if sm.shape[-1] == 0:
                    continue
                buf = jnp.take(x_local, sm[0], axis=0)  # (H_k, d)
                recv = jax.lax.ppermute(
                    buf, axis,
                    [(o, (o + k) % n_shards) for o in range(n_shards)],
                )
                parts.append(recv)
            # ... feeding TWO Pallas block-sparse matmuls: the local one
            # (rows x rows over x_local) has no dependency on the
            # exchange, permitting XLA's async collectives to overlap it
            # with the bulk of the compute; the halo one (rows x
            # halo_cols) consumes the received rows. The custom VJPs
            # route d(x_local) = A_local^T g and d(halo) = A_halo^T g,
            # the latter back through the ppermute transposes
            # automatically.
            out_local = _spmm_bsr(
                BSROperator(
                    fwd=shard_mat(fl, rows, rows),
                    bwd=shard_mat(bl, rows, rows),
                ),
                x_local,
            )
            if fh is None:
                return out_local
            halo = jnp.concatenate(parts, axis=0)
            if halo.shape[0] < sb.halo_cols:
                # operator view is padded to a tile multiple; pad rows
                # are never read (no edge maps past the live widths)
                halo = jnp.pad(
                    halo, ((0, sb.halo_cols - halo.shape[0]), (0, 0))
                )
            out_halo = _spmm_bsr(
                BSROperator(
                    fwd=shard_mat(fh, rows, sb.halo_cols),
                    bwd=shard_mat(bh, sb.halo_cols, rows),
                ),
                halo,
            )
            return out_local + out_halo

        def mats_specs(mats):
            if mats is None:
                return None
            return jax.tree_util.tree_map(
                lambda a: P(axis, *([None] * (a.ndim - 1))), mats
            )

        args = (
            pg.send_maps, sb.fwd_local, sb.fwd_halo, sb.bwd_local,
            sb.bwd_halo, x,
        )
        in_specs = (
            tuple(P(axis, None) for _ in pg.send_maps),
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
        # mesh-aware: on a multi-process mesh each host materializes only
        # its own shards' blocks (per-process operator construction)
        pg = attach_shard_bsr(pg, dtype=spmm_dtype, mesh=mesh, axis=axis)
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
