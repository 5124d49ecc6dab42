"""Hybrid ultra-sparse SpMM: Pallas tiles for dense regions + XLA gather
for straggler edges.

Why this exists: the flat/panelled BSR kernel (ops/spmm_pallas.py) covers
every straggler edge with an (8 x 128) strip, and strip cost is per-block
*overhead* bound (~141 ns/strip measured — DESIGN.md §1), not bandwidth
bound. On the bucketed 2048-window graphs the strip population is small
and the kernel wins by an order of magnitude over XLA gather/scatter
(~115/60 GB/s effective, module docstring of spmm_pallas). But at the
reference's true full-chromosome scale (chr1 @ 1kb = 249k windows,
-hicsize 500k — reference: finetune.py:29-44, data/1create_windows.py)
the top-k graph is ultra-sparse (density ~1.5e-5): almost every edge is a
straggler, the strip population explodes (FULLSCALE_r05: 155,776 strips
for 911k edges = ~175 streamed elements per edge), and the strip loop
dominates the train step.

At that density the cost balance flips: a sorted gather + segment-sum is
*bandwidth* bound (~d*4 bytes gathered per edge + one (N, d) output
write), independent of how scattered the edges are. So the hybrid
operator partitions edges ONCE:

- regions of the (tile_r x tile_c) grid holding >= ``dense_region_edges``
  edges (in both A and A^T orientation) keep the MXU tile path — built
  with the existing BSR machinery (panelled automatically when x/out
  exceed the VMEM-resident budget);
- every remaining edge goes to a padded COO list sorted by output row,
  consumed by ``jnp.take`` + ``jax.ops.segment_sum(indices_are_sorted=
  True)`` — XLA's sorted scatter-add writes each output row once.

The custom VJP mirrors spmm_pallas: dX = A^T g via a second, pre-sorted
transposed edge list (sorted by the *sender*), so the backward gather is
also sorted — never the slow unsorted-scatter transpose XLA would derive
on its own. Like the BSR path, the operator itself gets a zero cotangent
(adjacency saliency goes through ops.spmm.sddmm explicitly, as the
reference reads adj.grad — reference: scripts/visualize.py).
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from chromegcn_tpu.ops.sparse import SparseGraph, pad_graph
from chromegcn_tpu.ops import spmm_pallas as sp

# Edge-count threshold for keeping a (tile_r x tile_c) region on the MXU
# tile path. Break-even: one 128x128 tile ~810 ns (DESIGN.md §1) vs the
# gather path's marginal per-edge cost (d*4 bytes gathered at the measured
# ~115 GB/s effective gather rate ~= 4.5 ns/edge at d=128, plus its share
# of the output write) -> ~90-100 edges. Regions below this are cheaper to
# gather than to stream as a dense tile.
DENSE_REGION_EDGES = 96
_EDGE_BUCKET = 8192

# Host-side cost-model constants for attach_auto (per-SpMM, d=128,
# nanoseconds; calibrated on this chip against HYBRID_r05.json's one-
# process full-chr1-scale shootout): tile ~810 ns (DESIGN.md §1); strip
# ~54 ns at scale (the ~141 ns bucketed-scale figure includes small-grid
# effects — using the at-scale value is conservative toward BSR, so the
# hybrid is only chosen when clearly ahead); gather ~13.6 ns/edge at
# d=128 plus the (N, d) output write. Model-vs-measured at chr1 scale:
# bsr 10.3 est / 10.35 ms measured; hybrid 6.1 est / 5.89 ms measured.
_TILE_NS = 810.0
_STRIP_NS = 54.0
_GATHER_NS_PER_EDGE = 13.6
_OUT_WRITE_NS_PER_ROW = 128 * 4 / 60.0  # d=128 f32 row at ~60 GB/s


@struct.dataclass
class HybridOperator:
    """Dense-region BSR tiles + sorted straggler COO, both directions.

    ``dense`` is a BSROperator / BSRPanelOperator over ONLY the dense-region
    edges (None when no region qualifies — then the operator is the pure
    sorted-gather path). ``f*`` arrays are the fwd stragglers of A sorted by
    receiver; ``b*`` the same edges in A^T orientation sorted by sender.
    Padding entries carry val 0 and point at the last row (keeps the sort
    order monotone for indices_are_sorted=True).
    """

    dense: Optional[object]
    fs: jax.Array  # (E_pad,) int32 straggler senders (gather index)
    fr: jax.Array  # (E_pad,) int32 straggler receivers (segment index, sorted)
    fv: jax.Array  # (E_pad,) float32 straggler values
    bs: jax.Array  # (E_pad,) int32 A^T gather index (= original receivers)
    br: jax.Array  # (E_pad,) int32 A^T segment index (= original senders, sorted)
    bv: jax.Array
    n_rows: int = struct.field(pytree_node=False)
    n_cols: int = struct.field(pytree_node=False)

    @property
    def n_nodes(self) -> int:
        return self.n_rows


def _sorted_coo(s: np.ndarray, r: np.ndarray, v: np.ndarray, n_rows: int,
                bucket: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Sort by segment index (r) and pad to a bucketed capacity."""
    order = np.lexsort((s, r))
    s, r, v = s[order], r[order], v[order]
    e = len(s)
    cap = max(bucket, int(np.ceil(max(e, 1) / bucket) * bucket))
    pad = cap - e
    # pad rows point at the LAST row with val 0: zero contribution, and the
    # segment-index array stays non-decreasing (indices_are_sorted=True)
    s = np.concatenate([s, np.zeros(pad, np.int32)]).astype(np.int32)
    r = np.concatenate([r, np.full(pad, n_rows - 1, np.int32)]).astype(np.int32)
    v = np.concatenate([v, np.zeros(pad, np.float32)]).astype(np.float32)
    return s, r, v


def hybrid_from_graph(
    graph: SparseGraph,
    d_model: int = 128,
    tile: int = sp.TILE,
    tile_c: int = sp.TILE_C,
    dense_region_edges: int = DENSE_REGION_EDGES,
    dtype: str = "float32",
    edge_bucket: int = _EDGE_BUCKET,
) -> HybridOperator:
    """Partition edges into dense-region tiles + sorted straggler COO."""
    n = graph.n_nodes
    if n % tile != 0 or n % tile_c != 0:
        raise ValueError(
            f"n_nodes={n} must be a multiple of tile={tile} and "
            f"tile_c={tile_c}; pad the graph accordingly"
        )
    e = int(graph.n_edges)
    s = np.asarray(graph.senders)[:e]
    r = np.asarray(graph.receivers)[:e]
    v = np.asarray(graph.vals)[:e].astype(np.float32)

    # a region is dense iff it clears the threshold in BOTH orientations —
    # one edge partition must serve A and A^T, and requiring both keeps the
    # transposed tile population as efficient as the forward one
    ncb = n // tile_c
    def region_counts(rows, cols):
        key = (rows // tile).astype(np.int64) * ncb + (cols // tile_c)
        uniq, inv, counts = np.unique(key, return_inverse=True,
                                      return_counts=True)
        return counts[inv]
    dense_sel = (region_counts(r, s) >= dense_region_edges) & (
        region_counts(s, r) >= dense_region_edges
    )

    if dense_sel.any():
        gtmp = pad_graph(s[dense_sel], r[dense_sel], v[dense_sel],
                         n_valid=n, n_pad=n)
        if (2 * n * d_model * 4) > sp._VMEM_RESIDENT_BYTES:
            dense_op = sp.bsr_panels_from_graph(
                gtmp, d_model=d_model, tile=tile, tile_c=tile_c,
                min_edges_per_tile=1, dtype=dtype,
            )
        else:
            dense_op = sp.bsr_from_graph(
                gtmp, tile=tile, tile_c=tile_c, min_edges_per_tile=1,
                dtype=dtype,
            )
    else:
        dense_op = None

    ss, rr, vv = s[~dense_sel], r[~dense_sel], v[~dense_sel]
    fs, fr, fv = _sorted_coo(ss, rr, vv, n, edge_bucket)
    bs, br, bv = _sorted_coo(rr, ss, vv, n, edge_bucket)
    return HybridOperator(
        dense=dense_op, fs=jnp.asarray(fs), fr=jnp.asarray(fr),
        fv=jnp.asarray(fv), bs=jnp.asarray(bs), br=jnp.asarray(br),
        bv=jnp.asarray(bv), n_rows=n, n_cols=n,
    )


def _dense_matmul(dense, direction: str, x: jax.Array) -> jax.Array:
    if isinstance(dense, sp.BSRPanelOperator):
        if direction == "fwd":
            return sp._panel_matmul(dense.fwd, dense.fwd_coords, dense.bounds, x)
        return sp._panel_matmul(dense.bwd, dense.bwd_coords, dense.bounds, x)
    m = dense.fwd if direction == "fwd" else dense.bwd
    return sp._bsr_matmul(m, x)


def _gather_matmul(gather_idx, seg_idx, vals, n_rows: int,
                   x: jax.Array) -> jax.Array:
    g = jnp.take(x, gather_idx, axis=0) * vals[:, None].astype(x.dtype)
    return jax.ops.segment_sum(
        g, seg_idx, num_segments=n_rows, indices_are_sorted=True
    ).astype(jnp.float32)


def _hybrid_apply(op: HybridOperator, x: jax.Array,
                  direction: str) -> jax.Array:
    if direction == "fwd":
        y = _gather_matmul(op.fs, op.fr, op.fv, op.n_rows, x)
    else:
        y = _gather_matmul(op.bs, op.br, op.bv, op.n_cols, x)
    if op.dense is not None:
        y = y + _dense_matmul(op.dense, direction, x)
    return y


@jax.custom_vjp
def spmm_hybrid(op: HybridOperator, x: jax.Array) -> jax.Array:
    """out = A @ x through the hybrid tile+gather operator."""
    return _hybrid_apply(op, x, "fwd")


def _spmm_hybrid_fwd(op, x):
    return _hybrid_apply(op, x, "fwd"), op


def _spmm_hybrid_bwd(op, g):
    dx = _hybrid_apply(op, g, "bwd")
    zero_op = jax.tree_util.tree_map(jnp.zeros_like, op)
    return zero_op, dx


spmm_hybrid.defvjp(_spmm_hybrid_fwd, _spmm_hybrid_bwd)


# ---------------------------------------------------------------------------
# Cost model + auto selection
# ---------------------------------------------------------------------------


def estimate_costs_ns(graph: SparseGraph, d: int = 128,
                      tile: int = sp.TILE, tile_c: int = sp.TILE_C) -> dict:
    """Host-side per-SpMM cost estimates (ns) for both operator forms.

    Uses the count-only BSR build (no dense materialization) and the
    measured per-block / per-edge constants above. Forward direction only —
    the backward structure is near-symmetric for the symmetric-by-
    construction Hi-C graphs (reference: data/7create_graph_new.py:108-120).
    """
    e = int(graph.n_edges)
    s = np.asarray(graph.senders)[:e]
    r = np.asarray(graph.receivers)[:e]
    v = np.asarray(graph.vals)[:e]
    _, _, nt, ns = sp._build_one_direction(
        s, r, v, graph.n_nodes, tile, tile_c, "auto", count_only=True
    )
    # live-step accounting: the kernel's index-map clamp elides the padded
    # dead steps, but within a live step all K blocks execute
    nt_live = -(-max(nt, 1) // sp.TILES_PER_STEP) * sp.TILES_PER_STEP
    ns_live = -(-max(ns, 1) // sp.STRIPS_PER_STEP) * sp.STRIPS_PER_STEP
    bsr_ns = nt_live * _TILE_NS + ns_live * _STRIP_NS

    ncb = graph.n_nodes // tile_c
    key = (r // tile).astype(np.int64) * ncb + (s // tile_c)
    uniq, inv, counts = np.unique(key, return_inverse=True, return_counts=True)
    dense_sel = (counts >= DENSE_REGION_EDGES)[inv]
    n_dense_tiles = int((counts >= DENSE_REGION_EDGES).sum())
    n_straggler = int((~dense_sel).sum())
    hybrid_ns = (
        n_dense_tiles * _TILE_NS
        + n_straggler * _GATHER_NS_PER_EDGE * (d / 128.0)
        + graph.n_nodes * _OUT_WRITE_NS_PER_ROW * (d / 128.0)
    )
    return {
        "bsr_ns": float(bsr_ns),
        "hybrid_ns": float(hybrid_ns),
        "n_dense_tiles": n_dense_tiles,
        "n_straggler_edges": n_straggler,
    }


def attach_auto(
    graph: SparseGraph,
    d_model: int = 128,
    dtype: str = "float32",
    strategy: str = "auto",
) -> SparseGraph:
    """Attach the cheaper operator form: BSR kernel or hybrid tile+gather.

    strategy: 'auto' picks by the host-side cost model (BSR on the dense
    bucketed graphs, hybrid at ultra-sparse full-chromosome scale);
    'bsr' / 'hybrid' force a form.
    """
    if strategy == "bsr":
        return sp.attach_bsr(graph, dtype=dtype, d_model=d_model)
    if strategy == "hybrid":
        return graph.replace(
            bsr=hybrid_from_graph(graph, d_model=d_model, dtype=dtype)
        )
    if strategy != "auto":
        raise ValueError(f"unknown strategy {strategy!r}")
    costs = estimate_costs_ns(graph, d=d_model)
    if costs["hybrid_ns"] < costs["bsr_ns"]:
        return graph.replace(
            bsr=hybrid_from_graph(graph, d_model=d_model, dtype=dtype)
        )
    return sp.attach_bsr(graph, dtype=dtype, d_model=d_model)
