"""Pallas block-sparse SpMM — the TPU-native replacement for torch.spmm.

Why this shape: Mosaic (this jaxlib) has no cross-tile vector gather, and
XLA's gather/scatter path runs at ~115 GB/s / 60 GB/s effective on this
chip (measured) — an order of magnitude off HBM speed. Hi-C contact graphs
are diagonal-dominant (short-range contacts dominate the top-k selection),
so the adjacency is converted host-side into two dense block populations,
both consumed by ONE kernel:

- **tiles**: (tile_r x 128) dense blocks for every region with enough
  edges. SpMM over these is a block-sparse matmul: pure MXU, zero
  gather/scatter. The column block is fixed at the 128-lane width because
  tile DMA on this chip is element-rate bound (~30 G elem/s measured,
  dtype-independent) and for a diagonal-dominant graph the streamed
  element count scales with the column width, not the row height.
- **strips**: (8 x 128) mini-blocks for the stragglers. Every edge falls
  in exactly one strip, so there is NO COO remainder: the XLA scatter-add
  a remainder path would need rewrites the whole (N x d) output in HBM
  (~0.6 ms at chr1 scale, measured) — strips instead accumulate into the
  VMEM-resident output inside the same kernel for ~free.

The kernel is a flat-list block-sparse matmul using
PrefetchScalarGridSpec: block row/col offsets are scalar-prefetched; grid
steps [0, nt/K) stream K tiles each, steps [nt/K, nt/K + ns/K2) stream K2
strips each; x and out stay fully VMEM-resident (v5e exposes ~128 MB;
50k x 128 f32 = 25 MB each) and every block accumulates via aligned
dynamic-slice `+=` — no gather, no scatter, no output-revisit ordering
constraint.

Backward: dX = A^T g — the transposed tiling is precomputed host-side and
stored alongside; the custom VJP reuses the same kernel. Edge-value
gradients (adjacency saliency) go through ops.spmm.sddmm explicitly, as in
the reference's analysis path (reference: scripts/visualize.py adj.grad).
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from chromegcn_tpu.ops.sparse import SparseGraph

TILE = 128       # default tile row height (tuned: see DESIGN.md §1)
TILE_C = 128     # tile/strip column width == TPU lane count
STRIP_R = 8      # strip row height == f32 sublane count
# 'auto' split break-even: densify a 128x128 region when it holds >= this
# many occupied strips (measured tile/strip cost ratio ~5.7, DESIGN.md §1)
AUTO_BREAKEVEN_STRIPS = 6


@struct.dataclass
class BSRMatrix:
    """Flat-list block-sparse matrix (one direction: A or A^T).

    Rectangular in general: (n_rows x n_cols). Square for a whole-chromosome
    adjacency; rectangular for per-shard operators (local rows x halo
    columns — parallel/graph.py) and row/col panels of oversized graphs.
    """

    tiles: jax.Array      # (nt, tile_r, tile_c) dense tiles
    tile_rb: jax.Array    # (nt,) int32 tile row-block index (sorted)
    tile_cb: jax.Array    # (nt,) int32 tile col-block index
    strips: jax.Array     # (ns, 8, tile_c) dense strips for straggler edges
    strip_rb: jax.Array   # (ns,) int32 strip row-block index (units of 8 rows)
    strip_cb: jax.Array   # (ns,) int32 strip col-block index (units of tile_c)
    # (2,) int32 [live tile grid steps, live strip grid steps]: block counts
    # are bucketed (128) so compiled programs are shared across chromosomes
    # and shards, but the kernel's index maps clamp to the LIVE step count —
    # Mosaic skips the DMA when the block index repeats and pl.when skips
    # the compute, so the padding blocks cost ~nothing (measured ~9% of
    # kernel time before this, more on small chromosomes). Dynamic (a
    # prefetched scalar), NOT a static field: static would specialize the
    # compile per chromosome and defeat the bucketing.
    live: jax.Array
    n_rows: int = struct.field(pytree_node=False)
    n_cols: int = struct.field(pytree_node=False)
    tile_r: int = struct.field(pytree_node=False)
    tile_c: int = struct.field(pytree_node=False)

    @property
    def n_nodes(self) -> int:
        return self.n_rows


@struct.dataclass
class BSROperator:
    """Forward + transposed block-sparse forms of one adjacency."""

    fwd: BSRMatrix
    bwd: BSRMatrix  # A^T

    @property
    def n_nodes(self) -> int:
        return self.fwd.n_rows


# ---------------------------------------------------------------------------
# Host-side conversion
# ---------------------------------------------------------------------------


def _bucket(n: int, mult: int) -> int:
    return int(np.ceil(max(n, 1) / mult) * mult)


def _build_one_direction(
    senders: np.ndarray,
    receivers: np.ndarray,
    vals: np.ndarray,
    n_rows: int,
    tile_r: int,
    tile_c: int,
    min_edges_per_tile: Union[int, str],
    dtype=np.float32,
    n_cols: Optional[int] = None,
    count_only: bool = False,
) -> BSRMatrix:
    """senders index columns [0, n_cols); receivers index rows [0, n_rows).

    count_only=True returns (nt_pad, ns_pad, nt, ns) — the padded
    block-array shapes the build WOULD produce plus the unpadded live
    counts — skipping the dense materialization. Used by the per-process
    sharded build (parallel.graph.attach_shard_bsr with a multi-process
    mesh) to agree on globally consistent stacked shapes without every
    host paying for every shard's blocks, and by the hybrid operator's
    host-side cost model (ops.spmm_hybrid.estimate_costs_ns).
    """
    if n_cols is None:
        n_cols = n_rows
    ncb = n_cols // tile_c

    rb = receivers // tile_r
    cb = senders // tile_c
    key = rb.astype(np.int64) * ncb + cb.astype(np.int64)
    uniq, inv, counts = np.unique(key, return_inverse=True, return_counts=True)
    if min_edges_per_tile == "auto":
        # Cost-optimal split: a tile region is densified when covering its
        # edges with (8 x tile_c) strips would cost more than one tile.
        # k = occupied strip slots in the region. Measured on this chip
        # (fori-loop ablation, chr1 scale): one 128x128 tile ~810 ns
        # (~20 G elem/s), one strip ~141 ns (per-block overhead bound,
        # ~7 G elem/s) -> break-even k ~= 5.7. NOTE the element-optimal
        # rule (k >= tile_r/8 = 16) is a measured LOSS (11.5 G elem/s
        # aggregate): strips are 3x less element-efficient than tiles.
        strip_key = (receivers // STRIP_R).astype(np.int64) * ncb + cb
        uniq_strips = np.unique(strip_key)
        tile_of_strip = (
            (uniq_strips // ncb) // (tile_r // STRIP_R)
        ) * ncb + uniq_strips % ncb
        tkeys, k_strips = np.unique(tile_of_strip, return_counts=True)
        # every edge-bearing tile region appears in both uniq and tkeys
        k = k_strips[np.searchsorted(tkeys, uniq)]
        # scale break-even with tile area relative to the measured 128x128,
        # rounding UP: floor would give threshold 1 at 32x128 (6*0.25 -> 1),
        # densifying every edge-bearing region; ceil (6*0.25 -> 2) keeps the
        # cost model monotone at sub-128 tile heights (round-4 sweep,
        # bench_tiles.py / DESIGN.md §1)
        is_dense = k >= max(
            1, -(-AUTO_BREAKEVEN_STRIPS * (tile_r * tile_c) // (128 * 128))
        )
    else:
        is_dense = counts >= min_edges_per_tile

    dense_keys = np.sort(uniq[is_dense])
    key_to_tile = {int(k): i for i, k in enumerate(dense_keys)}
    nt = len(dense_keys)
    # bucket tile count so kernel shapes (and compiles) are shared across
    # chromosomes: pad with zero tiles at (0, 0) — a pure += of zeros.
    # The no-tiles case (common under the 'auto' split on graphs with no
    # dense near-diagonal region) pads to one grid step, not a full
    # bucket: 128 zero tiles would stream 2.1M dead elements.
    nt_pad = TILES_PER_STEP if nt == 0 else _bucket(nt, 128)

    # stragglers -> (8 x tile_c) strips; every edge lands in exactly one
    in_dense = is_dense[inv]
    se = np.nonzero(~in_dense)[0]
    ss, sr, sv = senders[se], receivers[se], vals[se]
    ncb8 = ncb
    skey = (sr // STRIP_R).astype(np.int64) * ncb8 + (ss // tile_c).astype(np.int64)
    strip_keys = np.sort(np.unique(skey)) if len(skey) else np.zeros(0, np.int64)
    ns = len(strip_keys)
    ns_pad = _bucket(ns, 128)

    if count_only:
        return nt_pad, ns_pad, nt, ns

    tiles = np.zeros((nt_pad, tile_r, tile_c), np.float32)
    tile_rb = np.zeros(nt_pad, np.int32)
    tile_cb = np.zeros(nt_pad, np.int32)
    tile_rb[:nt] = (dense_keys // ncb).astype(np.int32)
    tile_cb[:nt] = (dense_keys % ncb).astype(np.int32)
    de = np.nonzero(in_dense)[0]
    if len(de):
        tidx = np.fromiter(
            (key_to_tile[int(k)] for k in key[de]), count=len(de), dtype=np.int64
        )
        np.add.at(tiles, (tidx, receivers[de] % tile_r, senders[de] % tile_c), vals[de])
    strips = np.zeros((ns_pad, STRIP_R, tile_c), np.float32)
    strip_rb = np.zeros(ns_pad, np.int32)
    strip_cb = np.zeros(ns_pad, np.int32)
    strip_rb[:ns] = (strip_keys // ncb8).astype(np.int32)
    strip_cb[:ns] = (strip_keys % ncb8).astype(np.int32)
    if len(se):
        key_to_strip = {int(k): i for i, k in enumerate(strip_keys)}
        sidx = np.fromiter(
            (key_to_strip[int(k)] for k in skey), count=len(skey), dtype=np.int64
        )
        np.add.at(strips, (sidx, sr % STRIP_R, ss % tile_c), sv)

    cast = (lambda a: a) if dtype == np.float32 else (lambda a: a.astype(dtype))
    live = np.asarray(
        [
            max(1, -(-nt // TILES_PER_STEP)),
            max(1, -(-ns // STRIPS_PER_STEP)),
        ],
        np.int32,
    )
    return BSRMatrix(
        tiles=jnp.asarray(cast(tiles)),
        tile_rb=jnp.asarray(tile_rb),
        tile_cb=jnp.asarray(tile_cb),
        strips=jnp.asarray(cast(strips)),
        strip_rb=jnp.asarray(strip_rb),
        strip_cb=jnp.asarray(strip_cb),
        live=jnp.asarray(live),
        n_rows=n_rows,
        n_cols=n_cols,
        tile_r=tile_r,
        tile_c=tile_c,
    )


def bsr_from_graph(
    graph: SparseGraph,
    tile: int = TILE,
    min_edges_per_tile: Union[int, str] = "auto",
    dtype: str = "float32",
    tile_c: int = TILE_C,
) -> BSROperator:
    """Convert a padded-COO SparseGraph into forward+transposed BSR forms.

    tile: row height of the dense tiles (column width is fixed at
    ``tile_c``, default the 128-lane width — see module docstring).
    min_edges_per_tile: 'auto' (default) picks the cost-optimal tile/strip
    split per region: densify iff the region holds >= AUTO_BREAKEVEN_STRIPS
    (=6) occupied strips, the measured tile:strip cost ratio ~5.7 on this
    chip (the element-optimal rule k >= tile_r/8 is a measured loss —
    DESIGN.md §1); an int reproduces the fixed edge-count threshold.
    dtype: 'float32' (exact, HIGHEST-precision matmuls — parity mode) or
    'bfloat16' (fast mode: half the tile HBM traffic; ~0.4% relative error
    on row-normalized adjacency values).
    """
    if graph.n_nodes % tile != 0 or graph.n_nodes % tile_c != 0:
        raise ValueError(
            f"n_nodes={graph.n_nodes} must be a multiple of tile={tile} "
            f"and tile_c={tile_c}; pad the graph accordingly"
        )
    np_dtype = {"float32": np.float32, "bfloat16": jnp.bfloat16}[dtype]
    n_edges = int(graph.n_edges)
    s = np.asarray(graph.senders)[:n_edges]
    r = np.asarray(graph.receivers)[:n_edges]
    v = np.asarray(graph.vals)[:n_edges]
    fwd = _build_one_direction(
        s, r, v, graph.n_nodes, tile, tile_c, min_edges_per_tile, np_dtype
    )
    bwd = _build_one_direction(
        r, s, v, graph.n_nodes, tile, tile_c, min_edges_per_tile, np_dtype
    )
    return BSROperator(fwd=fwd, bwd=bwd)


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


# blocks processed per grid step: amortizes grid-step overhead (measured
# ~2us/step on this chip)
TILES_PER_STEP = 8
STRIPS_PER_STEP = 32
# VMEM budget for the fully-resident x/out variant (v5e exposes ~128MB)
_VMEM_RESIDENT_BYTES = 112 * 1024 * 1024


def _bsr_matmul(m: BSRMatrix, x: jax.Array) -> jax.Array:
    """Block-sparse dense matmul: out = A @ x over tiles + strips.

    x and out stay fully VMEM-resident; grid steps stream tile blocks then
    strip blocks from HBM, each accumulating into out via aligned
    dynamic-slice `+=`.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tr, tc = m.tile_r, m.tile_c
    nt = m.tiles.shape[0]
    ns = m.strips.shape[0]
    d = x.shape[1]
    assert x.shape[0] == m.n_cols, (x.shape, m.n_cols)
    K = TILES_PER_STEP
    K2 = STRIPS_PER_STEP
    assert nt % K == 0 and ns % K2 == 0, "block counts are bucketed"
    st = nt // K  # tile steps
    ss = ns // K2  # strip steps

    if (m.n_rows + m.n_cols) * d * 4 > _VMEM_RESIDENT_BYTES:
        raise NotImplementedError(
            f"operand too large for VMEM-resident SpMM "
            f"(rows={m.n_rows}, cols={m.n_cols}, d={d}); build with "
            "attach_bsr/bsr_panels_from_graph (auto-panels oversized "
            "graphs) or shard the graph across devices (parallel.graph)"
        )

    fast = m.tiles.dtype == jnp.bfloat16
    precision = (
        jax.lax.Precision.DEFAULT if fast else jax.lax.Precision.HIGHEST
    )

    def kernel(rbt_ref, cbt_ref, rbs_ref, cbs_ref, live_ref, tiles_ref,
               strips_ref, x_ref, out_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        # live_ref holds [live tile steps, live strip steps]: block counts
        # are bucketed for compile sharing, and steps past the live range
        # are dead — their index maps pin the block index (DMA elided by
        # the pipeline's same-index skip) and pl.when skips their compute.
        @pl.when(step < live_ref[0])
        def _():
            for k in range(K):
                t = step * K + k
                rb = pl.multiple_of(rbt_ref[t] * tr, tr)
                cb = pl.multiple_of(cbt_ref[t] * tc, tc)
                xs = x_ref[pl.ds(cb, tc), :]
                out_ref[pl.ds(rb, tr), :] += jnp.dot(
                    tiles_ref[k],
                    xs.astype(jnp.bfloat16) if fast else xs,
                    preferred_element_type=jnp.float32,
                    # parity mode: full f32 accuracy (bf16x3) matching the
                    # reference's cuSPARSE f32 SpMM; fast mode: one bf16 pass
                    precision=precision,
                )

        @pl.when((step >= st) & (step - st < live_ref[1]))
        def _():
            for k in range(K2):
                t = (step - st) * K2 + k
                ro = pl.multiple_of(rbs_ref[t] * STRIP_R, STRIP_R)
                co = pl.multiple_of(cbs_ref[t] * tc, tc)
                xs = x_ref[pl.ds(co, tc), :]
                out_ref[pl.ds(ro, STRIP_R), :] += jnp.dot(
                    strips_ref[k],
                    xs.astype(jnp.bfloat16) if fast else xs,
                    preferred_element_type=jnp.float32,
                    precision=precision,
                )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(st + ss,),
        in_specs=[
            pl.BlockSpec(
                (K, tr, tc),
                lambda s, rbt, cbt, rbs, cbs, live: (
                    jnp.minimum(s, live[0] - 1),
                    0,
                    0,
                ),
            ),
            pl.BlockSpec(
                (K2, STRIP_R, tc),
                lambda s, rbt, cbt, rbs, cbs, live: (
                    jnp.clip(s - st, 0, live[1] - 1),
                    0,
                    0,
                ),
            ),
            pl.BlockSpec((m.n_cols, d), lambda s, *_: (0, 0)),
        ],
        out_specs=pl.BlockSpec((m.n_rows, d), lambda s, *_: (0, 0)),
    )
    elem_bytes = 2 if fast else 4
    flops = 2 * (nt * tr * tc + ns * STRIP_R * tc) * d
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m.n_rows, d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(m.tiles.size + m.strips.size) * elem_bytes
            + x.size * 4
            + m.n_nodes * d * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024
        ),
        interpret=jax.default_backend() == "cpu",
    )(m.tile_rb, m.tile_cb, m.strip_rb, m.strip_cb, m.live, m.tiles, m.strips, x)


@jax.custom_vjp
def _spmm_bsr(op: BSROperator, x: jax.Array) -> jax.Array:
    return _bsr_matmul(op.fwd, x)


def _spmm_bsr_fwd(op, x):
    return _bsr_matmul(op.fwd, x), op


def _spmm_bsr_bwd(op, g):
    dx = _bsr_matmul(op.bwd, g)
    zero_op = jax.tree_util.tree_map(jnp.zeros_like, op)
    return zero_op, dx


_spmm_bsr.defvjp(_spmm_bsr_fwd, _spmm_bsr_bwd)


# ---------------------------------------------------------------------------
# Panelized variant for graphs too large for VMEM-resident x/out
# ---------------------------------------------------------------------------


@struct.dataclass
class BSRPanelOperator:
    """Row/column-panelled block-sparse operator for oversized graphs.

    The flat kernel keeps x and out fully VMEM-resident, which caps
    N*d — chr1 at full 1kb-window scale (~250k windows, reference
    data/1create_windows.py tiles every window) exceeds it. Here the node
    range is cut into panels small enough that one (row-panel, col-panel)
    sub-matmul is VMEM-resident, and the SpMM becomes a static grid of
    panel kernels: out[pr] = sum_pc A[pr,pc] @ x[pc]. Empty panels are
    skipped at build time (diagonal-dominant Hi-C graphs populate only the
    near-diagonal panels, so the panel grid is itself sparse).

    ``fwd``/``bwd`` are tuples of rectangular BSRMatrix sub-blocks;
    ``fwd_coords``/``bwd_coords`` are the matching (row_panel, col_panel)
    indices; ``bounds`` are the node-range cut points (static).
    """

    fwd: Tuple[BSRMatrix, ...]
    bwd: Tuple[BSRMatrix, ...]
    fwd_coords: Tuple[Tuple[int, int], ...] = struct.field(pytree_node=False)
    bwd_coords: Tuple[Tuple[int, int], ...] = struct.field(pytree_node=False)
    bounds: Tuple[int, ...] = struct.field(pytree_node=False)

    @property
    def n_nodes(self) -> int:
        return self.bounds[-1]


def panel_bounds(n_nodes: int, d_model: int, align: int = 128) -> Tuple[int, ...]:
    """Node-range cut points so each (row-panel + col-panel) x/out pair of
    one sub-matmul fits the VMEM-resident budget."""
    max_panel = _VMEM_RESIDENT_BYTES // (2 * d_model * 4)
    max_panel = max(align, (max_panel // align) * align)
    k = int(np.ceil(n_nodes / max_panel))
    panel = int(np.ceil(n_nodes / k / align) * align)
    bounds = [0]
    while bounds[-1] < n_nodes:
        bounds.append(min(bounds[-1] + panel, n_nodes))
    return tuple(bounds)


def _build_panels(
    s: np.ndarray,
    r: np.ndarray,
    v: np.ndarray,
    bounds: Tuple[int, ...],
    tile_r: int,
    tile_c: int,
    min_edges_per_tile: Union[int, str],
    dtype,
):
    """One direction's panel grid: list of (pr, pc, BSRMatrix)."""
    panels, coords = [], []
    nb = len(bounds) - 1
    pr_of = np.searchsorted(bounds, r, side="right") - 1
    pc_of = np.searchsorted(bounds, s, side="right") - 1
    for pr in range(nb):
        for pc in range(nb):
            sel = (pr_of == pr) & (pc_of == pc)
            if not sel.any():
                continue
            m = _build_one_direction(
                s[sel] - bounds[pc],
                r[sel] - bounds[pr],
                v[sel],
                n_rows=bounds[pr + 1] - bounds[pr],
                tile_r=tile_r,
                tile_c=tile_c,
                min_edges_per_tile=min_edges_per_tile,
                dtype=dtype,
                n_cols=bounds[pc + 1] - bounds[pc],
            )
            panels.append(m)
            coords.append((pr, pc))
    return tuple(panels), tuple(coords)


def bsr_panels_from_graph(
    graph: SparseGraph,
    d_model: int = 128,
    tile: int = TILE,
    min_edges_per_tile: Union[int, str] = "auto",
    dtype: str = "float32",
    tile_c: int = TILE_C,
    bounds: Optional[Tuple[int, ...]] = None,
) -> BSRPanelOperator:
    """Panelled BSR for graphs whose N*d exceeds the VMEM-resident budget."""
    if graph.n_nodes % tile != 0 or graph.n_nodes % tile_c != 0:
        raise ValueError(
            f"n_nodes={graph.n_nodes} must be a multiple of tile={tile} "
            f"and tile_c={tile_c}; pad the graph accordingly"
        )
    np_dtype = {"float32": np.float32, "bfloat16": jnp.bfloat16}[dtype]
    if bounds is None:
        bounds = panel_bounds(graph.n_nodes, d_model)
    n_edges = int(graph.n_edges)
    s = np.asarray(graph.senders)[:n_edges]
    r = np.asarray(graph.receivers)[:n_edges]
    v = np.asarray(graph.vals)[:n_edges]
    fwd, fwd_coords = _build_panels(
        s, r, v, bounds, tile, tile_c, min_edges_per_tile, np_dtype
    )
    bwd, bwd_coords = _build_panels(
        r, s, v, bounds, tile, tile_c, min_edges_per_tile, np_dtype
    )
    return BSRPanelOperator(
        fwd=fwd, bwd=bwd, fwd_coords=fwd_coords, bwd_coords=bwd_coords,
        bounds=bounds,
    )


def _panel_matmul(
    panels: Tuple[BSRMatrix, ...],
    coords: Tuple[Tuple[int, int], ...],
    bounds: Tuple[int, ...],
    x: jax.Array,
) -> jax.Array:
    d = x.shape[1]
    nb = len(bounds) - 1
    acc: dict = {}
    for (pr, pc), m in zip(coords, panels):
        seg = _bsr_matmul(m, jax.lax.slice(x, (bounds[pc], 0), (bounds[pc + 1], d)))
        acc[pr] = seg if pr not in acc else acc[pr] + seg
    parts = [
        acc.get(pr, jnp.zeros((bounds[pr + 1] - bounds[pr], d), jnp.float32))
        for pr in range(nb)
    ]
    return jnp.concatenate(parts, axis=0) if nb > 1 else parts[0]


@jax.custom_vjp
def _spmm_bsr_panels(op: BSRPanelOperator, x: jax.Array) -> jax.Array:
    return _panel_matmul(op.fwd, op.fwd_coords, op.bounds, x)


def _spmm_bsr_panels_fwd(op, x):
    return _panel_matmul(op.fwd, op.fwd_coords, op.bounds, x), op


def _spmm_bsr_panels_bwd(op, g):
    dx = _panel_matmul(op.bwd, op.bwd_coords, op.bounds, g)
    zero_op = jax.tree_util.tree_map(jnp.zeros_like, op)
    return zero_op, dx


_spmm_bsr_panels.defvjp(_spmm_bsr_panels_fwd, _spmm_bsr_panels_bwd)


def attach_bsr(
    graph: SparseGraph,
    tile: int = TILE,
    min_edges_per_tile: Union[int, str] = "auto",
    dtype: str = "float32",
    d_model: int = 128,
) -> SparseGraph:
    """Return the graph with a precomputed block-sparse form attached
    (host-side): the flat VMEM-resident BSROperator when x/out fit, else
    the panelled BSRPanelOperator (d_model sizes that budget check)."""
    if (2 * graph.n_nodes * d_model * 4) > _VMEM_RESIDENT_BYTES:
        op = bsr_panels_from_graph(
            graph, d_model=d_model, tile=tile,
            min_edges_per_tile=min_edges_per_tile, dtype=dtype,
        )
    else:
        op = bsr_from_graph(graph, tile, min_edges_per_tile, dtype)
    return graph.replace(bsr=op)


def streamed_elements(op, d: int = 128) -> dict:
    """Roofline accounting: elements the kernel actually streams per SpMM.

    Counts LIVE grid steps only (dead bucketing steps pin their block index
    so the pipeline elides the DMA — see BSRMatrix.live). Used by bench.py
    to report % of the measured block-stream bound and % of the HBM-bytes
    roofline (BASELINE.md "SpMM >= 80% of roofline" accounting).

    Returns per-direction block elements plus the x/out resident traffic
    (streamed once per kernel launch, not per block).
    """
    def one(m: BSRMatrix) -> dict:
        lt, ls = (int(v) for v in np.asarray(m.live))
        tile_elems = lt * TILES_PER_STEP * m.tile_r * m.tile_c
        strip_elems = ls * STRIPS_PER_STEP * STRIP_R * m.tile_c
        return {
            "tile_elems": tile_elems,
            "strip_elems": strip_elems,
            "block_elems": tile_elems + strip_elems,
            "x_out_elems": (m.n_cols + m.n_rows) * d,
            "elem_bytes": 2 if m.tiles.dtype == jnp.bfloat16 else 4,
        }

    if isinstance(op, BSROperator):
        return {"fwd": one(op.fwd), "bwd": one(op.bwd)}
    if isinstance(op, BSRPanelOperator):
        def tot(ms):
            out: dict = {}
            for m in ms:
                for k, v in one(m).items():
                    out[k] = v if k == "elem_bytes" else out.get(k, 0) + v
            return out
        return {"fwd": tot(op.fwd), "bwd": tot(op.bwd)}
    raise TypeError(f"unsupported operator type {type(op)}")


def spmm_pallas(graph, x: jax.Array) -> jax.Array:
    """Entry point used by ops.spmm dispatch.

    Accepts a BSROperator (preferred — precompute with ``bsr_from_graph``)
    or a plain SparseGraph (converted on the fly; fine outside jit, an
    error inside jit since conversion is host-side).
    """
    if isinstance(graph, BSROperator):
        return _spmm_bsr(graph, x)
    if isinstance(graph, BSRPanelOperator):
        return _spmm_bsr_panels(graph, x)
    if type(graph).__name__ == "HybridOperator":
        from chromegcn_tpu.ops.spmm_hybrid import spmm_hybrid

        return spmm_hybrid(graph, x)
    if isinstance(graph, SparseGraph):
        if isinstance(graph.senders, jax.core.Tracer):
            raise TypeError(
                "spmm_pallas needs a precomputed BSROperator under jit; "
                "build one with bsr_from_graph(graph) outside the jitted fn"
            )
        return _spmm_bsr(bsr_from_graph(graph), x)
    raise TypeError(f"unsupported graph type {type(graph)}")
