"""Sparse chromosome-graph container and graph construction ops.

TPU-first design notes
----------------------
XLA requires static shapes, so a chromosome graph is a *padded COO* pytree:
``senders``/``receivers``/``vals`` arrays of a fixed (bucketed) edge capacity
and a fixed (bucketed) node capacity. Padding edges carry ``val == 0`` and
point at node 0, making them exact no-ops under segment-sum aggregation;
padding nodes are excluded from losses and BatchNorm statistics via
``node_mask``.

This replaces the reference's scipy/torch-sparse CPU pipeline
(reference: utils/util_methods.py:99-180) with a device-side pipeline:
degree via segment-sum, D^-1 A row scaling, all under jit.

The adjacency-flavor semantics mirror ``process_graph``
(reference: utils/util_methods.py:146-180):

- ``constant``: banded +/-7 neighbors plus self loops
- ``hic``:      Hi-C top-k contact pairs, self loops added, then binarized
- ``both``:     Hi-C + band + self loops, *not* binarized (raw values add)
- ``none``:     identity
followed by row normalization D^-1 A with a zero-degree guard
(reference: utils/util_methods.py:99-106).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class SparseGraph:
    """Padded COO sparse adjacency over one chromosome's windows.

    out[i] = sum_e vals[e] * x[senders[e]] for receivers[e] == i.

    Attributes:
      senders:   (E_pad,) int32 — source node (column) index per edge.
      receivers: (E_pad,) int32 — destination node (row) index per edge.
      vals:      (E_pad,) float32 — edge weights; 0.0 for padding edges.
      n_edges:   () int32 — number of valid (non-padding) edges.
      node_mask: (n_nodes,) bool — True for valid (non-padding) nodes.
      n_nodes:   static python int — padded node capacity.
    """

    senders: jax.Array
    receivers: jax.Array
    vals: jax.Array
    n_edges: jax.Array
    node_mask: jax.Array
    n_nodes: int = struct.field(pytree_node=False)
    # Optional precomputed block-sparse form (ops.spmm_pallas.BSROperator),
    # attached via ops.spmm_pallas.attach_bsr for the Pallas MXU kernel.
    bsr: Optional[object] = None

    @property
    def edge_capacity(self) -> int:
        return self.senders.shape[0]

    @property
    def n_valid_nodes(self) -> jax.Array:
        return jnp.sum(self.node_mask.astype(jnp.int32))

    def transpose(self) -> "SparseGraph":
        """A^T: swap senders/receivers. Used by the SpMM backward pass."""
        return self.replace(senders=self.receivers, receivers=self.senders)


# ---------------------------------------------------------------------------
# Host-side (numpy) construction — runs at ingest / graph-build time.
# ---------------------------------------------------------------------------


def _as_int32(x) -> np.ndarray:
    return np.asarray(x, dtype=np.int32)


def coalesce_coo(
    senders: np.ndarray, receivers: np.ndarray, vals: np.ndarray, n_nodes: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Sum duplicate (receiver, sender) entries, sorted row-major.

    Matches scipy sparse-matrix addition semantics so that edge-list sums
    reproduce ``A + eye`` / ``A + band`` exactly.
    """
    senders = _as_int32(senders)
    receivers = _as_int32(receivers)
    vals = np.asarray(vals, dtype=np.float32)
    key = receivers.astype(np.int64) * n_nodes + senders.astype(np.int64)
    uniq, inv = np.unique(key, return_inverse=True)
    out_vals = np.zeros(uniq.shape[0], dtype=np.float32)
    np.add.at(out_vals, inv, vals)
    out_receivers = (uniq // n_nodes).astype(np.int32)
    out_senders = (uniq % n_nodes).astype(np.int32)
    return out_senders, out_receivers, out_vals


def band_edges(n_valid: int, band: int = 7) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Constant-diagonal graph: neighbors at offsets -band..band excluding 0.

    Reference: utils/util_methods.py:137-144 (create_constant_graph).
    """
    senders, receivers = [], []
    for off in range(-band, band + 1):
        if off == 0:
            continue
        i = np.arange(max(0, -off), min(n_valid, n_valid - off), dtype=np.int32)
        receivers.append(i)
        senders.append(i + off)
    s = np.concatenate(senders)
    r = np.concatenate(receivers)
    return s, r, np.ones(s.shape[0], dtype=np.float32)


def eye_edges(n_valid: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    i = np.arange(n_valid, dtype=np.int32)
    return i, i, np.ones(n_valid, dtype=np.float32)


def build_chrom_graph(
    adj_type: str,
    n_valid: int,
    n_pad: Optional[int] = None,
    edge_capacity: Optional[int] = None,
    hic_edges: Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]] = None,
    band: int = 7,
    row_normalize_values: bool = True,
) -> SparseGraph:
    """Build one chromosome's adjacency in the reference's four flavors.

    Host-side constructor; returns a device-ready padded ``SparseGraph``
    with values already D^-1 A row-normalized (like the reference does on
    every finetune step — reference: finetune.py:36, utils/util_methods.py:177;
    we do it once at build time since the graph is static across epochs).

    Args:
      adj_type: one of 'constant' | 'hic' | 'both' | 'none'.
      n_valid: number of real windows (nodes) on this chromosome.
      n_pad: padded node capacity (defaults to n_valid rounded up to 128).
      edge_capacity: padded edge capacity (defaults to next multiple of 1024).
      hic_edges: (senders, receivers, vals) numpy COO of Hi-C contacts
        (symmetric, no self loops — reference: data/7create_graph_new.py:108-120).
      band: constant-graph half-width (reference: utils/util_methods.py:147).
    """
    if n_pad is None:
        n_pad = int(np.ceil(max(n_valid, 1) / 128) * 128)
    if n_pad < n_valid:
        raise ValueError(f"n_pad={n_pad} < n_valid={n_valid}")

    if adj_type == "constant":
        parts = [band_edges(n_valid, band), eye_edges(n_valid)]
        binarize = False
    elif adj_type == "hic":
        if hic_edges is None:
            raise ValueError("adj_type='hic' requires hic_edges")
        parts = [hic_edges, eye_edges(n_valid)]
        binarize = True  # reference: utils/util_methods.py:163-164
    elif adj_type == "both":
        if hic_edges is None:
            raise ValueError("adj_type='both' requires hic_edges")
        parts = [hic_edges, band_edges(n_valid, band), eye_edges(n_valid)]
        binarize = False  # reference 'both' branch does not binarize
    elif adj_type == "none":
        parts = [eye_edges(n_valid)]
        binarize = False
    else:
        raise ValueError(f"unknown adj_type {adj_type!r}")

    s = np.concatenate([p[0] for p in parts]).astype(np.int32)
    r = np.concatenate([p[1] for p in parts]).astype(np.int32)
    v = np.concatenate([p[2] for p in parts]).astype(np.float32)
    s, r, v = coalesce_coo(s, r, v, n_pad)

    if binarize:
        v = np.where(v > 0, 1.0, 0.0).astype(np.float32)

    if row_normalize_values:
        deg = np.zeros(n_pad, dtype=np.float64)
        np.add.at(deg, r, v.astype(np.float64))
        inv = np.where(deg == 0.0, 0.0, 1.0 / np.where(deg == 0.0, 1.0, deg))
        v = (v * inv[r]).astype(np.float32)

    return pad_graph(s, r, v, n_valid=n_valid, n_pad=n_pad, edge_capacity=edge_capacity)


def pad_graph(
    senders: np.ndarray,
    receivers: np.ndarray,
    vals: np.ndarray,
    n_valid: int,
    n_pad: int,
    edge_capacity: Optional[int] = None,
) -> SparseGraph:
    """Pad COO arrays to a static edge capacity and build the pytree."""
    e = int(senders.shape[0])
    if edge_capacity is None:
        edge_capacity = int(np.ceil(max(e, 1) / 1024) * 1024)
    if edge_capacity < e:
        raise ValueError(f"edge_capacity={edge_capacity} < n_edges={e}")
    pad = edge_capacity - e
    s = np.concatenate([senders, np.zeros(pad, np.int32)]).astype(np.int32)
    r = np.concatenate([receivers, np.zeros(pad, np.int32)]).astype(np.int32)
    v = np.concatenate([vals, np.zeros(pad, np.float32)]).astype(np.float32)
    mask = np.zeros(n_pad, dtype=bool)
    mask[:n_valid] = True
    return SparseGraph(
        senders=jnp.asarray(s),
        receivers=jnp.asarray(r),
        vals=jnp.asarray(v),
        n_edges=jnp.asarray(e, dtype=jnp.int32),
        node_mask=jnp.asarray(mask),
        n_nodes=int(n_pad),
    )


# ---------------------------------------------------------------------------
# Device-side ops (jit-compatible).
# ---------------------------------------------------------------------------


def row_normalize(graph: SparseGraph) -> SparseGraph:
    """D^-1 A with zero-degree guard, on device.

    Reference semantics: utils/util_methods.py:99-106 — rows with zero sum
    are left as all-zeros (1/0 -> 0 guard).
    """
    deg = jax.ops.segment_sum(graph.vals, graph.receivers, num_segments=graph.n_nodes)
    inv = jnp.where(deg == 0.0, 0.0, 1.0 / jnp.where(deg == 0.0, 1.0, deg))
    return graph.replace(vals=graph.vals * inv[graph.receivers])


def binarize(graph: SparseGraph) -> SparseGraph:
    """Clamp positive weights to 1, negatives to 0 (utils/util_methods.py:163-164).

    Note: operates per stored edge; build-time construction coalesces
    duplicates first so this matches scipy's matrix-level binarize.
    """
    return graph.replace(vals=jnp.where(graph.vals > 0, 1.0, 0.0))


def to_dense(graph: SparseGraph) -> jax.Array:
    """Densify (tests / tiny graphs only)."""
    dense = jnp.zeros((graph.n_nodes, graph.n_nodes), dtype=graph.vals.dtype)
    return dense.at[graph.receivers, graph.senders].add(graph.vals)


def from_dense(dense: np.ndarray, n_valid: Optional[int] = None) -> SparseGraph:
    """Build a SparseGraph from a dense matrix (tests only)."""
    dense = np.asarray(dense, dtype=np.float32)
    n = dense.shape[0]
    r, s = np.nonzero(dense)
    v = dense[r, s]
    return pad_graph(
        s.astype(np.int32),
        r.astype(np.int32),
        v,
        n_valid=n if n_valid is None else n_valid,
        n_pad=n,
    )
