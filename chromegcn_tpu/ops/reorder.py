"""Ingest-time node reordering — the tile-occupancy lever for the BSR SpMM.

The BSR kernel's streamed-element count (its HBM cost) is set by how many
128-wide blocks the edge set touches; a node order that concentrates edges
near the diagonal needs fewer blocks. This module provides the standard
bandwidth-minimizing orders plus the accounting to decide whether to apply
one.

Measured verdict on Hi-C graphs (chr1-scale bench graph, this chip —
DESIGN.md §1): **genomic coordinate order is already near-optimal**.
Hi-C contact probability decays with genomic distance, so the top-k
contact graph is diagonal-banded by construction; RCM re-traverses that
band by BFS layers and *scrambles* the local block structure — a measured
0.52x slowdown (streamed elements UP ~1.9x). Degree-sort destroys the band
entirely. So the pipeline does NOT reorder Hi-C graphs by default — this
is shipped for the non-genomic graph flavors (expression/eQTL contact
maps, reference data/eqtl_data/, whose node order is arbitrary) and so
the negative result stays reproducible.

Permutation convention: ``order`` is "new position -> old node id"
(scipy's RCM convention), so features move with ``x[order]`` and outputs
move back with ``y = y_new[inverse(order)]``. Padded tail nodes
[n_valid, n_nodes) are never moved, and node_mask is preserved.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from chromegcn_tpu.ops.sparse import SparseGraph


def _valid_edges(graph: SparseGraph) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    n_edges = int(graph.n_edges)
    return (
        np.asarray(graph.senders)[:n_edges],
        np.asarray(graph.receivers)[:n_edges],
        np.asarray(graph.vals)[:n_edges],
    )


def _n_valid(graph: SparseGraph) -> int:
    return int(np.asarray(graph.node_mask).sum())


def _extend_identity(order_valid: np.ndarray, n_nodes: int) -> np.ndarray:
    """Extend a permutation of the valid nodes with an identity padded tail."""
    n_valid = order_valid.shape[0]
    order = np.arange(n_nodes, dtype=np.int32)
    order[:n_valid] = order_valid.astype(np.int32)
    return order


def rcm_permutation(graph: SparseGraph) -> np.ndarray:
    """Reverse Cuthill–McKee order of the valid subgraph (bandwidth
    minimizer). new->old; identity on the padded tail."""
    from scipy import sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    n_valid = _n_valid(graph)
    s, r, v = _valid_edges(graph)
    a = sp.csr_matrix(
        (np.ones_like(v), (r.astype(np.int64), s.astype(np.int64))),
        shape=(n_valid, n_valid),
    )
    order_valid = np.asarray(reverse_cuthill_mckee(a, symmetric_mode=False))
    return _extend_identity(order_valid, graph.n_nodes)


def degree_sort_permutation(graph: SparseGraph) -> np.ndarray:
    """Valid nodes by descending degree (stable). new->old; identity tail."""
    n_valid = _n_valid(graph)
    s, r, _ = _valid_edges(graph)
    deg = np.bincount(r, minlength=n_valid) + np.bincount(s, minlength=n_valid)
    order_valid = np.argsort(-deg[:n_valid], kind="stable")
    return _extend_identity(order_valid, graph.n_nodes)


def inverse_permutation(order: np.ndarray) -> np.ndarray:
    inv = np.empty_like(order)
    inv[order] = np.arange(order.shape[0], dtype=order.dtype)
    return inv


def permute_graph(graph: SparseGraph, order: np.ndarray) -> SparseGraph:
    """Relabel nodes: node old -> position of old in ``order``.

    Returns a new SparseGraph (bsr detached — re-attach after reordering).
    With x_new = x[order], spmm(perm_graph, x_new) == spmm(graph, x)[order].
    """
    import jax.numpy as jnp

    order = np.asarray(order)
    if order.shape[0] != graph.n_nodes:
        raise ValueError(
            f"order covers {order.shape[0]} nodes, graph has {graph.n_nodes}"
        )
    n_valid = _n_valid(graph)
    if not np.array_equal(
        np.sort(order[:n_valid]), np.arange(n_valid)
    ) or not np.array_equal(order[n_valid:], np.arange(n_valid, graph.n_nodes)):
        raise ValueError(
            "order must permute the valid nodes and be identity on the padded tail"
        )
    inv = inverse_permutation(order.astype(np.int32))
    senders = inv[np.asarray(graph.senders)]
    receivers = inv[np.asarray(graph.receivers)]
    return graph.replace(
        senders=jnp.asarray(senders),
        receivers=jnp.asarray(receivers),
        bsr=None,
    )


def streamed_block_elements(graph: SparseGraph, **bsr_kwargs) -> int:
    """Forward-direction live block elements the BSR kernel would stream
    for this graph — the objective a reordering tries to minimize."""
    from chromegcn_tpu.ops import spmm_pallas

    op = spmm_pallas.bsr_from_graph(graph, **bsr_kwargs)
    return spmm_pallas.streamed_elements(op)["fwd"]["block_elems"]
