"""SpMM (sparse adjacency x dense features) — the hot op of the GCN stage.

The reference delegates this single hot op to cuSPARSE via ``torch.spmm``
(reference: models/SubLayers.py:46). Here it is built TPU-native, three
ways:

- ``spmm_xla``:    gather + segment-sum. XLA lowers this to efficient
                   dynamic-gather / scatter-add on TPU; fully differentiable
                   (gather's transpose is scatter-add, so the backward pass
                   is the A^T SpMM plus an SDDMM for the value gradient,
                   derived automatically).
- ``spmm_pallas``: a Pallas kernel (see ``spmm_pallas.py``) that blocks
                   edges by source-node tile so each feature tile is read
                   from HBM once per block instead of once per edge, with a
                   custom VJP (backward = transposed-graph SpMM + SDDMM).
- ``spmm_hybrid``: dense-region Pallas tiles + sorted-gather stragglers
                   (see ``spmm_hybrid.py``) for ultra-sparse
                   full-chromosome graphs where the strip population is
                   per-block-overhead bound; ``attach_auto`` picks the
                   attached form per graph by a measured cost model.

``spmm`` picks the implementation: Pallas on TPU, XLA elsewhere.
"""

from __future__ import annotations



import jax
import jax.numpy as jnp

from chromegcn_tpu.ops.sparse import SparseGraph


def spmm_xla(graph: SparseGraph, x: jax.Array) -> jax.Array:
    """out[i] = sum_e vals[e] * x[senders[e]], grouped by receivers[e].

    Padding edges have val == 0 and indices 0, so they contribute nothing.

    Args:
      graph: padded COO adjacency (N nodes, E_pad edges).
      x: (N, D) node features.

    Returns:
      (N, D) aggregated features, dtype follows x.
    """
    gathered = jnp.take(x, graph.senders, axis=0)
    weighted = gathered * graph.vals[:, None].astype(x.dtype)
    return jax.ops.segment_sum(weighted, graph.receivers, num_segments=graph.n_nodes)


def sddmm(graph: SparseGraph, a: jax.Array, b: jax.Array) -> jax.Array:
    """Sampled dense-dense matmul: out[e] = <a[receivers[e]], b[senders[e]]>.

    This is the gradient of ``spmm`` w.r.t. the edge values; exposed for
    adjacency-saliency analysis (the reference reads ``adj.grad`` for this —
    reference: scripts/visualize.py).
    """
    return jnp.sum(
        jnp.take(a, graph.receivers, axis=0) * jnp.take(b, graph.senders, axis=0),
        axis=-1,
    )


def _spmm_dispatch(graph: SparseGraph, x: jax.Array, impl: str) -> jax.Array:
    if impl == "xla":
        return spmm_xla(graph, x)
    if impl == "pallas":
        from chromegcn_tpu.ops.spmm_pallas import spmm_pallas

        if getattr(graph, "bsr", None) is None:
            raise ValueError(
                "impl='pallas' requires a precomputed block-sparse form; "
                "attach one with ops.spmm_pallas.attach_bsr(graph)"
            )
        return spmm_pallas(graph.bsr, x)
    raise ValueError(f"unknown spmm impl {impl!r}")


def spmm(graph: SparseGraph, x: jax.Array, impl: str = "auto") -> jax.Array:
    """Sparse-matrix x dense-matrix product over a SparseGraph.

    impl: 'auto' (Pallas block-sparse kernel when the graph carries a
    precomputed BSR form, else XLA gather+segment-sum), 'xla', or 'pallas'.

    A node-sharded parallel.graph.ShardedGraph routes to the shard_map
    halo-exchange path regardless of impl (its strategy field already
    encodes the per-shard compute: BSR kernel or gather+segment-sum).
    """
    if type(graph).__name__ == "ShardedGraph":
        from chromegcn_tpu.parallel.graph import sharded_graph_spmm

        return sharded_graph_spmm(graph, x)
    if impl == "auto":
        impl = "pallas" if getattr(graph, "bsr", None) is not None else "xla"
    return _spmm_dispatch(graph, x, impl)
