"""Model interpretation: adjacency saliency, gate inspection, embeddings.

Replaces reference scripts/visualize.py (REPL-paste file) with importable
functions:
- adjacency saliency — gradient of a label's prediction w.r.t. the Hi-C
  edge weights (the reference reads ``adj.grad``; here the edge-value
  gradient is an explicit jax.grad through the COO SpMM)
- gate values — the per-node gates g1/g2 of the gated GCN
  (reference: models/ChromeModels.py:38-45 returns them)
- GCN embedding extraction for t-SNE (reference: scripts/visualize.py)
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from chromegcn_tpu.ops.sparse import SparseGraph
from chromegcn_tpu.ops.spmm import spmm_xla


def adjacency_saliency(
    chrome_model,
    variables,
    x: jax.Array,
    graph: SparseGraph,
    target_label: Optional[int] = None,
) -> np.ndarray:
    """d(sum of predictions) / d(edge values) — per-edge saliency.

    Runs the model with the differentiable COO SpMM (impl='xla') so edge
    values are first-class differentiable inputs.

    Returns an (E_pad,) array aligned with graph.senders/receivers.
    """
    plain = graph.replace(bsr=None)

    def score(vals):
        g = plain.replace(vals=vals)
        # force the XLA COO path: it differentiates w.r.t. vals
        _, logits, _ = chrome_model.clone(spmm_impl="xla").apply(
            variables, x, g, train=False
        )
        if target_label is None:
            return jnp.sum(logits)
        return jnp.sum(logits[:, target_label])

    return np.asarray(jax.grad(score)(plain.vals))


def gate_values(
    chrome_model, variables, x: jax.Array, graph: SparseGraph
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Per-node gate activations (g1, g2) of the gated GCN."""
    _, _, (g1, g2) = chrome_model.apply(variables, x, graph, train=False)
    return np.asarray(g1), None if g2 is None else np.asarray(g2)


def refined_embeddings(
    chrome_model, variables, x: jax.Array, graph: SparseGraph
) -> np.ndarray:
    """Post-GCN node embeddings (pre-head), e.g. for t-SNE."""
    x_out, _, _ = chrome_model.apply(variables, x, graph, train=False)
    return np.asarray(x_out)


def feature_saliency(
    chrome_model, variables, x: jax.Array, graph: SparseGraph,
    target_label: int,
) -> np.ndarray:
    """d(prediction[label]) / d(input features) — the reference enables this
    via x_f.requires_grad=True (reference: finetune.py:33-34)."""

    def score(x):
        _, logits, _ = chrome_model.apply(variables, x, graph, train=False)
        return jnp.sum(logits[:, target_label])

    return np.asarray(jax.grad(score)(x))


def tsne_embeddings(embeddings: np.ndarray, **tsne_kwargs) -> np.ndarray:
    """2-D t-SNE of refined node embeddings (reference: scripts/visualize.py
    t-SNE section)."""
    from sklearn.manifold import TSNE

    kwargs = {"n_components": 2, "init": "pca", "random_state": 0}
    kwargs.update(tsne_kwargs)
    return TSNE(**kwargs).fit_transform(np.asarray(embeddings))
