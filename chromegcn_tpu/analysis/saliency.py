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


def tf_knockout_matrix(
    chrome_model,
    variables,
    x_f: jax.Array,
    x_r: jax.Array,
    graph: SparseGraph,
    targets: np.ndarray,
    label_indices,
) -> np.ndarray:
    """TF–TF interaction matrix via in-silico contact knockouts
    (reference: scripts/visualize.py TF-TF section).

    For each label pair (i, j): zero every Hi-C edge whose SOURCE window is
    positive for both i and j (the reference masks those adjacency columns),
    re-row-normalize, re-run the GCN on both strands, and record the
    relative drop in label-i prediction over i-positive windows:
    ``diff[i, j] = (mean_i - mean_ij) / mean_i``.

    Returns an (L, L) matrix over ``label_indices`` order (0 where i == j
    or label j has no positive windows, as in the reference).
    """
    label_indices = list(label_indices)
    targets = np.asarray(targets)
    plain = graph.replace(bsr=None)
    model = chrome_model.clone(spmm_impl="xla")
    binary = (np.asarray(plain.vals) > 0).astype(np.float32)
    senders = np.asarray(plain.senders)

    from chromegcn_tpu.ops.sparse import row_normalize

    @jax.jit
    def predict(vals):
        g = row_normalize(plain.replace(vals=vals))
        _, logit_f, _ = model.apply(variables, x_f, g, train=False)
        _, logit_r, _ = model.apply(variables, x_r, g, train=False)
        return jax.nn.sigmoid((logit_f + logit_r) / 2.0)

    base_probs = np.asarray(predict(jnp.asarray(binary)))

    n = len(label_indices)
    out = np.zeros((n, n), np.float32)
    for a, y_i in enumerate(label_indices):
        i_pos = targets[:, y_i] > 0
        if not i_pos.any():
            continue
        base_i = float(base_probs[i_pos, y_i].mean())
        if base_i == 0.0:
            continue
        sender_i = i_pos[senders]
        for b, y_j in enumerate(label_indices):
            if y_i == y_j:
                continue
            j_pos = targets[:, y_j] > 0
            if not j_pos.any():
                continue
            keep = ~(sender_i & j_pos[senders])
            ko_probs = np.asarray(predict(jnp.asarray(binary * keep)))
            ko_i = float(ko_probs[i_pos, y_i].mean())
            out[a, b] = (base_i - ko_i) / base_i
    return out


def tsne_embeddings(embeddings: np.ndarray, **tsne_kwargs) -> np.ndarray:
    """2-D t-SNE of refined node embeddings (reference: scripts/visualize.py
    t-SNE section)."""
    from sklearn.manifold import TSNE

    kwargs = {"n_components": 2, "init": "pca", "random_state": 0}
    kwargs.update(tsne_kwargs)
    return TSNE(**kwargs).fit_transform(np.asarray(embeddings))
