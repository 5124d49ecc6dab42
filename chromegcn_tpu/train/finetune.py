"""Chromosome-model (GCN) training stage.

Whole-chromosome forward/backward per optimizer step — the batch *is* a
chromosome (reference: finetune.py:29-49). Node counts are padded to shape
buckets so the 22 chromosomes compile to a handful of XLA programs instead
of 22.

Strand handling mirrors the reference: two sequential passes (forward and
reverse features) sharing weights, logits averaged, one loss/step per
chromosome (reference: finetune.py:41-49).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax.training import train_state

from chromegcn_tpu.data.loader import ChromFeatures
from chromegcn_tpu.ops.sparse import SparseGraph
from chromegcn_tpu.train.loss import bce_with_logits


class ChromeTrainState(train_state.TrainState):
    batch_stats: Any = None


def create_chrome_state(
    chrome_model, tx, rng: jax.Array, nfeat: int = 128, n_nodes: int = 256
) -> ChromeTrainState:
    from chromegcn_tpu.ops.sparse import build_chrom_graph
    from chromegcn_tpu.ops.spmm_pallas import attach_bsr

    dummy_x = jnp.zeros((n_nodes, nfeat), jnp.float32)
    dummy_g = build_chrom_graph("none", n_valid=n_nodes, n_pad=n_nodes)
    if n_nodes % 128 == 0:
        dummy_g = attach_bsr(dummy_g)  # so init works for any spmm_impl
    variables = chrome_model.init(rng, dummy_x, dummy_g, train=False)
    return ChromeTrainState.create(
        apply_fn=chrome_model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=tx,
    )


def warm_start_head_from_window(
    chrome_params, chrome_stats, window_params, window_stats
) -> Tuple[Any, Any]:
    """Initialize the GCN output head + BatchNorm from the trained CNN
    (reference contract: main.py:78-81 copies classifier weight/bias and
    batch_norm weight/bias; we also copy the running stats, which the
    reference leaves at the CNN's via state_dict — same effect)."""
    chrome_params = jax.device_get(chrome_params)
    chrome_stats = jax.device_get(chrome_stats)
    window_params = jax.device_get(window_params)
    window_stats = jax.device_get(window_stats)
    inner = window_params["model"] if "model" in window_params else window_params
    inner_stats = window_stats.get("model", window_stats)
    chrome_params["out"]["kernel"] = np.asarray(inner["classifier"]["kernel"])
    chrome_params["out"]["bias"] = np.asarray(inner["classifier"]["bias"])
    chrome_params["batch_norm"]["scale"] = np.asarray(inner["head_bn"]["scale"])
    chrome_params["batch_norm"]["bias"] = np.asarray(inner["head_bn"]["bias"])
    chrome_stats["batch_norm"]["mean"] = np.asarray(inner_stats["head_bn"]["mean"])
    chrome_stats["batch_norm"]["var"] = np.asarray(inner_stats["head_bn"]["var"])
    return (
        jax.tree_util.tree_map(jnp.asarray, chrome_params),
        jax.tree_util.tree_map(jnp.asarray, chrome_stats),
    )


@functools.partial(jax.jit, donate_argnums=(0,))
def chrome_train_step(
    state: ChromeTrainState,
    x_f: jax.Array,
    x_r: jax.Array,
    graph: SparseGraph,
    targets: jax.Array,
    rng: jax.Array,
) -> Tuple[ChromeTrainState, jax.Array, jax.Array]:
    """One chromosome, one optimizer step; returns (state, loss, probs).

    Strands run as two sequential weight-sharing passes with logits averaged
    (reference: finetune.py:41-45; BatchNorm statistics update per pass as
    in torch). A strand-stacked (N, 2, d) single-pass variant exists in the
    model (models/chrome.py) — measured neutral-to-slower on the Pallas
    kernel at d=128, so the steps keep the parity-exact sequential form.

    The final Dense head is linear, so averaging the two strands' LOGITS
    (the reference's contract) equals applying the head ONCE to the
    averaged post-dropout features: the steps run the model with
    ``skip_head=True`` per strand and apply the head once — exact to fp
    associativity (pinned in tests/test_chrome_models.py), and it halves
    the (N, d) x (d, nclass) head GEMMs in forward AND backward (the
    largest XLA-side GEMMs of the step at nclass=919)."""
    rng_f, rng_r = jax.random.split(rng)

    def loss_fn(params):
        variables = {"params": params, "batch_stats": state.batch_stats}
        (_, h_f, _), upd = state.apply_fn(
            variables, x_f, graph, train=True, skip_head=True,
            mutable=["batch_stats"], rngs={"dropout": rng_f},
        )
        variables = {"params": params, "batch_stats": upd["batch_stats"]}
        (_, h_r, _), upd = state.apply_fn(
            variables, x_r, graph, train=True, skip_head=True,
            mutable=["batch_stats"], rngs={"dropout": rng_r},
        )
        h = (h_f + h_r) / 2.0
        pred = h @ params["out"]["kernel"] + params["out"]["bias"]
        loss = bce_with_logits(pred, targets, graph.node_mask)
        return loss, (pred, upd["batch_stats"])

    (loss, (pred, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    state = state.apply_gradients(grads=grads)
    state = state.replace(batch_stats=new_stats)
    return state, loss, jax.nn.sigmoid(pred)


@jax.jit
def chrome_eval_step(
    state: ChromeTrainState,
    x_f: jax.Array,
    x_r: jax.Array,
    graph: SparseGraph,
    targets: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    # head applied once to averaged features == averaged logits (linear
    # head; see chrome_train_step docstring)
    _, h_f, _ = state.apply_fn(variables, x_f, graph, train=False, skip_head=True)
    _, h_r, _ = state.apply_fn(variables, x_r, graph, train=False, skip_head=True)
    h = (h_f + h_r) / 2.0
    pred = h @ state.params["out"]["kernel"] + state.params["out"]["bias"]
    loss = bce_with_logits(pred, targets, graph.node_mask)
    return loss, jax.nn.sigmoid(pred)


def bucket_nodes(n: int, bucket: int = 2048) -> int:
    """Round node count up to a bucket boundary to bound recompilation."""
    return int(-(-n // bucket) * bucket)


def pad_rows(arr: np.ndarray, n_pad: int) -> np.ndarray:
    if arr.shape[0] == n_pad:
        return arr
    out = np.zeros((n_pad,) + arr.shape[1:], arr.dtype)
    out[: arr.shape[0]] = arr
    return out


def run_chrome_epoch(
    state: ChromeTrainState,
    features: Dict[str, ChromFeatures],
    graphs: Dict[str, SparseGraph],
    train: bool,
    rng: Optional[jax.Array] = None,
    place=None,
) -> Tuple[ChromeTrainState, np.ndarray, np.ndarray, float]:
    """One epoch = one pass over all chromosomes of a split
    (reference: finetune.py:29-55). Returns dataset-order preds/targets.

    ``place`` (optional) device-puts each (N, ...) array — the multi-device
    path passes a node-sharding placement so chromosome features land
    pre-sharded over the graph mesh axis."""
    if place is None:
        place = jnp.asarray
    preds_parts, targ_parts, losses = [], [], []
    valid_counts = []
    for chrom, cf in features.items():
        graph = graphs[chrom]
        n_pad = graph.n_nodes
        x_f = place(pad_rows(cf.forward, n_pad))
        x_r = place(pad_rows(cf.backward, n_pad))
        targets = place(pad_rows(cf.target, n_pad))
        if train:
            rng, step_rng = jax.random.split(rng)
            state, loss, probs = chrome_train_step(
                state, x_f, x_r, graph, targets, step_rng
            )
        else:
            loss, probs = chrome_eval_step(state, x_f, x_r, graph, targets)
        # keep device arrays; a single device_get after the loop lets the
        # per-chromosome dispatches pipeline instead of syncing every step
        preds_parts.append(probs)
        targ_parts.append(cf.target[: cf.forward.shape[0]])
        valid_counts.append(cf.forward.shape[0])
        losses.append(loss)
    preds_parts, losses = jax.device_get((preds_parts, losses))
    preds = np.concatenate(
        [p[:n] for p, n in zip(preds_parts, valid_counts)], axis=0
    )
    return (
        state,
        preds,
        np.concatenate(targ_parts, axis=0),
        float(np.sum(losses)),
    )
