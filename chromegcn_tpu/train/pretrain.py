"""Window-model (CNN) pretraining stage.

Jitted, donated train/eval steps over fixed-shape batches, with host-side
accumulation of sigmoid predictions for the sklearn metric pass — the same
split of labor as the reference (reference: pretrain.py:8-67) but with the
whole forward/backward/update compiled as one XLA program.

The feature-dump path (``-save_feats``) groups the 128-d pre-ReLU features
by chromosome and writes the CNN->GCN handoff artifact
(reference: pretrain.py:57-60 + utils/util_methods.py:183-199).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax.training import train_state

from chromegcn_tpu.data.loader import (
    Batch,
    ChromFeatures,
    WindowDataset,
    iterate_batches,
)
from chromegcn_tpu.models.strand import NonStrandSpecific
from chromegcn_tpu.ops.seq import complement_permutation
from chromegcn_tpu.train.loss import bce_with_logits


class WindowTrainState(train_state.TrainState):
    batch_stats: Any = None


def create_window_state(
    window_model,
    tx,
    rng: jax.Array,
    seq_length: int,
    src_vocab: Dict[str, int],
    batch_size: int = 2,
) -> WindowTrainState:
    """Initialize the strand-averaged window model's train state."""
    wrapper = NonStrandSpecific(model=window_model)
    comp_map = jnp.asarray(complement_permutation(src_vocab))
    dummy = jnp.zeros((batch_size, seq_length), jnp.int32)
    variables = wrapper.init(rng, dummy, comp_map, train=False)
    return WindowTrainState.create(
        apply_fn=wrapper.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=tx,
    )


@functools.partial(jax.jit, donate_argnums=(0,))
def window_train_step(
    state: WindowTrainState,
    tokens: jax.Array,
    targets: jax.Array,
    row_mask: jax.Array,
    comp_map: jax.Array,
    rng: jax.Array,
) -> Tuple[WindowTrainState, jax.Array, jax.Array]:
    """One optimizer step; returns (new_state, loss, sigmoid probs)."""

    def loss_fn(params):
        (x_f, x_r, logits), updates = state.apply_fn(
            {"params": params, "batch_stats": state.batch_stats},
            tokens,
            comp_map,
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": rng},
        )
        loss = bce_with_logits(logits, targets, row_mask)
        return loss, (logits, updates["batch_stats"])

    (loss, (logits, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    state = state.apply_gradients(grads=grads)
    state = state.replace(batch_stats=new_stats)
    return state, loss, jax.nn.sigmoid(logits)


@jax.jit
def window_eval_step(
    state: WindowTrainState,
    tokens: jax.Array,
    targets: jax.Array,
    row_mask: jax.Array,
    comp_map: jax.Array,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Eval-mode forward; returns (loss, probs, x_fwd, x_rev)."""
    x_f, x_r, logits = state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        tokens,
        comp_map,
        train=False,
    )
    loss = bce_with_logits(logits, targets, row_mask)
    return loss, jax.nn.sigmoid(logits), x_f, x_r


def run_window_epoch(
    state: WindowTrainState,
    dataset: WindowDataset,
    comp_map: jax.Array,
    batch_size: int,
    train: bool,
    rng: Optional[jax.Array] = None,
    shuffle: Optional[bool] = None,
    collect_features: bool = False,
    shard_batch=None,
) -> Tuple[WindowTrainState, np.ndarray, np.ndarray, float, Optional[Dict[str, ChromFeatures]]]:
    """One epoch over a split.

    Returns (state, all_preds, all_targets, total_loss, features_by_chrom).
    total_loss sums per-batch mean losses (reference: pretrain.py:51).
    """
    n = len(dataset)
    all_preds = np.zeros((n, dataset.n_targets), np.float32)
    all_targs = np.zeros((n, dataset.n_targets), np.float32)
    feats_f = np.zeros((n, 0), np.float32) if collect_features else None
    feats_r = None
    total_loss = 0.0
    if shuffle is None:
        shuffle = train
    np_rng = np.random.default_rng(
        int(jax.random.randint(rng, (), 0, 2**31 - 1)) if rng is not None else 0
    )

    placed = shard_batch or (lambda x: x)
    # defer device->host syncs: drain pending step outputs in windows so
    # dispatches pipeline instead of blocking per batch (the per-batch
    # float(loss) sync costs a full round-trip per step on remote backends)
    DRAIN_EVERY = 32
    pending = []

    def drain():
        nonlocal total_loss
        if not pending:
            return
        got = jax.device_get([p[:2] for p in pending])
        for (loss_np, probs_np), (_, _, b) in zip(got, pending):
            total_loss += float(loss_np)
            valid = b.row_mask
            all_preds[b.indices[valid]] = probs_np[valid]
            all_targs[b.indices[valid]] = b.targets[valid]
        pending.clear()

    for batch in iterate_batches(dataset, batch_size, shuffle=shuffle, rng=np_rng):
        tokens = placed(jnp.asarray(batch.tokens))
        targets = placed(jnp.asarray(batch.targets))
        row_mask = placed(jnp.asarray(batch.row_mask))
        if train:
            rng, step_rng = jax.random.split(rng)
            state, loss, probs = window_train_step(
                state, tokens, targets, row_mask, comp_map, step_rng
            )
        else:
            loss, probs, x_f, x_r = window_eval_step(
                state, tokens, targets, row_mask, comp_map
            )
            if collect_features:
                xf = np.asarray(x_f)
                if feats_f is None or feats_f.shape[1] != xf.shape[1]:
                    feats_f = np.zeros((n, xf.shape[1]), np.float32)
                    feats_r = np.zeros((n, xf.shape[1]), np.float32)
                valid = batch.row_mask
                feats_f[batch.indices[valid]] = xf[valid]
                feats_r[batch.indices[valid]] = np.asarray(x_r)[valid]
        pending.append((loss, probs, batch))
        if len(pending) >= DRAIN_EVERY:
            drain()
    drain()

    features = None
    if collect_features:
        features = group_features_by_chrom(dataset, feats_f, feats_r)
    return state, all_preds, all_targs, total_loss, features


def group_features_by_chrom(
    dataset: WindowDataset, feats_f: np.ndarray, feats_r: np.ndarray
) -> Dict[str, ChromFeatures]:
    """Group rows by chromosome preserving dataset order
    (reference: utils/util_methods.py:183-199)."""
    out: Dict[str, ChromFeatures] = {}
    for chrom in dataset.chrom_order():
        idx = np.nonzero(dataset.chroms == chrom)[0]
        out[chrom] = ChromFeatures(
            forward=feats_f[idx],
            backward=feats_r[idx],
            target=dataset.targets[idx].astype(np.float32),
            starts=dataset.starts[idx],
        )
    return out
