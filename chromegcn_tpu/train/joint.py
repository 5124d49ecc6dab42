"""Joint CNN+GCN finetuning — end-to-end training of both stages.

The reference *names* this path (-optim2/-lr2 flags, "finetune" stage) but
never actually optimizes CNN parameters during GCN training — the GCN
consumes frozen saved features (reference: main.py:83 builds the optimizer
over ChromeModel params only; finetune.py:30-34 loads static features).
BASELINE config #4 asks for the real thing, implemented here:

- per optimizer step, one chromosome's windows run through the CNN in
  rematerialized chunks (``jax.checkpoint`` + ``lax.map`` — forward
  activations are recomputed in the backward pass, bounding memory to one
  chunk), producing the (N, d) feature matrix;
- the gated GCN refines the features over the Hi-C graph; the BCE loss
  backpropagates through both stages; both optimizers step.

Documented divergence: CNN BatchNorm runs with frozen running statistics
in joint mode (chunked whole-chromosome batches make per-step batch
statistics ill-defined); dropout stays active.
"""

from __future__ import annotations

import functools
from typing import Any, Tuple

import jax
import jax.numpy as jnp

from chromegcn_tpu.ops.sparse import SparseGraph
from chromegcn_tpu.train.finetune import ChromeTrainState
from chromegcn_tpu.train.loss import bce_with_logits
from chromegcn_tpu.train.pretrain import WindowTrainState


def _cnn_features(apply_fn, wparams, batch_stats, tokens, comp_map, keys,
                  chunk_size, graph, train):
    """Whole-chromosome CNN features in rematerialized chunks.

    When ``graph`` is a node-sharded parallel.graph.ShardedGraph, the
    chunk loop runs under shard_map over the graph mesh axis: each device
    maps over ITS OWN row range's chunks (node-partitioned CNN compute, the
    composition VERDICT r2 item 8 asked for), and the features come out
    sharded exactly as the sharded GCN stage consumes them. Plain lax.map
    otherwise. Gradients flow through either path (shard_map psums the
    replicated-param cotangents)."""

    def cnn_all(wparams, batch_stats, tokens, comp_map, keys):
        @jax.checkpoint
        def cnn_chunk(args):
            toks, key = args
            rngs = {"dropout": key} if train else None
            x_f, x_r, _ = apply_fn(
                {"params": wparams, "batch_stats": batch_stats},
                toks, comp_map, train=False,  # frozen BN stats (module doc)
                rngs=rngs,
            )
            return x_f, x_r

        n = tokens.shape[0]
        chunks = tokens.reshape(n // chunk_size, chunk_size, -1)
        x_f, x_r = jax.lax.map(cnn_chunk, (chunks, keys))
        return x_f.reshape(n, -1), x_r.reshape(n, -1)

    if type(graph).__name__ == "ShardedGraph":
        from jax.sharding import PartitionSpec as P

        ax = graph.axis
        fn = jax.shard_map(
            cnn_all,
            mesh=graph.mesh,
            in_specs=(P(), P(), P(ax, None), P(), P(ax, None)),
            out_specs=(P(ax, None), P(ax, None)),
            check_vma=False,
        )
        return fn(wparams, batch_stats, tokens, comp_map, keys)
    return cnn_all(wparams, batch_stats, tokens, comp_map, keys)


@functools.partial(jax.jit, static_argnames=("chunk_size",), donate_argnums=(0, 1))
def joint_train_step(
    wstate: WindowTrainState,
    cstate: ChromeTrainState,
    tokens: jax.Array,        # (N_pad, L) int32 window tokens for one chromosome
    comp_map: jax.Array,
    graph: SparseGraph,
    targets: jax.Array,       # (N_pad, n_targets)
    rng: jax.Array,
    chunk_size: int = 128,
) -> Tuple[WindowTrainState, ChromeTrainState, jax.Array]:
    """One chromosome, one joint optimizer step over both stages."""
    n = tokens.shape[0]
    assert n % chunk_size == 0, "pad node count to a multiple of chunk_size"
    rng_cnn, rng_f, rng_r = jax.random.split(rng, 3)

    def loss_fn(wparams, cparams):
        keys = jax.random.split(rng_cnn, n // chunk_size)
        x_f, x_r = _cnn_features(
            wstate.apply_fn, wparams, wstate.batch_stats, tokens, comp_map,
            keys, chunk_size, graph, train=True,
        )

        # linear head applied once to averaged features == averaged
        # strand logits (see train/finetune.chrome_train_step docstring)
        cvars = {"params": cparams, "batch_stats": cstate.batch_stats}
        (_, h_f, _), upd = cstate.apply_fn(
            cvars, x_f, graph, train=True, skip_head=True,
            mutable=["batch_stats"], rngs={"dropout": rng_f},
        )
        cvars = {"params": cparams, "batch_stats": upd["batch_stats"]}
        (_, h_r, _), upd = cstate.apply_fn(
            cvars, x_r, graph, train=True, skip_head=True,
            mutable=["batch_stats"], rngs={"dropout": rng_r},
        )
        h = (h_f + h_r) / 2.0
        pred = h @ cparams["out"]["kernel"] + cparams["out"]["bias"]
        loss = bce_with_logits(pred, targets, graph.node_mask)
        return loss, upd["batch_stats"]

    (loss, new_cstats), (wgrads, cgrads) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True
    )(wstate.params, cstate.params)
    wstate = wstate.apply_gradients(grads=wgrads)
    cstate = cstate.apply_gradients(grads=cgrads)
    cstate = cstate.replace(batch_stats=new_cstats)
    return wstate, cstate, loss


@functools.partial(jax.jit, static_argnames=("chunk_size",))
def joint_eval_step(
    wstate: WindowTrainState,
    cstate: ChromeTrainState,
    tokens: jax.Array,
    comp_map: jax.Array,
    graph: SparseGraph,
    targets: jax.Array,
    chunk_size: int = 128,
) -> Tuple[jax.Array, jax.Array]:
    """Eval-mode joint forward for one chromosome: (loss, probs)."""
    n = tokens.shape[0]
    keys = jax.random.split(jax.random.PRNGKey(0), n // chunk_size)  # unused (eval)
    x_f, x_r = _cnn_features(
        wstate.apply_fn, wstate.params, wstate.batch_stats, tokens, comp_map,
        keys, chunk_size, graph, train=False,
    )

    cvars = {"params": cstate.params, "batch_stats": cstate.batch_stats}
    _, h_f, _ = cstate.apply_fn(cvars, x_f, graph, train=False, skip_head=True)
    _, h_r, _ = cstate.apply_fn(cvars, x_r, graph, train=False, skip_head=True)
    h = (h_f + h_r) / 2.0
    p = cstate.params["out"]
    pred = h @ p["kernel"] + p["bias"]
    loss = bce_with_logits(pred, targets, graph.node_mask)
    return loss, jax.nn.sigmoid(pred)
