"""Epoch driver: train -> valid -> test each epoch, metrics, best tracking,
checkpointing (reference: runner.py:10-63 + main.py:20-115 orchestration).

Three run modes, matching the reference CLI:
- pretrain:   train the window CNN on all splits' windows
- save_feats: eval-mode pass dumping per-chromosome features (1 epoch)
- finetune:   train the chromosome GCN on saved features + Hi-C graphs
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from chromegcn_tpu.config import Config
from chromegcn_tpu.data import artifact
from chromegcn_tpu.data.loader import (
    WindowDataset,
    load_chrom_features,
    save_chrom_features,
)
from chromegcn_tpu.models.chrome import make_chrome_model
from chromegcn_tpu.models.window import make_window_model
from chromegcn_tpu.ops.seq import complement_permutation
from chromegcn_tpu.ops.sparse import SparseGraph, build_chrom_graph
from chromegcn_tpu.train import checkpoint as ckpt
from chromegcn_tpu.train import finetune as ft
from chromegcn_tpu.train import pretrain as pt
from chromegcn_tpu.train.optim import make_optimizer, set_learning_rate, steplr_lr
from chromegcn_tpu.utils.evals import (
    BestTracker,
    EpochLogger,
    compute_metrics,
    selection_score,
)


def _metrics_for(preds, targs, loss, elapsed, cfg: Config, label_names):
    return compute_metrics(
        preds, targs, loss, elapsed,
        label_names=label_names, cell_type=cfg.cell_type,
        br_threshold=cfg.br_threshold,
    )


def run_pretrain(cfg: Config, splits: Dict[str, WindowDataset], verbose=print):
    """Pretrain (or feature-dump) the window CNN. Returns (state, tracker)."""
    train_ds, valid_ds, test_ds = splits["train"], splits["valid"], splits["test"]
    label_names = list(train_ds.tgt_vocab.keys())
    n_targets = train_ds.n_targets

    model = make_window_model(
        cfg.window_model, n_targets, seq_length=cfg.seq_length, d_model=cfg.d_model
    )
    tx = make_optimizer(cfg.optim, cfg.lr)
    rng = jax.random.PRNGKey(cfg.seed)
    rng, init_rng = jax.random.split(rng)
    state = pt.create_window_state(
        model, tx, init_rng, cfg.seq_length, train_ds.src_vocab, batch_size=2
    )
    comp_map = jnp.asarray(complement_permutation(train_ds.src_vocab))

    run_dir = cfg.stage1_run_dir
    os.makedirs(run_dir, exist_ok=True)

    if cfg.save_feats or cfg.load_pretrained:
        if ckpt.checkpoint_exists(run_dir):
            restored = ckpt.restore_checkpoint(
                run_dir,
                template={
                    "params": jax.device_get(state.params),
                    "batch_stats": jax.device_get(state.batch_stats),
                },
            )
            state = state.replace(
                params=restored["params"], batch_stats=restored["batch_stats"]
            )
            verbose(f"restored window checkpoint from {run_dir}")

    tracker = BestTracker()
    logger = EpochLogger(run_dir)
    score_history = []

    for epoch in range(1, cfg.epochs + 1):
        lr = steplr_lr(cfg.lr, epoch, cfg.lr_decay2 > 0, cfg.lr_step_size2)
        state = state.replace(opt_state=set_learning_rate(state.opt_state, lr))

        train_metrics = valid_metrics = None
        valid_loss, score = 0.0, 0.0
        valid_out = (None, None)
        if not cfg.test_only and not cfg.save_feats:
            rng, ep_rng = jax.random.split(rng)
            t0 = time.time()
            state, preds, targs, loss, _ = pt.run_window_epoch(
                state, train_ds, comp_map, cfg.batch_size, train=cfg.pretrain,
                rng=ep_rng, shuffle=cfg.shuffle_train,
            )
            train_metrics = _metrics_for(
                preds, targs, loss, (time.time() - t0) / 60, cfg, label_names
            )

            t0 = time.time()
            state, preds, targs, valid_loss, _ = pt.run_window_epoch(
                state, valid_ds, comp_map, cfg.test_batch_size, train=False
            )
            valid_metrics = _metrics_for(
                preds, targs, valid_loss, (time.time() - t0) / 60, cfg, label_names
            )
            valid_out = (preds, targs)
            score = selection_score(valid_metrics)
            score_history.append(score)

        t0 = time.time()
        state, test_preds, test_targs, test_loss, test_feats = pt.run_window_epoch(
            state, test_ds, comp_map, cfg.test_batch_size, train=False,
            collect_features=cfg.save_feats,
        )
        test_metrics = _metrics_for(
            test_preds, test_targs, test_loss, (time.time() - t0) / 60, cfg, label_names
        )

        tracker.evaluate(valid_metrics, test_metrics, epoch)
        logger.log("train", epoch, train_metrics["loss"] if train_metrics else 0, train_metrics)
        logger.log("valid", epoch, valid_loss, valid_metrics)
        logger.log("test", epoch, test_loss, test_metrics)

        if cfg.save_feats:
            # dump features for every split in eval mode
            for split_name, ds in (("train", train_ds), ("valid", valid_ds), ("test", test_ds)):
                if split_name == "test":
                    feats = test_feats
                else:
                    _, _, _, _, feats = pt.run_window_epoch(
                        state, ds, comp_map, cfg.test_batch_size, train=False,
                        collect_features=True,
                    )
                save_chrom_features(cfg.feature_path(split_name), feats)
                verbose(f"saved features: {cfg.feature_path(split_name)}")
        elif valid_metrics is not None:
            improved = logger.maybe_snapshot(
                epoch, valid_loss, score, *valid_out, test_preds, test_targs
            )
            if cfg.pretrain and (cfg.save_mode == "all" or score >= max(score_history)):
                ckpt.save_checkpoint(
                    run_dir,
                    {
                        "params": ckpt.tree_to_numpy(state.params),
                        "batch_stats": ckpt.tree_to_numpy(state.batch_stats),
                    },
                    epoch, cfg.save_mode, score,
                )
        verbose(
            f"epoch {epoch}: test meanAUC={test_metrics['meanAUC']:.4f} "
            f"meanAUPR={test_metrics['meanAUPR']:.4f} loss={test_loss:.3f}"
        )

    return state, tracker


def build_split_graphs(
    cfg: Config,
    features: Dict[str, "ft.ChromFeatures"],
    split: str,
    edge_capacity: Optional[int] = None,
) -> Dict[str, SparseGraph]:
    """Build per-chromosome SparseGraphs for one split, loading Hi-C edge
    artifacts when the adjacency flavor needs them
    (reference: finetune.py:20-23 reloads the pkl every epoch; graphs are
    static so we build once)."""
    hic_edges = None
    if cfg.adj_type in ("hic", "both"):
        hic_edges = artifact.load_graph_edges(cfg.graph_path(split))
    use_bsr = cfg.spmm_impl == "pallas" or (
        cfg.spmm_impl == "auto" and jax.default_backend() == "tpu"
    )
    graphs = {}
    for chrom, cf in features.items():
        n_valid = cf.forward.shape[0]
        n_pad = ft.bucket_nodes(n_valid)
        g = build_chrom_graph(
            cfg.adj_type,
            n_valid=n_valid,
            n_pad=n_pad,
            edge_capacity=edge_capacity,
            hic_edges=None if hic_edges is None else hic_edges[chrom],
        )
        if use_bsr:
            from chromegcn_tpu.ops.spmm_pallas import attach_bsr

            g = attach_bsr(g)
        graphs[chrom] = g
    return graphs


def run_finetune(cfg: Config, verbose=print):
    """Train the chromosome model on saved CNN features. Returns (state, tracker)."""
    features = {
        split: load_chrom_features(cfg.feature_path(split))
        for split in ("train", "valid", "test")
    }
    n_targets = next(iter(features["train"].values())).target.shape[1]
    label_names = [f"label{i}" for i in range(n_targets)]

    graphs = {
        split: build_split_graphs(cfg, features[split], split)
        for split in ("train", "valid", "test")
    }

    model = make_chrome_model(
        cfg.chrome_model, nclass=n_targets, dropout=cfg.gcn_dropout,
        gate=cfg.gate, layers=cfg.gcn_layers, nfeat=cfg.d_model,
        spmm_impl=cfg.spmm_impl,
    )
    optim_name, lr = cfg.gcn_optim_and_lr()
    tx = make_optimizer(optim_name, lr)
    rng = jax.random.PRNGKey(cfg.seed)
    rng, init_rng = jax.random.split(rng)
    state = ft.create_chrome_state(model, tx, init_rng, nfeat=cfg.d_model)

    run_dir = cfg.run_dir
    os.makedirs(run_dir, exist_ok=True)

    if cfg.load_gcn and ckpt.checkpoint_exists(run_dir):
        restored = ckpt.restore_checkpoint(
            run_dir,
            template={
                "params": jax.device_get(state.params),
                "batch_stats": jax.device_get(state.batch_stats),
            },
        )
        state = state.replace(
            params=restored["params"], batch_stats=restored["batch_stats"]
        )
        verbose("restored GCN checkpoint")
    elif ckpt.checkpoint_exists(cfg.stage1_run_dir):
        # warm-start head from the CNN checkpoint (reference: main.py:72-81)
        cnn = ckpt.restore_checkpoint(cfg.stage1_run_dir)
        params, stats = ft.warm_start_head_from_window(
            state.params, state.batch_stats, cnn["params"], cnn["batch_stats"]
        )
        state = state.replace(params=params, batch_stats=stats)
        verbose("warm-started GCN head from CNN checkpoint")

    tracker = BestTracker()
    logger = EpochLogger(run_dir)
    score_history = []

    for epoch in range(1, cfg.epochs + 1):
        lr_e = steplr_lr(lr, epoch, cfg.lr_decay2 > 0, cfg.lr_step_size2)
        state = state.replace(opt_state=set_learning_rate(state.opt_state, lr_e))

        train_metrics = valid_metrics = None
        valid_loss, score = 0.0, 0.0
        valid_out = (None, None)
        if not cfg.load_gcn and not cfg.test_only:
            rng, ep_rng = jax.random.split(rng)
            t0 = time.time()
            state, preds, targs, loss = ft.run_chrome_epoch(
                state, features["train"], graphs["train"], train=True, rng=ep_rng
            )
            train_metrics = _metrics_for(
                preds, targs, loss, (time.time() - t0) / 60, cfg, label_names
            )
            t0 = time.time()
            state, preds, targs, valid_loss = ft.run_chrome_epoch(
                state, features["valid"], graphs["valid"], train=False
            )
            valid_metrics = _metrics_for(
                preds, targs, valid_loss, (time.time() - t0) / 60, cfg, label_names
            )
            valid_out = (preds, targs)
            score = selection_score(valid_metrics)
            score_history.append(score)

        t0 = time.time()
        state, test_preds, test_targs, test_loss = ft.run_chrome_epoch(
            state, features["test"], graphs["test"], train=False
        )
        test_metrics = _metrics_for(
            test_preds, test_targs, test_loss, (time.time() - t0) / 60, cfg, label_names
        )

        tracker.evaluate(valid_metrics, test_metrics, epoch)
        logger.log("train", epoch, train_metrics["loss"] if train_metrics else 0, train_metrics)
        logger.log("valid", epoch, valid_loss, valid_metrics)
        logger.log("test", epoch, test_loss, test_metrics)
        if valid_metrics is not None:
            logger.maybe_snapshot(
                epoch, valid_loss, score, *valid_out, test_preds, test_targs
            )
            if cfg.save_mode == "all" or score >= max(score_history):
                ckpt.save_checkpoint(
                    run_dir,
                    {
                        "params": ckpt.tree_to_numpy(state.params),
                        "batch_stats": ckpt.tree_to_numpy(state.batch_stats),
                    },
                    epoch, cfg.save_mode, score,
                )
        verbose(
            f"epoch {epoch}: test meanAUC={test_metrics['meanAUC']:.4f} "
            f"meanAUPR={test_metrics['meanAUPR']:.4f} loss={test_loss:.3f}"
        )

    return state, tracker


def run(cfg: Config, splits: Optional[Dict[str, WindowDataset]] = None, verbose=print):
    """Top-level dispatch (reference: main.py:20-115 + runner.py:25-63)."""
    if cfg.pretrain or cfg.save_feats:
        if splits is None:
            splits = artifact.load_dataset(cfg.data_path)
        return run_pretrain(cfg, splits, verbose=verbose)
    return run_finetune(cfg, verbose=verbose)
