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


class NonFiniteLossError(RuntimeError):
    """Raised when a split's loss goes NaN/Inf — failure detection the
    reference lacks (SURVEY §5: its only failure path is KeyboardInterrupt)."""


def _check_finite(loss: float, where: str) -> float:
    if not np.isfinite(loss):
        raise NonFiniteLossError(f"non-finite loss ({loss}) during {where}")
    return loss


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

    shard = None
    if cfg.dp_devices > 1 and cfg.tp_devices > 1:
        # 2D DP x TP mesh: batches over 'data', the big feature kernel
        # (101,760 x d_model at seq 2000) over 'model' (SURVEY §2.6 TP slot)
        from chromegcn_tpu.parallel.mesh import make_mesh_2d
        from chromegcn_tpu.parallel.tp import place_window_state, tp_batch_sharding

        if cfg.batch_size % cfg.dp_devices != 0:
            raise ValueError(
                f"batch_size={cfg.batch_size} must divide dp_devices={cfg.dp_devices}"
            )
        mesh = make_mesh_2d(cfg.dp_devices, cfg.tp_devices)
        state = place_window_state(state, mesh)
        sharding = tp_batch_sharding(mesh)
        from chromegcn_tpu.parallel.multihost import put_global

        shard = lambda x: put_global(x, sharding)
        verbose(
            f"2D mesh pretrain: dp={cfg.dp_devices} x tp={cfg.tp_devices}"
        )
    elif cfg.tp_devices > 1:
        from chromegcn_tpu.parallel.mesh import make_mesh
        from chromegcn_tpu.parallel.tp import place_window_state

        mesh = make_mesh(cfg.tp_devices, axis="model")
        state = place_window_state(state, mesh)
        verbose(f"tensor-parallel pretrain over {cfg.tp_devices} devices")
    elif cfg.dp_devices > 1:
        # batch-axis data parallelism over a named mesh: XLA shards the
        # conv stack over devices and psums gradients over ICI (the
        # TPU-native replacement for nn.DataParallel — reference: main.py:92-94)
        from chromegcn_tpu.parallel.mesh import make_mesh, shard_batch

        if cfg.batch_size % cfg.dp_devices != 0:
            raise ValueError(
                f"batch_size={cfg.batch_size} must divide dp_devices={cfg.dp_devices}"
            )
        mesh = make_mesh(cfg.dp_devices, axis="data")
        shard = shard_batch(mesh)
        verbose(f"data-parallel pretrain over {cfg.dp_devices} devices")

    run_dir = cfg.stage1_run_dir
    os.makedirs(run_dir, exist_ok=True)

    if cfg.save_feats or cfg.load_pretrained:
        if not ckpt.checkpoint_exists(run_dir):
            # fail loudly: dumping features from random weights silently
            # poisons the CNN->GCN handoff. The reference fails here too —
            # its torch.load of model.chkpt raises (reference: main.py:72-77).
            raise FileNotFoundError(
                f"{'save_feats' if cfg.save_feats else 'load_pretrained'} "
                f"requires a trained window checkpoint, but none exists at "
                f"{run_dir!r} — run the pretrain stage first"
            )
        restored = ckpt.restore_checkpoint(run_dir)
        state = state.replace(
            params=jax.tree_util.tree_map(jnp.asarray, restored["params"]),
            batch_stats=jax.tree_util.tree_map(
                jnp.asarray, restored["batch_stats"]
            ),
        )
        verbose(f"restored window checkpoint from {run_dir}")

    tracker = BestTracker()
    score_history = []

    start_epoch = 1
    if cfg.resume and cfg.pretrain and ckpt.checkpoint_exists(run_dir):
        restored = ckpt.restore_checkpoint(
            run_dir,
            template={
                "params": jax.device_get(state.params),
                "batch_stats": jax.device_get(state.batch_stats),
                "opt_state": jax.device_get(state.opt_state),
            },
        )
        state = state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
        )
        start_epoch = int(restored["epoch"]) + 1
        verbose(f"resumed pretraining at epoch {start_epoch}")
    # append (don't truncate) when resuming AND in save_feats mode — the
    # feature dump shares stage 1's run_dir, and truncating there wipes the
    # pretrain epoch history (caught by the round-4 ingest E2E)
    logger = EpochLogger(run_dir, append=start_epoch > 1 or cfg.save_feats)
    if start_epoch > 1 and logger.best_valid_metric > 0:
        # seed the checkpoint-save gate with the pre-resume best score so a
        # resumed first epoch can't overwrite the best checkpoint with a
        # worse one (ADVICE r4; the logger restored its best from best.json)
        score_history.append(logger.best_valid_metric)
    since_improve = 0

    for epoch in range(start_epoch, cfg.epochs + 1):
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
                rng=ep_rng, shuffle=cfg.shuffle_train, shard_batch=shard,
            )
            _check_finite(loss, f"pretrain epoch {epoch}")
            train_metrics = _metrics_for(
                preds, targs, loss, (time.time() - t0) / 60, cfg, label_names
            )

            t0 = time.time()
            state, preds, targs, valid_loss, _ = pt.run_window_epoch(
                state, valid_ds, comp_map, cfg.test_batch_size, train=False,
                shard_batch=shard,
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
            collect_features=cfg.save_feats, shard_batch=shard,
        )
        test_metrics = _metrics_for(
            test_preds, test_targs, test_loss, (time.time() - t0) / 60, cfg, label_names
        )

        tracker.evaluate(valid_metrics, test_metrics, epoch)
        if not cfg.save_feats:
            # the save_feats pass exists only to dump features; logging its
            # eval rows would append a duplicate 'epoch 1' line after the
            # preserved pretrain history in the shared stage-1 CSVs
            # (ADVICE r4)
            logger.log("train", epoch, train_metrics["loss"] if train_metrics else 0, train_metrics)
            logger.log("valid", epoch, valid_loss, valid_metrics)
            logger.log("test", epoch, test_loss, test_metrics)

        if cfg.save_feats:
            # dump features for every split in eval mode
            for split_name, ds in (("train", train_ds), ("valid", valid_ds), ("test", test_ds)):
                if split_name == "test":
                    feats = test_feats
                else:
                    # shard_batch must follow the DP placement here too —
                    # without it a pod run would dump train/valid features
                    # from unsharded (host-misplaced) batches (round-4 fix;
                    # the test pass at the epoch top already sharded)
                    _, _, _, _, feats = pt.run_window_epoch(
                        state, ds, comp_map, cfg.test_batch_size, train=False,
                        collect_features=True, shard_batch=shard,
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
                        "opt_state": ckpt.tree_to_numpy(state.opt_state),
                    },
                    epoch, cfg.save_mode, score,
                )
        verbose(
            f"epoch {epoch}: test meanAUC={test_metrics['meanAUC']:.4f} "
            f"meanAUPR={test_metrics['meanAUPR']:.4f} loss={test_loss:.3f}"
        )
        if cfg.early_stop_patience > 0 and valid_metrics is not None:
            # plateau detection on the valid selection score (meanAUPR-
            # dominated, utils/evals.selection_score): stop when no STRICT
            # improvement for `patience` epochs (ties are a plateau; score
            # itself is already the last element of score_history)
            prior_best = max(score_history[:-1], default=float("-inf"))
            since_improve = 0 if score > prior_best else since_improve + 1
            if since_improve >= cfg.early_stop_patience:
                verbose(
                    f"early stop at epoch {epoch}: no valid-score "
                    f"improvement in {since_improve} epochs"
                )
                break

    return state, tracker


def _use_bsr(cfg: Config) -> bool:
    """Whether the Pallas block-sparse SpMM path is in play for this run."""
    return cfg.spmm_impl == "pallas" or (
        cfg.spmm_impl == "auto" and jax.default_backend() == "tpu"
    )


def build_split_graphs(
    cfg: Config,
    features: Dict[str, "ft.ChromFeatures"],
    split: str,
    edge_capacity: Optional[int] = None,
    n_shards: int = 1,
) -> Dict[str, SparseGraph]:
    """Build per-chromosome SparseGraphs for one split, loading Hi-C edge
    artifacts when the adjacency flavor needs them
    (reference: finetune.py:20-23 reloads the pkl every epoch; graphs are
    static so we build once).

    n_shards > 1 sizes the node-padding bucket so every shard's row range
    is a multiple of the kernel tile height (128), and skips the
    single-device BSR attach — the per-shard block-sparse forms are built
    in halo coordinates by parallel.graph.shard_graph instead."""
    hic_edges = None
    if cfg.adj_type in ("hic", "both"):
        hic_edges = artifact.load_graph_edges(cfg.graph_path(split))
    use_bsr = _use_bsr(cfg)
    bucket = 2048 if n_shards <= 1 else int(np.lcm(2048, 128 * n_shards))
    graphs = {}
    for chrom, cf in features.items():
        n_valid = cf.forward.shape[0]
        n_pad = ft.bucket_nodes(n_valid, bucket=bucket)
        g = build_chrom_graph(
            cfg.adj_type,
            n_valid=n_valid,
            n_pad=n_pad,
            edge_capacity=edge_capacity,
            hic_edges=None if hic_edges is None else hic_edges[chrom],
        )
        if use_bsr and n_shards <= 1:
            from chromegcn_tpu.ops.spmm_hybrid import attach_auto

            g = attach_auto(g, dtype=cfg.spmm_dtype, strategy=cfg.spmm_form)
        graphs[chrom] = g
    return graphs


def shard_split_graphs(cfg: Config, graphs, mesh, verbose=print):
    """Partition every chromosome graph over the mesh's 'graph' axis and
    return (sharded graphs, feature placement fn).

    This is the trainer-integrated multi-device GCN path (the reference
    wires its one parallelism into the real loop the same way —
    reference: main.py:92-94): ``-graph_devices N`` node-partitions each
    chromosome, the halo all_to_all exchanges boundary features over ICI,
    and per-shard compute runs the Pallas BSR kernel ('halo_bsr') or
    gather+segment-sum ('halo')."""
    from chromegcn_tpu.parallel.graph import shard_graph
    from chromegcn_tpu.parallel.mesh import node_sharding

    strategy = cfg.graph_strategy
    if strategy == "auto":
        strategy = "halo_bsr" if _use_bsr(cfg) else "halo"
    sharded = {
        split: {
            chrom: shard_graph(
                g, mesh, strategy=strategy, spmm_dtype=cfg.spmm_dtype
            )
            for chrom, g in per.items()
        }
        for split, per in graphs.items()
    }
    sharding = node_sharding(mesh)
    from chromegcn_tpu.parallel.multihost import put_global

    def place(arr):
        # multi-process aware: each host supplies only its own node rows
        # (parallel.multihost; a no-op device_put single-process)
        return put_global(arr, sharding)

    verbose(
        f"node-sharded GCN over {mesh.shape['graph']} devices "
        f"(strategy={strategy})"
    )
    return sharded, place


def run_finetune(cfg: Config, verbose=print):
    """Train the chromosome model on saved CNN features. Returns (state, tracker)."""
    features = {
        split: load_chrom_features(cfg.feature_path(split))
        for split in ("train", "valid", "test")
    }
    n_targets = next(iter(features["train"].values())).target.shape[1]
    label_names = [f"label{i}" for i in range(n_targets)]

    graphs = {
        split: build_split_graphs(
            cfg, features[split], split, n_shards=cfg.graph_devices
        )
        for split in ("train", "valid", "test")
    }
    place = None
    if cfg.graph_devices > 1:
        from chromegcn_tpu.parallel.mesh import make_mesh

        mesh_g = make_mesh(cfg.graph_devices, axis="graph")
        graphs, place = shard_split_graphs(cfg, graphs, mesh_g, verbose=verbose)

    model = make_chrome_model(
        cfg.chrome_model, nclass=n_targets, dropout=cfg.gcn_dropout,
        gate=cfg.gate, layers=cfg.gcn_layers, nfeat=cfg.d_model,
        spmm_impl=cfg.spmm_impl, fused=cfg.gcn_fused,
    )
    optim_name, lr = cfg.gcn_optim_and_lr()
    tx = make_optimizer(optim_name, lr)
    rng = jax.random.PRNGKey(cfg.seed)
    rng, init_rng = jax.random.split(rng)
    state = ft.create_chrome_state(model, tx, init_rng, nfeat=cfg.d_model)

    run_dir = cfg.run_dir
    os.makedirs(run_dir, exist_ok=True)

    start_epoch = 1
    if cfg.resume and ckpt.checkpoint_exists(run_dir):
        restored = ckpt.restore_checkpoint(
            run_dir,
            template={
                "params": jax.device_get(state.params),
                "batch_stats": jax.device_get(state.batch_stats),
                "opt_state": jax.device_get(state.opt_state),
            },
        )
        state = state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
        )
        start_epoch = int(restored["epoch"]) + 1
        verbose(f"resumed GCN training at epoch {start_epoch}")
    elif cfg.load_gcn and ckpt.checkpoint_exists(run_dir):
        restored = ckpt.restore_checkpoint(
            run_dir,
            template={
                "params": jax.device_get(state.params),
                "batch_stats": jax.device_get(state.batch_stats),
                "opt_state": jax.device_get(state.opt_state),
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
    logger = EpochLogger(run_dir, append=start_epoch > 1)
    score_history = []
    if start_epoch > 1 and logger.best_valid_metric > 0:
        # pre-resume best seeds the checkpoint-save gate (ADVICE r4)
        score_history.append(logger.best_valid_metric)
    since_improve = 0

    for epoch in range(start_epoch, cfg.epochs + 1):
        lr_e = steplr_lr(lr, epoch, cfg.lr_decay2 > 0, cfg.lr_step_size2)
        state = state.replace(opt_state=set_learning_rate(state.opt_state, lr_e))

        train_metrics = valid_metrics = None
        valid_loss, score = 0.0, 0.0
        valid_out = (None, None)
        if not cfg.load_gcn and not cfg.test_only:
            rng, ep_rng = jax.random.split(rng)
            t0 = time.time()
            state, preds, targs, loss = ft.run_chrome_epoch(
                state, features["train"], graphs["train"], train=True,
                rng=ep_rng, place=place,
            )
            _check_finite(loss, f"finetune epoch {epoch}")
            train_metrics = _metrics_for(
                preds, targs, loss, (time.time() - t0) / 60, cfg, label_names
            )
            t0 = time.time()
            state, preds, targs, valid_loss = ft.run_chrome_epoch(
                state, features["valid"], graphs["valid"], train=False,
                place=place,
            )
            valid_metrics = _metrics_for(
                preds, targs, valid_loss, (time.time() - t0) / 60, cfg, label_names
            )
            valid_out = (preds, targs)
            score = selection_score(valid_metrics)
            score_history.append(score)

        t0 = time.time()
        state, test_preds, test_targs, test_loss = ft.run_chrome_epoch(
            state, features["test"], graphs["test"], train=False, place=place
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
                        "opt_state": ckpt.tree_to_numpy(state.opt_state),
                    },
                    epoch, cfg.save_mode, score,
                )
        verbose(
            f"epoch {epoch}: test meanAUC={test_metrics['meanAUC']:.4f} "
            f"meanAUPR={test_metrics['meanAUPR']:.4f} loss={test_loss:.3f}"
        )
        if cfg.early_stop_patience > 0 and valid_metrics is not None:
            prior_best = max(score_history[:-1], default=float("-inf"))
            since_improve = 0 if score > prior_best else since_improve + 1
            if since_improve >= cfg.early_stop_patience:
                verbose(
                    f"early stop at epoch {epoch}: no valid-score "
                    f"improvement in {since_improve} epochs"
                )
                break

    return state, tracker


def apply_matmul_precision(cfg: Config) -> None:
    """Set the process-wide matmul precision from config.

    'high' (default, bf16x3) makes every jnp.dot / flax Dense / conv
    f32-faithful — on TPU the DEFAULT precision is a single bf16 pass,
    which diverges ~1e-2 from the reference's f32 cuBLAS/cuDNN at
    chromosome scale, while bf16x3 lands at 7.7e-5, indistinguishable
    from bf16x6 ('highest', 7.3e-5) at ~half the GEMM cost (measured by
    parity_chr.py; the Pallas SpMM runs HIGHEST internally either way).
    'default' opts into bf16 fast mode (non-parity).
    """
    jax.config.update(
        "jax_default_matmul_precision",
        {"high": "high", "highest": "highest", "default": None}[
            cfg.matmul_precision
        ],
    )


def run(cfg: Config, splits: Optional[Dict[str, WindowDataset]] = None, verbose=print):
    """Top-level dispatch (reference: main.py:20-115 + runner.py:25-63)."""
    apply_matmul_precision(cfg)
    if getattr(cfg, "joint", False):
        return run_joint(cfg, splits, verbose=verbose)
    if cfg.pretrain or cfg.save_feats:
        if splits is None:
            splits = artifact.load_dataset(cfg.data_path)
        return run_pretrain(cfg, splits, verbose=verbose)
    return run_finetune(cfg, verbose=verbose)


def _group_tokens_by_chrom(ds: WindowDataset) -> Dict[str, np.ndarray]:
    return {
        chrom: ds.tokens[ds.chroms == chrom] for chrom in ds.chrom_order()
    }


def run_joint(cfg: Config, splits: Optional[Dict[str, WindowDataset]] = None, verbose=print):
    """Joint CNN+GCN end-to-end finetuning (BASELINE config #4; the reference
    parses -optim2/-lr2 for this but never trains the CNN during finetune —
    see train/joint.py)."""
    from chromegcn_tpu.train.joint import joint_eval_step, joint_train_step

    if cfg.dp_devices > 1 or cfg.tp_devices > 1:
        # joint mode composes with -graph_devices (node-partitioned CNN
        # chunks + sharded GCN over the same mesh) but not with DP/TP
        # (configs/README.md scopes this); failing loudly beats silently
        # ignoring the mesh flags
        raise NotImplementedError(
            "joint CNN+GCN mode does not compose with -dp_devices/"
            "-tp_devices; use -graph_devices for multi-device joint runs, "
            "or the staged pretrain->save_feats->finetune path"
        )
    if splits is None:
        splits = artifact.load_dataset(cfg.data_path)
    train_ds = splits["train"]
    label_names = list(train_ds.tgt_vocab.keys())
    n_targets = train_ds.n_targets
    comp_map = jnp.asarray(complement_permutation(train_ds.src_vocab))
    chunk = cfg.joint_chunk

    n_shards = cfg.graph_devices
    # node bucket: chunked CNN needs a chunk multiple; a sharded run also
    # needs per-shard rows to be a 128-tile multiple AND the chunk count
    # to split evenly across shards
    bucket = int(
        np.lcm.reduce([2 * chunk, 128 * max(n_shards, 1), chunk * max(n_shards, 1)])
    )

    # group windows + targets per chromosome, pad to buckets
    data = {}
    for split, ds in splits.items():
        per = {}
        for chrom in ds.chrom_order():
            sel = ds.chroms == chrom
            n_valid = int(sel.sum())
            n_pad = ft.bucket_nodes(n_valid, bucket=bucket)
            per[chrom] = {
                "tokens": ft.pad_rows(ds.tokens[sel].astype(np.int32), n_pad),
                "targets": ft.pad_rows(ds.targets[sel].astype(np.float32), n_pad),
                "n_valid": n_valid,
            }
        data[split] = per

    # graphs per chrom (reuse feature-free path: need n_valid per chrom)
    use_bsr = cfg.spmm_impl == "pallas" or (
        cfg.spmm_impl == "auto" and jax.default_backend() == "tpu"
    )
    hic = {}
    if cfg.adj_type in ("hic", "both"):
        hic = {
            split: artifact.load_graph_edges(cfg.graph_path(split))
            for split in splits
        }
    place = jnp.asarray
    mesh_g = None
    if n_shards > 1:
        from chromegcn_tpu.parallel.mesh import make_mesh, node_sharding
        from chromegcn_tpu.parallel.multihost import put_global

        mesh_g = make_mesh(n_shards, axis="graph")
        sharding = node_sharding(mesh_g)
        place = lambda arr: put_global(np.asarray(arr), sharding)
        verbose(f"joint: node-sharded over {n_shards} devices")
    graphs = {}
    for split, per in data.items():
        graphs[split] = {}
        for chrom, entry in per.items():
            g = build_chrom_graph(
                cfg.adj_type,
                n_valid=entry["n_valid"],
                n_pad=entry["tokens"].shape[0],
                hic_edges=hic.get(split, {}).get(chrom) if hic else None,
            )
            if mesh_g is not None:
                from chromegcn_tpu.parallel.graph import shard_graph

                strategy = cfg.graph_strategy
                if strategy == "auto":
                    strategy = "halo_bsr" if use_bsr else "halo"
                g = shard_graph(
                    g, mesh_g, strategy=strategy, spmm_dtype=cfg.spmm_dtype
                )
            elif use_bsr:
                from chromegcn_tpu.ops.spmm_hybrid import attach_auto

                g = attach_auto(g, strategy=cfg.spmm_form)
            graphs[split][chrom] = g

    wmodel = make_window_model(
        cfg.window_model, n_targets, seq_length=cfg.seq_length, d_model=cfg.d_model
    )
    wstate = pt.create_window_state(
        wmodel, make_optimizer(cfg.optim, cfg.lr),
        jax.random.PRNGKey(cfg.seed), cfg.seq_length, train_ds.src_vocab,
    )
    cmodel = make_chrome_model(
        cfg.chrome_model, nclass=n_targets, dropout=cfg.gcn_dropout,
        gate=cfg.gate, layers=cfg.gcn_layers, nfeat=cfg.d_model,
        spmm_impl=cfg.spmm_impl, fused=cfg.gcn_fused,
    )
    optim2, lr2 = cfg.gcn_optim_and_lr()
    cstate = ft.create_chrome_state(
        cmodel, make_optimizer(optim2, lr2), jax.random.PRNGKey(cfg.seed + 1),
        nfeat=cfg.d_model,
    )

    run_dir = cfg.run_dir + ".joint"

    def _joint_payload():
        return {
            "window": {
                "params": ckpt.tree_to_numpy(wstate.params),
                "batch_stats": ckpt.tree_to_numpy(wstate.batch_stats),
                "opt_state": ckpt.tree_to_numpy(wstate.opt_state),
            },
            "chrome": {
                "params": ckpt.tree_to_numpy(cstate.params),
                "batch_stats": ckpt.tree_to_numpy(cstate.batch_stats),
                "opt_state": ckpt.tree_to_numpy(cstate.opt_state),
            },
        }

    start_epoch = 1
    if cfg.resume and ckpt.checkpoint_exists(run_dir):
        # true joint resume: both stages' params + batch stats + optimizer
        # state + epoch (round-4; mirrors run_finetune's resume path —
        # the reference has no joint training at all, main.py:83)
        restored = ckpt.restore_checkpoint(
            run_dir, template=jax.device_get(_joint_payload())
        )
        wstate = wstate.replace(
            params=restored["window"]["params"],
            batch_stats=restored["window"]["batch_stats"],
            opt_state=restored["window"]["opt_state"],
        )
        cstate = cstate.replace(
            params=restored["chrome"]["params"],
            batch_stats=restored["chrome"]["batch_stats"],
            opt_state=restored["chrome"]["opt_state"],
        )
        start_epoch = int(restored["epoch"]) + 1
        verbose(f"resumed joint training at epoch {start_epoch}")
    # warm-start both stages from the pretrain checkpoint when available
    elif ckpt.checkpoint_exists(cfg.stage1_run_dir):
        cnn = ckpt.restore_checkpoint(cfg.stage1_run_dir)
        wstate = wstate.replace(
            params=jax.tree_util.tree_map(jnp.asarray, cnn["params"]),
            batch_stats=jax.tree_util.tree_map(jnp.asarray, cnn["batch_stats"]),
        )
        params, stats = ft.warm_start_head_from_window(
            cstate.params, cstate.batch_stats, cnn["params"], cnn["batch_stats"]
        )
        cstate = cstate.replace(params=params, batch_stats=stats)
        verbose("joint: warm-started CNN + GCN head from pretrain checkpoint")

    os.makedirs(run_dir, exist_ok=True)
    tracker = BestTracker()
    logger = EpochLogger(run_dir, append=start_epoch > 1)
    rng = jax.random.PRNGKey(cfg.seed + 2)

    def run_split(split, train):
        nonlocal wstate, cstate, rng
        preds, targs = [], []
        total_loss = 0.0
        for chrom, entry in data[split].items():
            tokens = place(entry["tokens"])
            targets = place(entry["targets"])
            graph = graphs[split][chrom]
            if train:
                rng, step = jax.random.split(rng)
                wstate, cstate, loss = joint_train_step(
                    wstate, cstate, tokens, comp_map, graph, targets, step,
                    chunk_size=chunk,
                )
                probs = None
            else:
                loss, probs = joint_eval_step(
                    wstate, cstate, tokens, comp_map, graph, targets,
                    chunk_size=chunk,
                )
                n_valid = entry["n_valid"]
                preds.append(np.asarray(probs)[:n_valid])
                targs.append(entry["targets"][:n_valid])
            total_loss += float(loss)
        if preds:
            return np.concatenate(preds), np.concatenate(targs), total_loss
        return None, None, total_loss

    for epoch in range(start_epoch, cfg.epochs + 1):
        t0 = time.time()
        _, _, train_loss = run_split("train", train=True)
        v_preds, v_targs, valid_loss = run_split("valid", train=False)
        valid_metrics = _metrics_for(
            v_preds, v_targs, valid_loss, (time.time() - t0) / 60, cfg, label_names
        )
        t_preds, t_targs, test_loss = run_split("test", train=False)
        test_metrics = _metrics_for(
            t_preds, t_targs, test_loss, 0.0, cfg, label_names
        )
        tracker.evaluate(valid_metrics, test_metrics, epoch)
        # joint training collects no train-split predictions (probs are not
        # materialized in the train step), so the train line logs loss only
        logger.log_loss("train", epoch, train_loss)
        logger.log("valid", epoch, valid_loss, valid_metrics)
        logger.log("test", epoch, test_loss, test_metrics)
        score = selection_score(valid_metrics)
        if logger.maybe_snapshot(epoch, valid_loss, score, v_preds, v_targs, t_preds, t_targs):
            ckpt.save_checkpoint(run_dir, _joint_payload(), epoch)
        verbose(
            f"epoch {epoch}: joint test meanAUC={test_metrics['meanAUC']:.4f} "
            f"meanAUPR={test_metrics['meanAUPR']:.4f} loss={test_loss:.3f}"
        )
    return (wstate, cstate), tracker
