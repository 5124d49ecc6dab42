"""Joint CNN+GCN finetune: end-to-end gradient flow through both stages."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# XLA-compile-heavy (measured: dominates full-suite wall time);
# default loop skips these - run with --runslow (tests/conftest.py)
pytestmark = pytest.mark.slow

from chromegcn_tpu.data.constants import SRC_VOCAB
from chromegcn_tpu.models.chrome import ChromeGCN
from chromegcn_tpu.models.window import Expecto
from chromegcn_tpu.ops.seq import complement_permutation
from chromegcn_tpu.ops.sparse import build_chrom_graph
from chromegcn_tpu.train.finetune import create_chrome_state
from chromegcn_tpu.train.joint import joint_train_step
from chromegcn_tpu.train.optim import make_optimizer
from chromegcn_tpu.train.pretrain import create_window_state


def test_joint_step_trains_both_stages():
    seq, d, n_targets = 400, 8, 4
    n_pad, n_valid = 16, 14
    rng = jax.random.PRNGKey(0)
    nprng = np.random.default_rng(0)

    wmodel = Expecto(n_targets=n_targets, seq_length=seq, d_model=d)
    wstate = create_window_state(
        wmodel, make_optimizer("adam", 1e-3), rng, seq, SRC_VOCAB, batch_size=2
    )
    cmodel = ChromeGCN(nfeat=d, nhid=d, nclass=n_targets, dropout=0.0, layers=2)
    cstate = create_chrome_state(cmodel, make_optimizer("adam", 1e-3), rng, nfeat=d, n_nodes=256)

    graph = build_chrom_graph("constant", n_valid=n_valid, n_pad=n_pad)
    tokens = jnp.asarray(nprng.integers(0, 4, size=(n_pad, seq)).astype(np.int32))
    targets = jnp.asarray((nprng.random((n_pad, n_targets)) < 0.3).astype(np.float32))
    comp_map = jnp.asarray(complement_permutation(SRC_VOCAB))

    w_before = jax.device_get(wstate.params["model"]["conv1a"]["kernel"])
    c_before = jax.device_get(cstate.params["GC1"]["weight"])

    losses = []
    for i in range(3):
        rng, step = jax.random.split(rng)
        wstate, cstate, loss = joint_train_step(
            wstate, cstate, tokens, comp_map, graph, targets, step, chunk_size=8
        )
        losses.append(float(loss))

    # both stages' parameters moved
    w_after = jax.device_get(wstate.params["model"]["conv1a"]["kernel"])
    c_after = jax.device_get(cstate.params["GC1"]["weight"])
    assert not np.allclose(w_before, w_after)
    assert not np.allclose(c_before, c_after)
    assert losses[-1] < losses[0]


def test_run_joint_epoch_loop(tmp_path):
    """run_joint's full epoch loop: logs all three splits, train line carries
    loss only (no metrics — the train step materializes no probs), snapshots
    a checkpoint, and the loss trajectory is finite."""
    import os

    from chromegcn_tpu.config import Config
    from chromegcn_tpu.data import artifact
    from chromegcn_tpu.data.synthetic import make_window_dataset
    from chromegcn_tpu.train.runner import run

    dataroot = str(tmp_path / "data")
    os.makedirs(os.path.join(dataroot, "SYN", "1000"), exist_ok=True)
    splits = {
        "train": make_window_dataset({"chr2": 14}, n_targets=4, seq_length=400, seed=0),
        "valid": make_window_dataset({"chr3": 12}, n_targets=4, seq_length=400, seed=1),
        "test": make_window_dataset({"chr1": 12}, n_targets=4, seq_length=400, seed=2),
    }
    cfg = Config(
        dataroot=dataroot, results_dir=str(tmp_path / "results"), cell_type="SYN",
        epochs=2, batch_size=8, seq_length=400, d_model=8,
        optim="adam", lr=1e-3, dropout=0.0, gcn_dropout=0.0,
        adj_type="constant", joint=True, joint_chunk=8,
    )
    artifact.save_dataset(cfg.data_path, splits)
    (wstate, cstate), tracker = run(cfg, splits, verbose=lambda *a: None)

    run_dir = cfg.run_dir + ".joint"
    train_log = open(os.path.join(run_dir, "train.log")).read().splitlines()
    assert len(train_log) == 2
    # train line keeps the 6-column CSV contract with NaN metric
    # placeholders (no probs are materialized in the train step, so no
    # metrics — and no columns borrowed from valid)
    first = train_log[0].split(",")
    assert int(first[0]) == 1 and np.isfinite(float(first[1]))
    assert len(first) == 6, f"train log must keep the 6-column contract: {first}"
    assert all(np.isnan(float(v)) for v in first[2:]), first
    valid_log = open(os.path.join(run_dir, "valid.log")).read().splitlines()
    assert len(valid_log[0].split(",")) == 6  # valid line carries real metrics
    assert all(np.isfinite(float(v)) for v in valid_log[0].split(",")[2:])
    assert os.path.isdir(os.path.join(run_dir, "ckpt"))
    assert 0.0 < tracker.best_test["meanAUC"] <= 1.0


def test_joint_step_composes_with_graph_sharding():
    """joint_train_step with a node-sharded graph (VERDICT r2 item 8): the
    CNN chunk loop runs under shard_map over the graph mesh and the GCN
    stage consumes the sharded features — loss trajectory must equal the
    single-device run exactly."""
    from chromegcn_tpu.parallel.graph import shard_graph
    from chromegcn_tpu.parallel.mesh import make_mesh

    seq, d, n_targets = 400, 8, 4
    n_pad, n_valid = 32, 30
    chunk = 8
    nprng = np.random.default_rng(1)
    graph = build_chrom_graph("constant", n_valid=n_valid, n_pad=n_pad)
    tokens = jnp.asarray(nprng.integers(0, 4, size=(n_pad, seq)).astype(np.int32))
    targets = jnp.asarray((nprng.random((n_pad, n_targets)) < 0.3).astype(np.float32))
    comp_map = jnp.asarray(complement_permutation(SRC_VOCAB))
    mesh = make_mesh(4, axis="graph")
    sharded = shard_graph(graph, mesh, strategy="halo")

    traj = {}
    for tag, g in (("single", graph), ("sharded", sharded)):
        rng = jax.random.PRNGKey(7)
        wmodel = Expecto(n_targets=n_targets, seq_length=seq, d_model=d)
        wstate = create_window_state(
            wmodel, make_optimizer("adam", 1e-3), jax.random.PRNGKey(0),
            seq, SRC_VOCAB, batch_size=2,
        )
        cmodel = ChromeGCN(nfeat=d, nhid=d, nclass=n_targets, dropout=0.0, layers=2)
        cstate = create_chrome_state(
            cmodel, make_optimizer("adam", 1e-3), jax.random.PRNGKey(0),
            nfeat=d, n_nodes=256,
        )
        losses = []
        for i in range(2):
            rng, step = jax.random.split(rng)
            wstate, cstate, loss = joint_train_step(
                wstate, cstate, tokens, comp_map, g, targets, step,
                chunk_size=chunk,
            )
            losses.append(float(loss))
        traj[tag] = losses
    np.testing.assert_allclose(traj["sharded"], traj["single"], rtol=2e-5)


def test_joint_resume_restores_opt_state_and_epoch(tmp_path):
    """Joint resume (round 4): checkpoints carry BOTH stages' optimizer
    state + epoch, and -resume continues the epoch count and appends to
    (not truncates) the logs — mirroring run_finetune's resume contract."""
    import os

    from chromegcn_tpu.config import Config
    from chromegcn_tpu.data import artifact
    from chromegcn_tpu.data.synthetic import make_window_dataset
    from chromegcn_tpu.train import checkpoint as ckpt
    from chromegcn_tpu.train.runner import run

    dataroot = str(tmp_path / "data")
    os.makedirs(os.path.join(dataroot, "SYN", "1000"), exist_ok=True)
    splits = {
        "train": make_window_dataset({"chr2": 14}, n_targets=4, seq_length=400, seed=0),
        "valid": make_window_dataset({"chr3": 12}, n_targets=4, seq_length=400, seed=1),
        "test": make_window_dataset({"chr1": 12}, n_targets=4, seq_length=400, seed=2),
    }
    cfg = Config(
        dataroot=dataroot, results_dir=str(tmp_path / "results"), cell_type="SYN",
        epochs=2, batch_size=8, seq_length=400, d_model=8,
        optim="adam", lr=1e-3, dropout=0.0, gcn_dropout=0.0,
        adj_type="constant", joint=True, joint_chunk=8,
    )
    artifact.save_dataset(cfg.data_path, splits)
    run(cfg, splits, verbose=lambda *a: None)

    run_dir = cfg.run_dir + ".joint"
    saved = ckpt.restore_checkpoint(run_dir)
    # both stages persist optimizer state (round-4 fix: r3 omitted it)
    assert "opt_state" in saved["window"] and "opt_state" in saved["chrome"]

    import dataclasses

    resumed = dataclasses.replace(cfg, epochs=4, resume=True)
    msgs = []
    run(resumed, splits, verbose=lambda *a: msgs.append(" ".join(map(str, a))))
    assert any("resumed joint training at epoch" in m for m in msgs), msgs
    train_log = open(os.path.join(run_dir, "train.log")).read().splitlines()
    epochs_logged = [int(line.split(",")[0]) for line in train_log]
    # resume appended later epochs after the original 1..2 lines
    assert epochs_logged[0] == 1 and epochs_logged[-1] == 4
    assert len(epochs_logged) >= 3
