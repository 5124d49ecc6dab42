"""The composed product seam on tiny data: raw files -> pipeline CLI ->
artifacts -> training CLI (VERDICT r3 item 1 — previously every pipeline
piece was unit-tested but the chain had never executed).

Mirrors the reference's documented product flow: data/create_data.py
produces train_valid_test.pt + graph pkls, then main.py trains from them
(reference: README.md:31-46).
"""

import json
import os

import numpy as np
import pytest

from chromegcn_tpu.config import Config
from chromegcn_tpu.data.synthetic_raw import make_raw_world
from chromegcn_tpu.main import build_parser, config_from_args
from chromegcn_tpu.main import main as train_main
from chromegcn_tpu.pipeline.__main__ import main as pipeline_main


@pytest.fixture(scope="module")
def raw_world(tmp_path_factory):
    root = tmp_path_factory.mktemp("ingest")
    raw = str(root / "raw")
    # chr1 -> test, chr3 -> valid, chr2/chr4 -> train (pipeline split rule)
    sizes = {"chr1": 64_000, "chr2": 64_000, "chr3": 48_000, "chr4": 48_000}
    stats = make_raw_world(
        raw, sizes, n_tfbs=2, n_hm=1, n_dnase=1, motif_p=0.25,
        pairs_per_node=4.0, seed=11, verbose=lambda *a: None,
    )
    return root, raw, stats


def test_pipeline_cli_builds_artifacts(raw_world):
    root, raw, stats = raw_world
    out = str(root / "processed" / "SYNRAW" / "1000")
    pipeline_main([
        "--fasta", os.path.join(raw, "genome.fa"),
        "--peaks", os.path.join(raw, "peaks"),
        "--hic", os.path.join(raw, "hic"),
        "--out", out,
        "--hicsize", "125000", "--hicnorm", "SQRTVC",
    ])
    assert os.path.exists(os.path.join(out, "dataset.npz"))
    for split in ("train", "valid", "test"):
        assert os.path.exists(
            os.path.join(out, "hic", f"{split}_graphs_125000_SQRTVCnorm.npz")
        )

    from chromegcn_tpu.data import artifact

    splits = artifact.load_dataset(os.path.join(out, "dataset.npz"))
    assert set(splits) == {"train", "valid", "test"}
    # the pipeline kept exactly the ground-truth labeled windows
    for split, chroms in (
        ("train", ["chr2", "chr4"]), ("valid", ["chr3"]), ("test", ["chr1"])
    ):
        assert sorted(set(splits[split].chroms)) == chroms
        n = sum(stats["chroms"][c]["kept_windows"] for c in chroms)
        assert splits[split].tokens.shape[0] == n, split
    assert splits["train"].n_targets == stats["n_assays"]
    # labels reconstructed from peaks == ground-truth positives
    total_pos = sum(c["positives"] for c in stats["chroms"].values())
    got_pos = sum(int(s.targets.sum()) for s in splits.values())
    assert got_pos == total_pos
    # graph edges connect only kept windows and are symmetric
    edges = artifact.load_graph_edges(
        os.path.join(out, "hic", "test_graphs_125000_SQRTVCnorm.npz")
    )
    s, r, v = edges["chr1"]
    n_chr1 = stats["chroms"]["chr1"]["kept_windows"]
    assert len(s) > 0 and s.max() < n_chr1 and r.max() < n_chr1
    pairs = set(zip(s.tolist(), r.tolist()))
    assert all((b, a) in pairs for a, b in pairs)


@pytest.mark.slow
def test_training_cli_runs_on_pipeline_artifacts(raw_world):
    """The exact commands a user runs, chained: pretrain -> save_feats ->
    GCN finetune over the pipeline-produced artifacts, hic adjacency."""
    root, raw, stats = raw_world
    dataroot = str(root / "processed")
    results = str(root / "results")
    common = [
        "-dataroot", dataroot, "-results_dir", results, "-cell_type", "SYNRAW",
        "-batch_size", "8", "-seq_length", "2000", "-d_model", "16",
        "-optim", "adam", "-lr", "0.001",
        "-adj_type", "hic", "-hicsize", "125000", "-hicnorm", "SQRTVC",
    ]
    train_main(common + ["-pretrain", "-epochs", "2", "-shuffle_train"])
    cfg = config_from_args(build_parser().parse_args(common + ["-pretrain"]))
    log = open(os.path.join(cfg.stage1_run_dir, "train.log")).read().splitlines()
    losses = [float(l.split(",")[1]) for l in log]
    assert len(losses) == 2 and losses[-1] < losses[0]

    train_main(common + ["-save_feats"])
    from chromegcn_tpu.data.loader import load_chrom_features

    feats = load_chrom_features(cfg.feature_path("test"))
    assert set(feats) == {"chr1"}
    assert feats["chr1"].forward.shape == (
        stats["chroms"]["chr1"]["kept_windows"], 16,
    )

    argv = common + ["-load_pretrained", "-epochs", "2", "-gcn_dropout", "0.0"]
    train_main(argv)
    ft_cfg = config_from_args(build_parser().parse_args(argv))
    assert ".adj_hic.norm_SQRTVC" in ft_cfg.run_dir
    ft_log = open(os.path.join(ft_cfg.run_dir, "test.log")).read().splitlines()
    assert len(ft_log) == 2
    assert all(np.isfinite(float(x)) for x in ft_log[-1].split(","))
