"""CLI layer tests: the user surface (`python -m chromegcn_tpu.main ...`).

The reference's entire product surface is its flag-driven CLI
(reference: main.py:20, config_args.py:4-54); these tests drive our
`main(argv)` end-to-end through all three staged modes on tiny on-disk
artifacts — parser → Config → runner dispatch → files on disk — plus
parser/Config mapping unit checks.
"""

import os

import numpy as np
import pytest

from chromegcn_tpu.config import Config
from chromegcn_tpu.data import artifact
from chromegcn_tpu.data.loader import load_chrom_features
from chromegcn_tpu.data.synthetic import make_window_dataset
from chromegcn_tpu.main import build_parser, config_from_args, main


def test_parser_maps_reference_flags_to_config():
    args = build_parser().parse_args(
        [
            "-pretrain", "-window_model", "danq", "-epochs", "7",
            "-batch_size", "16", "-d_model", "64", "-optim", "sgd",
            "-lr", "0.25", "-dropout", "0.2", "-no_gate",
            "-adj_type", "both", "-hicnorm", "KR", "-hicsize", "250000",
            "-spmm_impl", "xla", "-seed", "3",
        ]
    )
    cfg = config_from_args(args)
    assert cfg.pretrain and cfg.window_model == "danq"
    assert cfg.epochs == 7 and cfg.batch_size == 16 and cfg.d_model == 64
    assert cfg.optim == "sgd" and cfg.lr == 0.25 and cfg.dropout == 0.2
    assert cfg.gate is False
    assert cfg.adj_type == "both" and cfg.hicnorm == "KR"
    assert cfg.hicsize == "250000" and cfg.spmm_impl == "xla"
    assert cfg.seed == 3


def test_parser_defaults_round_trip_config_defaults():
    cfg = config_from_args(build_parser().parse_args([]))
    ref = Config()
    assert cfg.window_model == ref.window_model
    assert cfg.lr == ref.lr and cfg.optim == ref.optim
    assert cfg.gate is True and cfg.adj_type == ref.adj_type
    # run-dir naming matches the reference experiment-ID encoding
    # (reference: config_args.py:70-115)
    assert cfg.experiment_id == ref.experiment_id


def test_parser_rejects_unknown_choices():
    with pytest.raises(SystemExit):
        build_parser().parse_args(["-window_model", "resnet"])
    with pytest.raises(SystemExit):
        build_parser().parse_args(["-adj_type", "banana"])


def test_parser_spmm_form_flag():
    cfg = config_from_args(build_parser().parse_args(["-spmm_form", "hybrid"]))
    assert cfg.spmm_form == "hybrid"
    assert config_from_args(build_parser().parse_args([])).spmm_form == "auto"
    with pytest.raises(SystemExit):
        build_parser().parse_args(["-spmm_form", "dense"])


@pytest.fixture(scope="module")
def cli_world(tmp_path_factory):
    """Tiny on-disk dataset the CLI loads by path (no splits injection —
    the real product seam)."""
    root = tmp_path_factory.mktemp("cli_world")
    dataroot = str(root / "data")
    results = str(root / "results")
    os.makedirs(os.path.join(dataroot, "SYN", "1000"), exist_ok=True)
    splits = {
        "train": make_window_dataset({"chr2": 24, "chr4": 16}, n_targets=4, seq_length=400, seed=0),
        "valid": make_window_dataset({"chr3": 16}, n_targets=4, seq_length=400, seed=1),
        "test": make_window_dataset({"chr1": 16}, n_targets=4, seq_length=400, seed=2),
    }
    probe = Config(dataroot=dataroot, cell_type="SYN")
    artifact.save_dataset(probe.data_path, splits)
    common = [
        "-dataroot", dataroot, "-results_dir", results, "-cell_type", "SYN",
        "-batch_size", "8", "-seq_length", "400", "-d_model", "16",
        "-optim", "adam", "-lr", "0.001", "-adj_type", "constant",
    ]
    return common, dataroot, results


def test_cli_mode1_pretrain(cli_world, capsys):
    common, dataroot, results = cli_world
    main(common + ["-pretrain", "-epochs", "2", "-shuffle_train"])
    out = capsys.readouterr().out
    cfg = config_from_args(
        build_parser().parse_args(common + ["-pretrain", "-epochs", "2"])
    )
    # dispatch printed the run dir, then ran: ckpt + 2 logged epochs exist
    assert cfg.run_dir in out and "best meanAUC" in out
    assert os.path.isdir(os.path.join(cfg.stage1_run_dir, "ckpt"))
    log = open(os.path.join(cfg.stage1_run_dir, "train.log")).read().splitlines()
    assert len(log) == 2 and all(len(l.split(",")) == 6 for l in log)


def test_cli_mode2_save_feats(cli_world):
    common, dataroot, results = cli_world
    main(common + ["-save_feats"])
    cfg = config_from_args(build_parser().parse_args(common + ["-save_feats"]))
    for split, chroms in (("train", {"chr2", "chr4"}), ("valid", {"chr3"}), ("test", {"chr1"})):
        feats = load_chrom_features(cfg.feature_path(split))
        assert set(feats) == chroms, split
    assert load_chrom_features(cfg.feature_path("train"))["chr2"].forward.shape == (24, 16)
    # save_feats shares stage 1's run_dir: the pretrain epoch history must
    # survive (round-4 ingest E2E truncation bug) AND the feature-dump
    # pass must not append its own duplicate eval rows (ADVICE r4 —
    # save_feats exists only to dump features)
    log = open(os.path.join(cfg.stage1_run_dir, "test.log")).read().splitlines()
    assert len(log) == 2, "exactly the pretrain epochs must survive save_feats"
    assert [int(l.split(",")[0]) for l in log] == [1, 2]


def test_cli_mode3_finetune(cli_world, capsys):
    common, dataroot, results = cli_world
    argv = common + ["-load_pretrained", "-epochs", "2", "-gcn_dropout", "0.0"]
    main(argv)
    out = capsys.readouterr().out
    cfg = config_from_args(build_parser().parse_args(argv))
    # finetune run dir carries the GCN hparam suffix and is distinct from stage 1
    assert ".finetune" in cfg.run_dir and cfg.run_dir != cfg.stage1_run_dir
    assert cfg.run_dir in out
    log = open(os.path.join(cfg.run_dir, "train.log")).read().splitlines()
    losses = [float(l.split(",")[1]) for l in log]
    assert len(losses) == 2 and np.isfinite(losses).all()
    assert os.path.isdir(os.path.join(cfg.run_dir, "ckpt"))


def test_cli_save_feats_before_pretrain_fails_loudly(tmp_path):
    dataroot = str(tmp_path / "data")
    os.makedirs(os.path.join(dataroot, "SYN", "1000"), exist_ok=True)
    splits = {
        s: make_window_dataset({c: 8}, n_targets=4, seq_length=400, seed=i)
        for i, (s, c) in enumerate(
            (("train", "chr2"), ("valid", "chr3"), ("test", "chr1"))
        )
    }
    probe = Config(dataroot=dataroot, cell_type="SYN")
    artifact.save_dataset(probe.data_path, splits)
    with pytest.raises(FileNotFoundError, match="save_feats"):
        main([
            "-dataroot", dataroot, "-results_dir", str(tmp_path / "r"),
            "-cell_type", "SYN", "-batch_size", "8", "-seq_length", "400",
            "-d_model", "16", "-save_feats",
        ])
