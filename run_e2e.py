"""End-to-end product training run on the real TPU (VERDICT r2 items 3+4).

Drives the FULL user path through train.runner.run() — pretrain ->
save_feats -> GCN finetune — on a graph-coupled synthetic dataset at
honest scale (~56k windows, seq 2000, 919 targets; labels depend on Hi-C
neighbors so the graph stage has real signal to exploit —
data/synthetic.make_graph_coupled_dataset). Records wall-clock per
epoch/split, the number of distinct XLA compiles, and the loss/meanAUC/
meanAUPR trajectories into E2E_r03.json, plus the CNN-vs-GCN
analysis.results.compare_runs report (the paper's central claim;
reference scripts/analyze_results.py) into GCNWIN_r03.json.

Run: `python run_e2e.py` (~30-60 min TPU; metrics passes are host-side
sklearn). `--tiny` is a CPU-fast plumbing check.
"""

import argparse
import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


class CompileCounter(logging.Handler):
    def __init__(self):
        super().__init__()
        self.count = 0

    def emit(self, record):
        if record.getMessage().startswith("Compiling "):
            self.count += 1


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true", help="CPU plumbing check")
    ap.add_argument("--out", default="E2E_r04.json")
    ap.add_argument("--gcnwin", default="GCNWIN_r04.json")
    ap.add_argument("--workdir", default="/tmp/e2e_r04")
    ap.add_argument(
        "--epochs-cnn", type=int, default=12,
        help="pretrain epochs — r4 default trains the CNN to convergence "
        "so the GCN delta is measured against a WELL-TRAINED baseline "
        "(VERDICT r3 weak 4: the r3 delta used a 3-epoch CNN)",
    )
    ap.add_argument("--epochs-gcn", type=int, default=20)
    args = ap.parse_args()

    import jax

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")

    # count XLA compiles via jax's own compile logging
    jax.config.update("jax_log_compiles", True)
    counter = CompileCounter()
    logging.getLogger("jax._src.interpreters.pxla").addHandler(counter)

    from chromegcn_tpu.analysis import results as analysis_results
    from chromegcn_tpu.config import Config
    from chromegcn_tpu.data import artifact
    from chromegcn_tpu.data.synthetic import make_graph_coupled_dataset
    from chromegcn_tpu.train.runner import run

    t_all = time.time()
    if args.tiny:
        split_chroms = {
            "train": {"chr2": 300, "chr4": 260},
            "valid": {"chr3": 260},
            "test": {"chr1": 260},
        }
        n_targets, epochs_cnn, epochs_gcn = 16, 2, 4
        seq_length, d_model, batch = 500, 32, 32
        epochs_cnn = min(epochs_cnn, args.epochs_cnn)
    else:
        train = {f"chr{c}": 2500 for c in (2, 4, 5, 6, 7, 9, 10, 11, 13, 14, 15, 16, 18, 19, 20, 22)}
        split_chroms = {
            "train": train,                                   # 40,000
            "valid": {"chr3": 2600, "chr12": 2600, "chr17": 2600},   # 7,800
            "test": {"chr1": 2900, "chr8": 2700, "chr21": 2700},     # 8,300
        }
        n_targets = 919
        epochs_cnn, epochs_gcn = args.epochs_cnn, args.epochs_gcn
        seq_length, d_model, batch = 2000, 128, 64

    dataroot = os.path.join(args.workdir, "data")
    results_dir = os.path.join(args.workdir, "results")
    base = dict(
        dataroot=dataroot, results_dir=results_dir, cell_type="SYNE2E",
        seq_length=seq_length, d_model=d_model, batch_size=batch,
        test_batch_size=max(batch, 256) if not args.tiny else 64,
        optim="adam", lr=1e-3, dropout=0.2, gcn_dropout=0.2,
        adj_type="hic", hicnorm="SQRTVC",
        use_stage2_hparams=True, optim2="adam", lr2=2e-3,
        overwrite=True,
    )

    print("[e2e] generating graph-coupled dataset...", flush=True)
    t0 = time.time()
    cfg0 = Config(pretrain=True, epochs=epochs_cnn, **base)
    os.makedirs(cfg0.dataset_dir, exist_ok=True)
    os.makedirs(cfg0.graph_root, exist_ok=True)
    splits, graphs = make_graph_coupled_dataset(
        split_chroms, n_targets=n_targets, seq_length=seq_length, seed=0
    )
    artifact.save_dataset(cfg0.data_path, splits)
    for split, per in graphs.items():
        artifact.save_graph_edges(cfg0.graph_path(split), per)
    n_windows = sum(len(ds.tokens) for ds in splits.values())
    t_gen = time.time() - t0
    print(f"[e2e] dataset: {n_windows} windows, {n_targets} targets "
          f"({t_gen:.0f}s)", flush=True)

    report = {
        "n_windows": n_windows, "n_targets": n_targets,
        "seq_length": seq_length, "batch_size": batch,
        "backend": None, "phases": {}, "epochs": {},
    }

    def phase(name, cfg):
        t0 = time.time()
        c0 = counter.count
        epoch_log = []

        def verbose(*msg):
            line = " ".join(str(m) for m in msg)
            epoch_log.append({"t": round(time.time() - t0, 1), "msg": line})
            print(f"[{name}] {line}", flush=True)

        out = run(cfg, verbose=verbose)
        report["phases"][name] = {
            "wall_s": round(time.time() - t0, 1),
            "xla_compiles": counter.count - c0,
            "log": epoch_log,
        }
        return out

    import jax as _jax
    report["backend"] = _jax.default_backend()

    # 1) pretrain the CNN (loads the dataset itself, as the CLI would)
    phase("pretrain", Config(pretrain=True, epochs=epochs_cnn, **base))
    # 2) dump per-chromosome features from the best checkpoint
    phase("save_feats", Config(save_feats=True, **base))
    # 3) GCN finetune on saved features + Hi-C graphs
    phase("finetune", Config(load_pretrained=True, epochs=epochs_gcn, **base))

    # trajectories from the product's own CSV epoch logs
    cfg = Config(load_pretrained=True, epochs=epochs_gcn, **base)
    for stage, run_dir in (("cnn", cfg.stage1_run_dir), ("gcn", cfg.run_dir)):
        report["epochs"][stage] = {}
        for split in ("train", "valid", "test"):
            p = os.path.join(run_dir, f"{split}.log")
            if not os.path.exists(p):
                continue
            rows = [ln.split(",") for ln in open(p).read().splitlines() if ln]
            report["epochs"][stage][split] = [
                {"epoch": int(r[0]), "loss": float(r[1]),
                 "meanAUC": float(r[3]), "meanAUPR": float(r[4])}
                for r in rows
            ]

    # 4) CNN-vs-GCN on the best test snapshots (paper's central claim)
    label_names = list(splits["train"].tgt_vocab.keys())
    cmp = analysis_results.compare_runs(
        cfg.stage1_run_dir, cfg.run_dir, label_names, cell_type="SYNE2E"
    )
    report["compare_cnn_vs_gcn"] = cmp
    delta = cmp["all"]["b_meanAUPR"] - cmp["all"]["a_meanAUPR"]
    report["gcn_minus_cnn_meanAUPR"] = round(delta, 4)
    report["total_wall_s"] = round(time.time() - t_all, 1)

    out_path = args.out if not args.tiny else "/tmp/E2E_tiny.json"
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    with open(args.gcnwin if not args.tiny else "/tmp/GCNWIN_tiny.json", "w") as f:
        json.dump(cmp, f, indent=1)
    print(f"[e2e] GCN-CNN meanAUPR delta: {delta:+.4f}", flush=True)
    print(f"[e2e] wrote {out_path}; total {report['total_wall_s']}s", flush=True)


if __name__ == "__main__":
    main()
