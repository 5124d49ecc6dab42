"""End-to-end product training run on the real TPU (VERDICT r2 items 3+4;
round-5 refresh per VERDICT r4 next 4/6/8).

Drives the FULL user path through train.runner.run() — pretrain ->
save_feats -> GCN finetune — on a graph-coupled synthetic dataset at
honest scale (~56k windows, seq 2000, 919 targets; labels depend on Hi-C
neighbors so the graph stage has real signal to exploit —
data/synthetic.make_graph_coupled_dataset). Records wall-clock per
epoch/split, the number of distinct XLA compiles, and the loss/meanAUC/
meanAUPR trajectories into E2E_r05.json, plus the CNN-vs-GCN
analysis.results.compare_runs report (the paper's central claim;
reference scripts/analyze_results.py) into GCNWIN_r05.json.

Round-5 configuration:
- the CNN pretrains to a PLATEAU (early_stop_patience on the valid
  selection score, cap --epochs-cnn) instead of a fixed budget, so the
  GCN delta is measured against a genuinely converged baseline
  (VERDICT r4 weak 4 / next 8);
- the synthetic Hi-C is degree-HETEROGENEOUS (hubness + A/B-compartment
  knobs, data/synthetic.synthetic_hic_edges) so the mechanism analyses
  stratify a populated axis (VERDICT r4 missing 4 / next 4) — per-node
  degree statistics of the generated graph are recorded as evidence;
- label names are ENCODE-convention, and the run ASSERTS the
  TFBS/HM/DNase per-type splits are non-empty so GCNWIN_r05 carries real
  per-type tables (VERDICT r4 weak 3 / next 6).

Run: `python run_e2e.py` (~45-90 min TPU; metrics passes are host-side
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
    ap.add_argument("--out", default="E2E_r05.json")
    ap.add_argument("--gcnwin", default="GCNWIN_r05.json")
    ap.add_argument("--workdir", default="/tmp/e2e_r05")
    ap.add_argument(
        "--epochs-cnn", type=int, default=30,
        help="pretrain epoch CAP — the run stops earlier at a valid-score "
        "plateau (--patience), so the GCN delta is measured against a "
        "PLATEAUED baseline (VERDICT r4 weak 4)",
    )
    ap.add_argument("--epochs-gcn", type=int, default=25)
    ap.add_argument(
        "--patience", type=int, default=3,
        help="early_stop_patience for both stages (0 = fixed budgets)",
    )
    ap.add_argument(
        "--hubness", type=float, default=0.6,
        help="heavy-tailed per-node attachment strength for the synthetic "
        "Hi-C (data/synthetic.synthetic_hic_edges)",
    )
    ap.add_argument("--compartment-frac", type=float, default=0.15)
    ap.add_argument(
        "--degree-coupled-frac", type=float, default=0.0,
        help="fraction of motifs whose placement couples to node degree "
        "(populates the label-degree mechanism axis; see "
        "data/synthetic.make_graph_coupled_dataset)",
    )
    ap.add_argument(
        "--mid", action="store_true",
        help="~30k-window focused-probe scale (e.g. the degree-coupled "
        "mechanism run) instead of the full ~56k E2E scale",
    )
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
    elif args.mid:
        split_chroms = {
            "train": {"chr2": 8000, "chr5": 8000, "chr7": 8000},  # 24,000
            "valid": {"chr3": 2600},
            "test": {"chr1": 3000},
        }
        n_targets = 919
        epochs_cnn = min(10, args.epochs_cnn)
        epochs_gcn = min(12, args.epochs_gcn)
        seq_length, d_model, batch = 2000, 128, 64
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
        split_chroms, n_targets=n_targets, seq_length=seq_length, seed=0,
        hubness=args.hubness, compartment_frac=args.compartment_frac,
        degree_coupled_frac=args.degree_coupled_frac,
    )
    artifact.save_dataset(cfg0.data_path, splits)
    for split, per in graphs.items():
        artifact.save_graph_edges(cfg0.graph_path(split), per)
    n_windows = sum(len(ds.tokens) for ds in splits.values())
    t_gen = time.time() - t0
    print(f"[e2e] dataset: {n_windows} windows, {n_targets} targets "
          f"({t_gen:.0f}s)", flush=True)

    # degree-heterogeneity evidence: the mechanism analyses stratify on
    # node degree, so record that the generated axis is actually populated
    # (VERDICT r4 missing 4: the old generator's tercile boundaries were
    # within ~1% of each other)
    degs = []
    for chrom, (s, r, v) in graphs["train"].items():
        n = int(max(s.max(), r.max())) + 1
        d = np.zeros(n)
        np.add.at(d, np.asarray(r), 1.0)
        degs.append(d)
    deg = np.concatenate(degs)
    q = np.quantile(deg, [1 / 3, 2 / 3, 0.99])
    degree_stats = {
        "mean": round(float(deg.mean()), 2),
        "max": int(deg.max()),
        "tercile_bounds": [round(float(x), 2) for x in q[:2]],
        "p99": round(float(q[2]), 2),
        "top1pct_edge_share": round(
            float(np.sort(deg)[-max(1, len(deg) // 100):].sum() / deg.sum()), 4
        ),
        "hubness": args.hubness, "compartment_frac": args.compartment_frac,
        "degree_coupled_frac": args.degree_coupled_frac,
    }
    print(f"[e2e] train-graph degree stats: {degree_stats}", flush=True)

    report = {
        "n_windows": n_windows, "n_targets": n_targets,
        "seq_length": seq_length, "batch_size": batch,
        "early_stop_patience": args.patience,
        "epoch_caps": {"cnn": epochs_cnn, "gcn": epochs_gcn},
        "train_graph_degree": degree_stats,
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

    # 1) pretrain the CNN to a valid-score plateau (early stop), as the
    #    CLI would with -early_stop_patience
    phase("pretrain", Config(pretrain=True, epochs=epochs_cnn,
                             early_stop_patience=args.patience, **base))
    # 2) dump per-chromosome features from the best checkpoint
    phase("save_feats", Config(save_feats=True, **base))
    # 3) GCN finetune on saved features + Hi-C graphs (same plateau rule)
    phase("finetune", Config(load_pretrained=True, epochs=epochs_gcn,
                             early_stop_patience=args.patience, **base))

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

    # 4) CNN-vs-GCN on the best test snapshots (paper's central claim).
    #    cell_type="GM12878" matches the generator's ENCODE-style names
    #    (the histone key is cell-type dependent, utils/evals.py): r4's
    #    "SYNE2E" here is why every committed per-type table was empty.
    label_names = list(splits["train"].tgt_vocab.keys())
    cmp = analysis_results.compare_runs(
        cfg.stage1_run_dir, cfg.run_dir, label_names, cell_type="GM12878"
    )
    for group in ("tfbs", "hm", "dnase"):
        assert cmp.get(group), (
            f"per-type split {group!r} is EMPTY — label naming regressed "
            "(VERDICT r4 weak 3); got groups: "
            + str({k: bool(v) for k, v in cmp.items()})
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
