"""Focused CNN-vs-GCN separation on NEIGHBOR-ONLY labels (round 4).

The converged-CNN E2E (E2E_r04.json) showed the aggregate GCN delta is
small once the CNN converges — because most of that generator's label
signal is in-window and the neighbor factor only caps precision. This
experiment makes the mechanism explicit: half the targets are
"enhancer-hijack"-style NEIGHBOR-ONLY labels (fire iff >= 30% of the
window's Hi-C neighbors carry the motif; the window's OWN sequence
carries zero evidence — data/synthetic.make_graph_coupled_dataset
neighbor_only_frac). A sequence-only model is structurally blind to
these; the graph stage reads the neighbors' features directly.

Runs pretrain (to convergence) -> save_feats -> GCN finetune on the chip
and reports per-group test AUPR/AUC (neighbor-only vs own-motif labels)
for both stages -> NBRWIN_r04.json.

Run: python run_nbrwin.py  (TPU, ~25-35 min)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--scale", choices=["small", "e2e"], default="e2e",
        help="'e2e' = the NBRWIN_r04.json configuration (40k train "
        "windows, 919 targets, 128 neighbor-only, 12/20 epochs — the "
        "regime where features are strong and the null is meaningful); "
        "'small' = the 10k-window arm that demonstrated feature quality "
        "gating the graph gain",
    )
    args = ap.parse_args()

    from chromegcn_tpu.analysis.results import load_best_predictions
    from chromegcn_tpu.config import Config
    from chromegcn_tpu.data import artifact
    from chromegcn_tpu.data.synthetic import make_graph_coupled_dataset
    from chromegcn_tpu.train.runner import run
    from chromegcn_tpu.utils import metrics

    if args.scale == "small":
        N_TARGETS, n_nbr_frac = 256, 0.5
        # 156 steps/epoch at 10k windows: ~E2E total step count
        EPOCHS_CNN, EPOCHS_GCN = 40, 12
        split_chroms = {
            "train": {c: 2500 for c in ("chr2", "chr4", "chr5", "chr6")},
            "valid": {"chr3": 2600},
            "test": {"chr1": 2600},
        }
        seed = 3
    else:
        N_TARGETS, n_nbr_frac = 919, 128 / 919
        EPOCHS_CNN, EPOCHS_GCN = 12, 20
        split_chroms = {
            "train": {f"chr{c}": 2500 for c in
                      (2, 4, 5, 6, 7, 9, 10, 11, 13, 14, 15, 16, 18, 19, 20, 22)},
            "valid": {"chr3": 2600, "chr12": 2600, "chr17": 2600},
            "test": {"chr1": 2900, "chr8": 2700, "chr21": 2700},
        }
        seed = 0
    NBR_ONLY_FRAC = n_nbr_frac

    t_all = time.time()
    workdir = f"/tmp/nbrwin_r04_{args.scale}"
    base = dict(
        dataroot=os.path.join(workdir, "data"),
        results_dir=os.path.join(workdir, "results"),
        cell_type="SYNNBR", seq_length=2000, d_model=128, batch_size=64,
        test_batch_size=256, optim="adam", lr=1e-3, dropout=0.2,
        gcn_dropout=0.2, adj_type="hic", hicnorm="SQRTVC",
        use_stage2_hparams=True, optim2="adam", lr2=2e-3, overwrite=True,
    )

    cfg0 = Config(pretrain=True, epochs=EPOCHS_CNN, **base)
    os.makedirs(cfg0.dataset_dir, exist_ok=True)
    os.makedirs(cfg0.graph_root, exist_ok=True)
    print("[nbrwin] generating dataset (50% neighbor-only labels)...", flush=True)
    splits, graphs = make_graph_coupled_dataset(
        split_chroms, n_targets=N_TARGETS, seq_length=2000,
        neighbor_only_frac=NBR_ONLY_FRAC, seed=seed,
    )
    artifact.save_dataset(cfg0.data_path, splits)
    for split, per in graphs.items():
        artifact.save_graph_edges(cfg0.graph_path(split), per)
    n_nbr = int(round(NBR_ONLY_FRAC * N_TARGETS))
    prev = splits["test"].targets.mean(axis=0)
    print(f"[nbrwin] prevalence: nbr-only {prev[:n_nbr].mean():.4f}, "
          f"own-motif {prev[n_nbr:].mean():.4f}", flush=True)

    report = {
        "what": __doc__.split("\n")[0],
        "n_targets": N_TARGETS, "n_neighbor_only": n_nbr,
        "epochs": {"cnn": EPOCHS_CNN, "gcn": EPOCHS_GCN},
        "test_prevalence": {
            "neighbor_only": round(float(prev[:n_nbr].mean()), 4),
            "own_motif": round(float(prev[n_nbr:].mean()), 4),
        },
        "phases": {},
    }

    def phase(name, cfg):
        t0 = time.time()
        run(cfg, verbose=lambda *m: print(f"[{name}]", *m, flush=True))
        report["phases"][name] = {"wall_s": round(time.time() - t0, 1)}

    phase("pretrain", Config(pretrain=True, epochs=EPOCHS_CNN, **base))
    phase("save_feats", Config(save_feats=True, **base))
    phase("finetune", Config(load_pretrained=True, epochs=EPOCHS_GCN, **base))

    cfg = Config(load_pretrained=True, epochs=EPOCHS_GCN, **base)
    groups = {
        "neighbor_only": list(range(n_nbr)),
        "own_motif": list(range(n_nbr, N_TARGETS)),
    }
    for stage, run_dir in (("cnn", cfg.stage1_run_dir), ("gcn", cfg.run_dir)):
        snap = load_best_predictions(run_dir)
        p, t = snap["test_preds"], snap["test_targets"]
        for gname, idx in groups.items():
            report[f"{stage}_{gname}"] = {
                "meanAUC": round(metrics.auroc(t[:, idx], p[:, idx])[0], 4),
                "meanAUPR": round(metrics.aupr(t[:, idx], p[:, idx])[0], 4),
            }
    for gname in groups:
        c, g = report[f"cnn_{gname}"], report[f"gcn_{gname}"]
        report[f"delta_{gname}"] = {
            "meanAUC": round(g["meanAUC"] - c["meanAUC"], 4),
            "meanAUPR": round(g["meanAUPR"] - c["meanAUPR"], 4),
            "meanAUPR_rel": round(
                (g["meanAUPR"] - c["meanAUPR"]) / max(c["meanAUPR"], 1e-9), 3
            ),
        }
    report["total_wall_s"] = round(time.time() - t_all, 1)
    with open("NBRWIN_r04.json", "w") as f:
        json.dump(report, f, indent=1)
    print("[nbrwin] deltas:", {k: report[k] for k in report if k.startswith("delta")},
          flush=True)


if __name__ == "__main__":
    main()
