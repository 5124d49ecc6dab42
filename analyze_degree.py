"""Δ(AUPR) vs label contact-degree — the paper's central *mechanism*
figure (reference: scripts/analyze_results.py get_label_weights +
delta-vs-degree plot), run on a completed E2E workdir's snapshots.

The claim behind ChromeGCN is not just "GCN beats CNN" but *where*: labels
whose positive windows sit on highly-contacted (high Hi-C degree) nodes
gain the most from the graph stage. This reproduces that analysis on the
round-4 converged-CNN E2E outputs: per-label AUPR for CNN and GCN test
snapshots (analysis.results.per_label_table), per-label mean contact
degree (analysis.results.label_degree_weights, clamp semantics preserved),
correlation + degree-tercile deltas.

Run (host-only): python analyze_degree.py --workdir /tmp/e2e_r04 \
    --out DEGREE_r04.json
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/e2e_r05")
    ap.add_argument("--out", default="DEGREE_r05.json")
    ap.add_argument("--cell", default="SYNE2E")
    args = ap.parse_args()

    from chromegcn_tpu.analysis.results import (
        label_degree_weights,
        load_best_predictions,
        per_label_table,
    )
    from chromegcn_tpu.data import artifact
    from chromegcn_tpu.ops.sparse import build_chrom_graph

    runs = sorted(glob.glob(
        os.path.join(args.workdir, "results", args.cell, "graph.expecto.128*")
    ))
    cnn_dir = next(r for r in runs if ".finetune" not in r)
    gcn_dir = next(r for r in runs if ".finetune" in r)

    cnn = load_best_predictions(cnn_dir)
    gcn = load_best_predictions(gcn_dir)
    assert np.array_equal(cnn["test_targets"], gcn["test_targets"])
    targets = cnn["test_targets"]
    n_labels = targets.shape[1]
    names = [f"assay{i}" for i in range(n_labels)]

    print("[degree] per-label AUPR (CNN)...", flush=True)
    t_cnn = per_label_table(cnn["test_preds"], targets, names)
    print("[degree] per-label AUPR (GCN)...", flush=True)
    t_gcn = per_label_table(gcn["test_preds"], targets, names)
    delta = t_gcn["aupr"] - t_cnn["aupr"]

    # per-label mean contact degree over the TEST split's chromosome graphs
    data_dir = os.path.join(args.workdir, "data", args.cell, "1000")
    splits = artifact.load_dataset(os.path.join(data_dir, "dataset.npz"))
    graph_path = glob.glob(os.path.join(data_dir, "hic", "test_graphs_*.npz"))[0]
    edges = artifact.load_graph_edges(graph_path)
    ds = splits["test"]

    class RawGraph:
        """Raw BINARY adjacency view for the degree analysis — the
        reference computes label weights on the unnormalized adjacency
        (scripts/analyze_results.py:256 clamps entries to 1 and row-sums);
        build_chrom_graph would hand us D^-1 A whose rows sum to 1."""

        def __init__(self, s, r, n):
            self.senders = np.asarray(s)
            self.receivers = np.asarray(r)
            self.vals = np.ones(len(s), np.float32)
            self.n_edges = len(s)
            self.n_nodes = n

    graphs, tgts = [], []
    for chrom in ds.chrom_order():
        sel = ds.chroms == chrom
        n = int(sel.sum())
        s, r, v = edges[chrom]
        graphs.append(RawGraph(s, r, n))
        tgts.append(ds.targets[sel])
    # snapshot rows are the concatenation over chrom_order — same order
    assert sum(t.shape[0] for t in tgts) == targets.shape[0]
    weights = label_degree_weights(graphs, tgts)

    ok = np.isfinite(delta) & np.isfinite(weights)
    d, w = delta[ok], weights[ok]
    # rank (Spearman) correlation without scipy
    def rank(a):
        order = np.argsort(a)
        rk = np.empty_like(order, dtype=np.float64)
        rk[order] = np.arange(len(a))
        return rk
    spearman = float(np.corrcoef(rank(d), rank(w))[0, 1])
    pearson = float(np.corrcoef(d, w)[0, 1])

    q1, q2 = np.quantile(w, [1 / 3, 2 / 3])
    bins = {
        "low_degree": d[w <= q1],
        "mid_degree": d[(w > q1) & (w <= q2)],
        "high_degree": d[w > q2],
    }
    report = {
        "what": (
            "per-label AUPR delta (GCN - CNN) vs label mean Hi-C contact "
            "degree on the converged-CNN E2E test snapshots of "
            f"{args.workdir} "
            "(reference: scripts/analyze_results.py delta-vs-degree)"
        ),
        "label_degree_spread": {
            "tercile_bounds_rel_range": round(
                float((q2 - q1) / max(np.mean([q1, q2]), 1e-9)), 4
            ),
            "weights_p01_p99": [
                round(float(x), 2) for x in np.quantile(w, [0.01, 0.99])
            ],
        },
        "n_labels": int(ok.sum()),
        "spearman_delta_vs_degree": round(spearman, 4),
        "pearson_delta_vs_degree": round(pearson, 4),
        "tercile_mean_delta": {
            k: round(float(v.mean()), 5) for k, v in bins.items()
        },
        "tercile_frac_positive": {
            k: round(float((v > 0).mean()), 4) for k, v in bins.items()
        },
        "mean_delta_all": round(float(d.mean()), 5),
        "degree_quantiles": [round(float(q), 2) for q in (q1, q2)],
        "interpretation": (
            "r4's run used the near-uniform generator (tercile bounds "
            "within ~1%: an unpopulated axis, expected-null correlation); "
            "round 5 regenerates with hubness/compartment structure — "
            "check label_degree_spread to confirm the axis is populated "
            "before reading the correlation/tercile rows as a mechanism "
            "result"
        ),
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1), flush=True)


if __name__ == "__main__":
    main()
