"""Full-chromosome-scale GCN training on the real TPU (VERDICT r4 next 1).

The reference trains each chromosome as ONE ragged graph
(reference: finetune.py:29-44); its largest is chr1, whose 1kb tiling is
~249k windows (reference: data/1create_windows.py tiles every kb). Until
round 5 that scale had *kernel-level* evidence only (PANELS_r03: the
panelled SpMM alone) — the train step was a projection. This driver
replaces the projection with measurements:

  1. build the chr1-scale graph (N=249,088 valid / 249,856 padded,
     -hicsize 500k contact pairs, hub+compartment Hi-C) and attach the
     block-sparse operator — asserts it auto-PANELS (BSRPanelOperator);
  2. median-of-5 repeated state-evolving loops of the full gated 2-layer
     `chrome_train_step` (fwd+bwd+Adam, both strands, 919 labels) at that
     scale — the number that replaces DESIGN §1's ~45 ms projection;
  3. per-layer parity vs the torch.sparse oracle at the SAME scale
     (utils/parity.chromegcn_chr_parity);
  4. >=3 real finetune epochs through train.runner.run() on feature/graph
     artifacts laid out exactly as save_feats would (the product path),
     with teacher-coupled labels so the loss trajectory is meaningful.

Writes FULLSCALE_r05.json. Run: `python run_fullscale.py` (TPU,
~30-50 min incl. tunnel compiles). `--tiny` is a CPU plumbing check.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

N_CHR1 = 249_088      # chr1 @ 1kb tiling (reference data/1create_windows.py)
N_PAIRS = 500_000     # -hicsize 500000 (reference config_args.py)
D = 128
NCLASS = 919


def make_fullscale_world(workdir, n_chr1, n_pairs, n_small, nclass, d, seed=7):
    """Feature + graph + target artifacts at chr1 scale, teacher-coupled.

    Labels come from a graph teacher: per-label logits of the row-normalized
    adjacency applied to the (strand-averaged) features, thresholded at a
    per-label quantile — so the GCN stage has real neighbor signal to fit,
    like data/synthetic.make_graph_coupled_dataset gives the E2E run.
    """
    import scipy.sparse as sp

    from chromegcn_tpu.data.loader import ChromFeatures, save_chrom_features
    from chromegcn_tpu.data import artifact
    from chromegcn_tpu.data.synthetic import make_hic_edges

    rng = np.random.default_rng(seed)
    w_teacher = rng.normal(scale=0.3, size=(d, nclass)).astype(np.float32)

    def one_chrom(n, pairs, cseed):
        s, r, v = make_hic_edges(
            n, pairs, seed=cseed, hubness=0.6, compartment_frac=0.15
        )
        fwd = rng.normal(scale=0.5, size=(n, d)).astype(np.float32)
        rev = rng.normal(scale=0.5, size=(n, d)).astype(np.float32)
        a = sp.coo_matrix((v, (r, s)), shape=(n, n)).tocsr()
        deg = np.maximum(np.asarray(a.sum(axis=1)).ravel(), 1e-6)
        z = (a @ ((fwd + rev) / 2.0)) / deg[:, None]
        logits = z @ w_teacher
        thresh = np.quantile(logits, 0.92, axis=0)
        tgt = (logits > thresh).astype(np.float32)
        return ChromFeatures(forward=fwd, backward=rev, target=tgt), (s, r, v)

    split_plan = {
        "train": {"chr1": (n_chr1, n_pairs)},
        "valid": {"chr3": (n_small, max(1024, n_small * 2))},
        "test": {"chr8": (n_small, max(1024, n_small * 2))},
    }
    feats, graphs = {}, {}
    for split, chroms in split_plan.items():
        feats[split], graphs[split] = {}, {}
        for i, (chrom, (n, pairs)) in enumerate(chroms.items()):
            cf, edges = one_chrom(n, pairs, seed + 100 + i + hash(split) % 50)
            feats[split][chrom] = cf
            graphs[split][chrom] = edges
    return feats, graphs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true", help="CPU plumbing check")
    ap.add_argument("--out", default="FULLSCALE_r05.json")
    ap.add_argument("--workdir", default="/tmp/fullscale_r05")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--timing-loops", type=int, default=5)
    ap.add_argument("--steps-per-loop", type=int, default=8)
    ap.add_argument("--skip-parity", action="store_true")
    args = ap.parse_args()

    import jax

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
        n_chr1, n_pairs, n_small, nclass = 4096, 12_000, 1024, 32
        args.timing_loops, args.steps_per_loop = 2, 2
    else:
        n_chr1, n_pairs, n_small, nclass = N_CHR1, N_PAIRS, 4096, NCLASS

    import jax.numpy as jnp

    from chromegcn_tpu.config import Config
    from chromegcn_tpu.data import artifact
    from chromegcn_tpu.data.loader import save_chrom_features
    from chromegcn_tpu.ops.sparse import build_chrom_graph
    from chromegcn_tpu.ops import spmm_pallas
    from chromegcn_tpu.train import finetune as ft
    from chromegcn_tpu.train.optim import make_optimizer
    from chromegcn_tpu.train.runner import apply_matmul_precision, run

    t_all = time.time()
    report = {
        "check": "full chr1-scale GCN training on chip (VERDICT r4 next 1)",
        "n_valid": n_chr1, "n_pairs": n_pairs, "nclass": nclass,
        "backend": jax.default_backend(),
    }

    # ---- world ----------------------------------------------------------
    print("[fullscale] generating chr1-scale world...", flush=True)
    t0 = time.time()
    feats, graph_edges = make_fullscale_world(
        args.workdir, n_chr1, n_pairs, n_small, nclass, D
    )
    cfg = Config(
        dataroot=os.path.join(args.workdir, "data"),
        results_dir=os.path.join(args.workdir, "results"),
        cell_type="FULLSCALE", d_model=D,
        adj_type="hic", hicnorm="SQRTVC", hicsize=str(n_pairs),
        load_pretrained=True, epochs=args.epochs,
        use_stage2_hparams=True, optim2="adam", lr2=1e-3,
        gcn_dropout=0.1, overwrite=True,
    )
    os.makedirs(cfg.stage1_run_dir, exist_ok=True)
    os.makedirs(cfg.graph_root, exist_ok=True)
    for split in ("train", "valid", "test"):
        save_chrom_features(cfg.feature_path(split), feats[split])
        artifact.save_graph_edges(cfg.graph_path(split), graph_edges[split])
    report["world_gen_s"] = round(time.time() - t0, 1)
    print(f"[fullscale] world ready ({report['world_gen_s']}s)", flush=True)

    # ---- operator build: must auto-panel at this scale ------------------
    apply_matmul_precision(cfg)
    t0 = time.time()
    n_pad = ft.bucket_nodes(n_chr1, 2048)
    g = build_chrom_graph(
        "hic", n_valid=n_chr1, n_pad=n_pad,
        hic_edges=graph_edges["train"]["chr1"],
    )
    g = spmm_pallas.attach_bsr(g)
    op = g.bsr
    is_panel = type(op).__name__ == "BSRPanelOperator"
    if not args.tiny:
        assert is_panel, (
            f"expected the {n_pad}-node operator to auto-panel, got {type(op)}"
        )
    build_s = time.time() - t0
    if is_panel:
        nt = sum(int(m.tiles.shape[0]) for m in op.fwd)
        ns = sum(int(m.strips.shape[0]) for m in op.fwd)
        hbm = sum(
            m.tiles.nbytes + m.strips.nbytes for m in list(op.fwd) + list(op.bwd)
        )
        report["operator"] = {
            "form": "BSRPanelOperator",
            "panel_bounds": list(op.bounds),
            "live_panels_fwd": len(op.fwd),
            "tiles_fwd": nt, "strips_fwd": ns,
            "hbm_bytes_total": int(hbm),
            "build_s": round(build_s, 1),
            "n_edges_directed": int(g.n_edges),
        }
    print(f"[fullscale] operator: {report.get('operator')}", flush=True)

    # ---- step-time measurement -----------------------------------------
    print("[fullscale] timing chrome_train_step...", flush=True)
    rng = jax.random.PRNGKey(0)
    model_state = ft.create_chrome_state(
        __import__(
            "chromegcn_tpu.models.chrome", fromlist=["make_chrome_model"]
        ).make_chrome_model(
            "gcn", nclass=nclass, dropout=0.1, gate=True, layers=2,
            nfeat=D, spmm_impl="pallas",
        ),
        make_optimizer("adam", 1e-3),
        rng, nfeat=D,
    )
    cf = feats["train"]["chr1"]
    x_f = jnp.asarray(ft.pad_rows(cf.forward, n_pad))
    x_r = jnp.asarray(ft.pad_rows(cf.backward, n_pad))
    tgt = jnp.asarray(ft.pad_rows(cf.target, n_pad))
    # warmup/compile (donated state: rebind every call)
    t0 = time.time()
    model_state, loss, _ = ft.chrome_train_step(model_state, x_f, x_r, g, tgt, rng)
    loss = float(loss)
    report["first_step_s_incl_compile"] = round(time.time() - t0, 1)
    print(f"[fullscale] compiled; first loss {loss:.4f} "
          f"({report['first_step_s_incl_compile']}s)", flush=True)
    loop_ms = []
    for rep in range(args.timing_loops):
        t0 = time.time()
        for k in range(args.steps_per_loop):
            rng, srng = jax.random.split(rng)
            model_state, loss, _ = ft.chrome_train_step(
                model_state, x_f, x_r, g, tgt, srng
            )
        jax.block_until_ready(loss)
        loop_ms.append((time.time() - t0) * 1e3 / args.steps_per_loop)
        print(f"[fullscale] loop {rep}: {loop_ms[-1]:.2f} ms/step", flush=True)
    step_ms = float(np.median(loop_ms))
    edges_per_s = int(g.n_edges) / (step_ms / 1e3)
    report["train_step"] = {
        "ms_per_step_median": round(step_ms, 2),
        "ms_per_step_runs": [round(x, 2) for x in loop_ms],
        "loops": args.timing_loops, "steps_per_loop": args.steps_per_loop,
        "edges_per_s": round(edges_per_s),
        "final_loss": float(loss),
        "note": "full gated 2-layer fwd+bwd+Adam, both strands, "
                f"{nclass} labels, panelled Pallas SpMM",
    }
    print(f"[fullscale] step: {step_ms:.2f} ms median "
          f"({edges_per_s/1e6:.0f} M edges/s)", flush=True)
    del model_state, x_f, x_r, tgt

    # ---- parity at scale ------------------------------------------------
    if not args.skip_parity:
        print("[fullscale] parity vs torch oracle...", flush=True)
        from chromegcn_tpu.utils.parity import chromegcn_chr_parity

        t0 = time.time()
        par = chromegcn_chr_parity(
            n_chr1, n_pad, n_pairs, d=D, nclass=nclass, impls=("pallas",)
        )
        worst = max(
            err for per in par.values() for err in per.values()
            if isinstance(err, float)
        )
        report["parity"] = {
            "max_abs_err": par, "worst": worst, "threshold": 2e-4,
            "pass": bool(worst < 2e-4), "wall_s": round(time.time() - t0, 1),
        }
        print(f"[fullscale] parity worst {worst:.2e} "
              f"({report['parity']['wall_s']}s)", flush=True)
        assert worst < 2e-4, par

    # ---- real finetune epochs through the product path ------------------
    print("[fullscale] finetune epochs via train.runner.run...", flush=True)
    t0 = time.time()
    epoch_log = []

    def verbose(*msg):
        line = " ".join(str(m) for m in msg)
        epoch_log.append({"t": round(time.time() - t0, 1), "msg": line})
        print(f"[finetune] {line}", flush=True)

    state, tracker = run(cfg, verbose=verbose)
    report["finetune"] = {
        "wall_s": round(time.time() - t0, 1),
        "epochs": args.epochs,
        "log": epoch_log,
    }
    for split in ("train", "valid", "test"):
        p = os.path.join(cfg.run_dir, f"{split}.log")
        if os.path.exists(p):
            rows = [ln.split(",") for ln in open(p).read().splitlines() if ln]
            report["finetune"][split] = [
                {"epoch": int(r[0]), "loss": float(r[1]),
                 "meanAUC": float(r[3]), "meanAUPR": float(r[4])}
                for r in rows
            ]
    tr = report["finetune"].get("train", [])
    if len(tr) >= 2:
        assert tr[-1]["loss"] < tr[0]["loss"], tr
    report["total_wall_s"] = round(time.time() - t_all, 1)

    out = args.out if not args.tiny else "/tmp/FULLSCALE_tiny.json"
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"[fullscale] wrote {out}; total {report['total_wall_s']}s", flush=True)


if __name__ == "__main__":
    main()
