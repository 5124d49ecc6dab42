"""Ultra-sparse SpMM shootout at full chr1 scale: BSR strips vs hybrid
tile+gather (ops/spmm_hybrid.py), ONE process so the comparison dodges the
±5% cross-process tunnel scatter (BENCHAUDIT_r05).

FULLSCALE_r05 measured the panelled BSR operator strip-dominated at the
reference's true chr1 scale (155,776 strips for 911k edges — ~175 streamed
elements/edge, per-block overhead bound). The hybrid form routes straggler
edges through sorted gather + segment-sum (bandwidth bound) and keeps only
genuinely dense regions on the MXU tile path. This driver measures, in one
process on the chip:

  1. forward SpMM medians (single-dispatch fori loops) for: panelled BSR,
     hybrid, pure gather (hybrid with no dense regions);
  2. the full gated 2-layer chrome_train_step (fwd+bwd+Adam, both strands,
     919 labels) with the BSR operator vs the hybrid operator;
  3. parity of every variant against the XLA oracle at this exact scale;
  4. the cost model's verdict (estimate_costs_ns) vs the measurement.

Writes HYBRID_r05.json. Run: `python bench_hybrid.py` (TPU, ~10-15 min
incl. tunnel compiles). `--tiny` is a CPU plumbing check.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

N_CHR1 = 249_088
N_PAIRS = 500_000
D = 128
NCLASS = 919


def sweep_thresholds(g, n_pad, args, report):
    """Forward-SpMM medians across dense_region_edges thresholds, one
    process (writes report['threshold_sweep'])."""
    import functools

    import jax
    import jax.numpy as jnp

    from chromegcn_tpu.ops import spmm_hybrid as hy
    from chromegcn_tpu.ops.spmm import spmm

    @functools.partial(jax.jit, static_argnames=("iters",))
    def spmm_loop(graph, x, iters):
        def body(_, x):
            return spmm(graph, x, impl="pallas") * 0.999 + 1e-6
        return jax.lax.fori_loop(0, iters, body, x)

    x0 = jnp.asarray(
        np.random.default_rng(0).normal(size=(n_pad, D)).astype(np.float32)
    )
    rows = []
    thresholds = [32, 48, 64, 96, 128, 192] if not args.tiny else [32, 96]
    for thr in thresholds:
        t0 = time.time()
        gh = g.replace(bsr=hy.hybrid_from_graph(g, dense_region_edges=thr))
        build_s = time.time() - t0
        op = gh.bsr
        stragglers = int((np.asarray(op.fv) != 0).sum())
        y = spmm_loop(gh, x0, args.spmm_iters)
        jax.block_until_ready(y)
        runs = []
        for _ in range(args.loops):
            t0 = time.time()
            y = spmm_loop(gh, x0, args.spmm_iters)
            jax.block_until_ready(y)
            runs.append((time.time() - t0) * 1e3 / args.spmm_iters)
        med = float(np.median(runs))
        rows.append({
            "dense_region_edges": thr,
            "ms_median": round(med, 3),
            "ms_runs": [round(r, 3) for r in runs],
            "straggler_edges": stragglers,
            "build_s": round(build_s, 1),
        })
        print(f"[hybrid] thr={thr}: {med:.3f} ms "
              f"({stragglers} stragglers)", flush=True)
        del gh, op
    report["threshold_sweep"] = rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true", help="CPU plumbing check")
    ap.add_argument("--out", default="HYBRID_r05.json")
    ap.add_argument("--loops", type=int, default=5)
    ap.add_argument("--spmm-iters", type=int, default=20)
    ap.add_argument("--steps-per-loop", type=int, default=8)
    ap.add_argument(
        "--sweep", action="store_true",
        help="sweep dense_region_edges thresholds (fwd SpMM only, one "
        "process) instead of the full BSR-vs-hybrid shootout",
    )
    args = ap.parse_args()

    import jax

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
        n_chr1, n_pairs, nclass = 4096, 12_000, 32
        args.loops, args.spmm_iters, args.steps_per_loop = 2, 2, 2
    else:
        n_chr1, n_pairs, nclass = N_CHR1, N_PAIRS, NCLASS

    import jax.numpy as jnp

    from chromegcn_tpu.data.synthetic import make_hic_edges
    from chromegcn_tpu.models.chrome import make_chrome_model
    from chromegcn_tpu.ops import spmm_hybrid as hy
    from chromegcn_tpu.ops import spmm_pallas as sp
    from chromegcn_tpu.ops.sparse import build_chrom_graph
    from chromegcn_tpu.ops.spmm import spmm_xla
    from chromegcn_tpu.train import finetune as ft
    from chromegcn_tpu.train.optim import make_optimizer

    t_all = time.time()
    report = {
        "check": "BSR strips vs hybrid tile+gather at full chr1 scale, one process",
        "n_valid": n_chr1, "n_pairs": n_pairs,
        "backend": jax.default_backend(),
    }
    jax.config.update("jax_default_matmul_precision", "highest")

    print("[hybrid] generating chr1-scale graph...", flush=True)
    t0 = time.time()
    s, r, v = make_hic_edges(
        n_chr1, n_pairs, seed=107, hubness=0.6, compartment_frac=0.15
    )
    n_pad = ft.bucket_nodes(n_chr1, 2048)
    g = build_chrom_graph("hic", n_valid=n_chr1, n_pad=n_pad, hic_edges=(s, r, v))
    report["gen_s"] = round(time.time() - t0, 1)
    report["n_edges_directed"] = int(g.n_edges)
    print(f"[hybrid] graph: {int(g.n_edges)} edges, n_pad={n_pad} "
          f"({report['gen_s']}s)", flush=True)

    report["cost_model"] = hy.estimate_costs_ns(g, d=D)
    print(f"[hybrid] cost model: {report['cost_model']}", flush=True)

    if args.sweep:
        sweep_thresholds(g, n_pad, args, report)
        if args.out == "HYBRID_r05.json":  # don't clobber the shootout
            args.out = "HYBRID_SWEEP_r05.json"
        out = args.out if not args.tiny else "/tmp/HYBRID_tiny.json"
        with open(out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"[hybrid] wrote {out}", flush=True)
        return

    # ---- operators ------------------------------------------------------
    t0 = time.time()
    g_bsr = sp.attach_bsr(g)
    bsr_build_s = time.time() - t0
    t0 = time.time()
    g_hyb = g.replace(bsr=hy.hybrid_from_graph(g))
    hyb_build_s = time.time() - t0
    t0 = time.time()
    g_gat = g.replace(bsr=hy.hybrid_from_graph(g, dense_region_edges=10**9))
    gat_build_s = time.time() - t0
    op_h = g_hyb.bsr
    dense_tiles = 0
    if op_h.dense is not None:
        mats = (list(op_h.dense.fwd) if not hasattr(op_h.dense.fwd, "tiles")
                else [op_h.dense.fwd])
        dense_tiles = sum(int(m.tiles.shape[0]) for m in mats)
    report["operators"] = {
        "bsr": {"form": type(g_bsr.bsr).__name__, "build_s": round(bsr_build_s, 1)},
        "hybrid": {
            "form": "HybridOperator", "build_s": round(hyb_build_s, 1),
            "dense_form": type(op_h.dense).__name__ if op_h.dense is not None else None,
            "dense_tiles_padded": dense_tiles,
            "straggler_edges": int((np.asarray(op_h.fv) != 0).sum()),
            "coo_capacity": int(op_h.fs.shape[0]),
        },
        "pure_gather": {"build_s": round(gat_build_s, 1)},
    }
    print(f"[hybrid] operators: {report['operators']}", flush=True)

    # ---- forward SpMM medians (single-dispatch fori loops) --------------
    from chromegcn_tpu.ops.spmm import spmm
    import functools

    @functools.partial(jax.jit, static_argnames=("iters",))
    def spmm_loop(graph, x, iters):
        def body(_, x):
            return spmm(graph, x, impl="pallas") * 0.999 + 1e-6
        return jax.lax.fori_loop(0, iters, body, x)

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(n_pad, D)).astype(np.float32))

    def time_spmm(graph, label):
        y = spmm_loop(graph, x0, args.spmm_iters)  # compile + warm
        jax.block_until_ready(y)
        runs = []
        for _ in range(args.loops):
            t0 = time.time()
            y = spmm_loop(graph, x0, args.spmm_iters)
            jax.block_until_ready(y)
            runs.append((time.time() - t0) * 1e3 / args.spmm_iters)
        med = float(np.median(runs))
        print(f"[hybrid] {label} fwd SpMM: {med:.3f} ms "
              f"(runs {[round(r, 3) for r in runs]})", flush=True)
        return {"ms_median": round(med, 3), "ms_runs": [round(r, 3) for r in runs]}

    report["spmm_fwd"] = {
        "bsr": time_spmm(g_bsr, "BSR"),
        "hybrid": time_spmm(g_hyb, "hybrid"),
        "pure_gather": time_spmm(g_gat, "pure-gather"),
    }
    e = int(g.n_edges)
    for k, d_ in report["spmm_fwd"].items():
        d_["edges_per_s"] = round(e / (d_["ms_median"] / 1e3))

    # ---- parity ---------------------------------------------------------
    oracle = np.asarray(spmm_xla(g, x0))
    for label, gg in (("bsr", g_bsr), ("hybrid", g_hyb), ("pure_gather", g_gat)):
        out = np.asarray(spmm(gg, x0, impl="pallas"))
        err = float(np.max(np.abs(out - oracle)))
        report["spmm_fwd"][label]["max_abs_err_vs_xla"] = err
        assert err < 2e-4, (label, err)
    print(f"[hybrid] parity ok: "
          f"{[(k, v['max_abs_err_vs_xla']) for k, v in report['spmm_fwd'].items()]}",
          flush=True)

    # ---- full train step: BSR vs hybrid ---------------------------------
    x_f = jnp.asarray(rng.normal(scale=0.5, size=(n_pad, D)).astype(np.float32))
    x_r = jnp.asarray(rng.normal(scale=0.5, size=(n_pad, D)).astype(np.float32))
    tgt = jnp.asarray(
        (rng.random(size=(n_pad, nclass)) < 0.08).astype(np.float32)
    )

    def time_step(graph, label):
        state = ft.create_chrome_state(
            make_chrome_model("gcn", nclass=nclass, dropout=0.1, gate=True,
                              layers=2, nfeat=D, spmm_impl="pallas"),
            make_optimizer("adam", 1e-3), jax.random.PRNGKey(0), nfeat=D,
        )
        key = jax.random.PRNGKey(1)
        t0 = time.time()
        state, loss, _ = ft.chrome_train_step(state, x_f, x_r, graph, tgt, key)
        loss = float(loss)
        compile_s = time.time() - t0
        runs = []
        for _ in range(args.loops):
            t0 = time.time()
            for _ in range(args.steps_per_loop):
                key, sk = jax.random.split(key)
                state, l, _ = ft.chrome_train_step(state, x_f, x_r, graph, tgt, sk)
            jax.block_until_ready(l)
            runs.append((time.time() - t0) * 1e3 / args.steps_per_loop)
        med = float(np.median(runs))
        print(f"[hybrid] {label} train step: {med:.2f} ms "
              f"(runs {[round(r, 2) for r in runs]}; compile {compile_s:.1f}s; "
              f"first loss {loss:.4f})", flush=True)
        del state
        return {
            "ms_per_step_median": round(med, 2),
            "ms_per_step_runs": [round(r, 2) for r in runs],
            "first_step_s_incl_compile": round(compile_s, 1),
            "final_loss": float(l),
            "edges_per_s": round(e / (med / 1e3)),
        }

    report["train_step"] = {
        "bsr": time_step(g_bsr, "BSR"),
        "hybrid": time_step(g_hyb, "hybrid"),
    }
    b = report["train_step"]["bsr"]["ms_per_step_median"]
    h = report["train_step"]["hybrid"]["ms_per_step_median"]
    report["train_step"]["speedup_hybrid_over_bsr"] = round(b / h, 3)
    report["total_wall_s"] = round(time.time() - t_all, 1)

    out = args.out if not args.tiny else "/tmp/HYBRID_tiny.json"
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"[hybrid] wrote {out}; speedup {b / h:.2f}x; "
          f"total {report['total_wall_s']}s", flush=True)


if __name__ == "__main__":
    main()
