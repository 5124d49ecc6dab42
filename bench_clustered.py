"""Kernel roofline + partition structure on a degree-HETEROGENEOUS Hi-C
graph (VERDICT r4 weak 2 / next 4).

Every prior roofline/occupancy/partition number was measured on the
homogeneous generator (near-identical node degrees). Real Hi-C has hubs
and A/B compartments; round 5's generator grows both
(data/synthetic.make_hic_edges hubness / compartment_frac). This driver
re-measures, on the SAME process so tunnel variance (~±5% cross-process,
BENCHAUDIT_r05) cancels out of the uniform-vs-clustered comparison:

- on TPU: the bench.py gated train step + kernel-only SpMM roofline for
  the uniform graph AND the clustered graph (hubness 0.6, compartments
  0.15 — the round-5 E2E configuration), with per-graph streamed-element
  occupancy;
- host-side (any backend): partition structure at 8/16/32/64 shards for
  both graphs — edge imbalance, halo widths, stacked-BSR pad inflation —
  the numbers SCALING_r04 reported for the homogeneous graph only.

Writes CLUSTERED_r05.json. Run: `python bench_clustered.py` (TPU,
~10-20 min) or `--cpu` for the structure-only part.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

HUBNESS = 0.6
COMPARTMENT_FRAC = 0.15
SHARD_COUNTS = (8, 16, 32, 64)


def degree_stats(s, r, n):
    d = np.zeros(n)
    np.add.at(d, r, 1.0)
    q = np.quantile(d, [1 / 3, 2 / 3, 0.99])
    top = np.sort(d)[-max(1, n // 100):]
    return {
        "mean": round(float(d.mean()), 2),
        "max": int(d.max()),
        "tercile_bounds": [round(float(x), 2) for x in q[:2]],
        "p99": round(float(q[2]), 2),
        "top1pct_edge_share": round(float(top.sum() / d.sum()), 4),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="host-side structure only (no TPU timing)")
    ap.add_argument("--out", default="CLUSTERED_r05.json")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import bench
    from chromegcn_tpu.data.synthetic import make_hic_edges
    from chromegcn_tpu.ops.sparse import build_chrom_graph
    from chromegcn_tpu.ops.spmm_pallas import attach_bsr

    t_all = time.time()
    report = {
        "check": "uniform vs degree-heterogeneous graph: kernel roofline + "
                 "partition structure (VERDICT r4 next 4)",
        "backend": jax.default_backend(),
        "workload": {"n_valid": bench.N_VALID, "n_pairs": bench.N_PAIRS,
                     "hubness": HUBNESS,
                     "compartment_frac": COMPARTMENT_FRAC},
        "graphs": {},
    }

    flavors = {
        "uniform": dict(hubness=0.0, compartment_frac=0.0),
        "clustered": dict(hubness=HUBNESS, compartment_frac=COMPARTMENT_FRAC),
    }
    graphs = {}
    for name, kw in flavors.items():
        s, r, v = make_hic_edges(bench.N_VALID, bench.N_PAIRS, seed=0, **kw)
        g = build_chrom_graph(
            "hic", n_valid=bench.N_VALID, n_pad=bench.N_PAD, hic_edges=(s, r, v)
        )
        graphs[name] = g
        report["graphs"][name] = {
            "n_edges_directed": int(g.n_edges),
            "degree": degree_stats(s, r, bench.N_VALID),
        }
        print(f"[clustered] {name}: {report['graphs'][name]}", flush=True)

    # ---- host-side partition structure ---------------------------------
    import scaling_hlo

    for name, g in graphs.items():
        rows = []
        for n_shards in SHARD_COUNTS:
            rec = scaling_hlo.structure_at(g, n_shards, bench.D)
            rows.append(rec)
            print(f"[clustered] {name} S={n_shards}: imbalance "
                  f"{rec['edge_imbalance_max_over_mean']}, halo "
                  f"{rec['halo_mb_per_device_per_spmm']} MB", flush=True)
        report["graphs"][name]["partition"] = rows

    # ---- TPU kernel + train-step timing --------------------------------
    if not args.cpu:
        rng = np.random.default_rng(0)
        import jax.numpy as jnp

        x_f = jnp.asarray(rng.normal(size=(bench.N_PAD, bench.D)).astype(np.float32))
        x_r = jnp.asarray(rng.normal(size=(bench.N_PAD, bench.D)).astype(np.float32))
        targets = jnp.asarray(
            (rng.random((bench.N_PAD, bench.NCLASS)) < 0.1).astype(np.float32)
        )
        for name, g in graphs.items():
            gb = attach_bsr(g)
            dt, _ = bench.bench_impl("pallas", gb, x_f, x_r, targets)
            roof = bench.bench_roofline(gb, n_edges=int(g.n_edges))
            edges_per_step = (
                int(g.n_edges) * bench.LAYERS * bench.STRANDS * 2
            )
            report["graphs"][name]["tpu"] = {
                "train_step_ms": round(dt * 1e3, 3),
                "edges_per_s": round(edges_per_step / dt, 1),
                "roofline": roof,
            }
            print(f"[clustered] {name}: step {dt*1e3:.2f} ms, "
                  f"roofline {roof['pct_of_block_stream_bound']}% of "
                  f"block-stream, occupancy "
                  f"{roof['streamed_elems_per_edge']} elems/edge", flush=True)

    report["total_wall_s"] = round(time.time() - t_all, 1)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"[clustered] wrote {args.out} ({report['total_wall_s']}s)",
          flush=True)


if __name__ == "__main__":
    main()
