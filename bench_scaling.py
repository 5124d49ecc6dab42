"""Edge-partitioned SpMM scaling harness: edges/sec at 1..N devices.

BASELINE target: >=75% edges/s scaling efficiency to 2+ hosts. Real
multi-chip hardware isn't available in this environment, so this harness:
- on TPU: measures the single-chip numbers (the 1-device anchor)
- on CPU (JAX_PLATFORMS=cpu + xla_force_host_platform_device_count=8):
  validates the sharded path end-to-end and reports *relative* scaling on
  the virtual mesh (indicative of collective/compute overlap structure,
  not absolute ICI performance)

Usage: python bench_scaling.py [--devices 1 2 4 8] [--nodes 50176] [--pairs 250000]
Prints one JSON line per device count.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, nargs="+", default=None)
    p.add_argument("--nodes", type=int, default=50176)
    p.add_argument("--pairs", type=int, default=250000)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument(
        "--strategy", default="halo_bsr",
        choices=["halo_bsr", "halo", "all_gather"],
        help="halo_bsr = halo exchange feeding the per-shard Pallas BSR "
        "kernel (the -graph_devices trainer path). NOTE on the CPU virtual "
        "mesh the Pallas kernel runs in interpret mode — use --strategy "
        "halo_bsr there only with small --nodes, and read the numbers as "
        "relative scaling structure, not absolute throughput.",
    )
    p.add_argument(
        "--cpu", action="store_true",
        help="force the CPU backend (env JAX_PLATFORMS is overridden by this "
        "machine's site plugin; combine with "
        "XLA_FLAGS=--xla_force_host_platform_device_count=8 for a virtual mesh)",
    )
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from chromegcn_tpu.data.synthetic import make_hic_edges
    from chromegcn_tpu.ops.sparse import build_chrom_graph
    from chromegcn_tpu.parallel.graph import (
        attach_shard_bsr,
        partition_graph,
        sharded_spmm,
    )
    from chromegcn_tpu.parallel.mesh import make_mesh

    n_avail = len(jax.devices())
    device_counts = args.devices or sorted(
        {d for d in (1, 2, 4, 8) if d <= n_avail}
    )

    n = args.nodes
    s, r, v = make_hic_edges(n - 128, args.pairs, seed=0)
    graph = build_chrom_graph("hic", n_valid=n - 128, n_pad=n, hic_edges=(s, r, v))
    n_edges = int(graph.n_edges)
    rng = np.random.default_rng(0)
    x_host = rng.normal(size=(n, 128)).astype(np.float32)

    results = []
    for nd in device_counts:
        mesh = make_mesh(nd, axis="graph")
        pg = partition_graph(graph, nd)
        if args.strategy == "halo_bsr":
            pg = attach_shard_bsr(pg)
        x = jnp.asarray(x_host)

        fn = jax.jit(
            lambda x, pg=pg, mesh=mesh: sharded_spmm(
                pg, x, mesh, axis="graph", strategy=args.strategy
            )
        )
        out = fn(x)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(x)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters
        eps = n_edges / dt
        results.append((nd, eps, dt))
        base = results[0][1]
        print(
            json.dumps(
                {
                    "metric": f"sharded spmm edges/sec @ {nd} devices ({args.strategy})",
                    "value": round(eps, 1),
                    "unit": "edges/sec",
                    "vs_baseline": round(eps / base, 3),
                    "detail": {
                        "devices": nd,
                        "ms_per_spmm": round(dt * 1e3, 3),
                        "scaling_efficiency": round(eps / (base * nd), 3),
                        "backend": jax.default_backend(),
                        # per-device ICI halo volume — one ring round per
                        # offset k, each shipping H_k rows (vs n*d*4 for
                        # all_gather); per-offset widths, not a global max
                        "halo_mb_per_device": round(
                            pg.halo_cols * x_host.shape[1] * 4 / 2**20, 3
                        ),
                        "halo_widths": list(pg.halo_widths),
                        "interpret_mode": jax.default_backend() == "cpu"
                        and args.strategy == "halo_bsr",
                    },
                }
            )
        )


if __name__ == "__main__":
    main()
