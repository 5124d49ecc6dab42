"""Tile row-height sweep BELOW 128 (VERDICT r3 item 2).

Block occupancy at the default 128x128 tiling is ~2% (~50 streamed block
elements per edge); at the measured width-independent ~19-20 G elem/s
stream rate, reducing streamed elements is the one remaining single-chip
lever toward the nominal-HBM roofline. Shorter tiles (64x128, 32x128,
16x128) cover the same edges with fewer dead rows — at the cost of more
blocks (per-block overhead) and a different tile/strip split (the 'auto'
break-even scales with tile area; ops/spmm_pallas._build_one_direction).

This sweep measures, per tile height, on the real chip:
- streamed block elements + elements/edge (occupancy),
- kernel-only SpMM time (single-dispatch fori loop, median-of-5 — the only
  honest timing on this backend, DESIGN.md §7),
- the full chr1-scale train step (the production number).

Writes TILES_r04.json. The tile/strip format is already a two-height block
population (tile_r x 128 + 8 x 128), so "mixed heights" reduce to this
sweep's split-point choice.

Run: python bench_tiles.py  (TPU, ~10-20 min incl. per-variant compiles)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

N_VALID = 50_000
N_PAD = 50_176
N_PAIRS = 250_000
D = 128
ITERS = 50
REPEATS = 5
TILE_HEIGHTS = (128, 64, 32, 16)


def main():
    import jax
    import jax.numpy as jnp

    from bench import BLOCK_STREAM_ELEMS_PER_S, HBM_BYTES_PER_S, bench_impl, build
    from chromegcn_tpu.ops.spmm_pallas import (
        attach_bsr,
        spmm_pallas,
        streamed_elements,
    )

    graph, x_f, x_r, targets = build()
    n_edges = int(graph.n_edges)
    x0 = jnp.zeros((N_PAD, D), jnp.float32)

    out = {
        "round": 4,
        "workload": {
            "n_pad": N_PAD, "n_valid": N_VALID, "pairs": N_PAIRS,
            "n_edges": n_edges, "d": D,
        },
        "rates": {
            "block_stream_elems_per_s": BLOCK_STREAM_ELEMS_PER_S,
            "hbm_bytes_per_s": HBM_BYTES_PER_S,
        },
        "sweep": [],
    }

    for tile in TILE_HEIGHTS:
        print(f"[tiles] building tile_r={tile} ...", flush=True)
        g = attach_bsr(graph, tile=tile)
        op = g.bsr
        acct = streamed_elements(op, d=D)["fwd"]
        nt = int(np.asarray(op.fwd.live)[0]) * 8
        ns = int(np.asarray(op.fwd.live)[1]) * 32

        def step(i, x):
            return spmm_pallas(op, x) * 0.999 + x * 1e-4

        f = jax.jit(lambda x: jax.lax.fori_loop(0, ITERS, step, x))
        print(f"[tiles] compiling kernel tile_r={tile} ...", flush=True)
        jax.block_until_ready(f(x0))
        times = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            jax.block_until_ready(f(x0))
            times.append((time.perf_counter() - t0) / ITERS)
        dt = float(np.median(times))

        print(f"[tiles] train step tile_r={tile} ...", flush=True)
        dt_step, _ = bench_impl("pallas", g, x_f, x_r, targets)

        block_bytes = acct["block_elems"] * acct["elem_bytes"]
        total_bytes = block_bytes + acct["x_out_elems"] * 4
        rec = {
            "tile_r": tile,
            "live_tile_steps_x8": nt,
            "live_strip_steps_x32": ns,
            "streamed_block_elems": acct["block_elems"],
            "tile_elems": acct["tile_elems"],
            "strip_elems": acct["strip_elems"],
            "streamed_elems_per_edge": round(acct["block_elems"] / n_edges, 1),
            "spmm_ms": round(dt * 1e3, 4),
            "spmm_ms_spread": [round(t * 1e3, 4) for t in sorted(times)],
            "effective_gelem_per_s": round(acct["block_elems"] / dt / 1e9, 2),
            "pct_of_block_stream_bound": round(
                100 * (acct["block_elems"] / BLOCK_STREAM_ELEMS_PER_S) / dt, 1
            ),
            "pct_of_hbm_roofline": round(
                100 * (total_bytes / HBM_BYTES_PER_S) / dt, 1
            ),
            "train_step_ms": round(dt_step * 1e3, 3),
        }
        out["sweep"].append(rec)
        print(f"[tiles] {json.dumps(rec)}", flush=True)

    best = min(out["sweep"], key=lambda r: r["spmm_ms"])
    out["best_tile_r"] = best["tile_r"]
    out["best_spmm_ms"] = best["spmm_ms"]
    base = next(r for r in out["sweep"] if r["tile_r"] == 128)
    out["speedup_vs_128"] = round(base["spmm_ms"] / best["spmm_ms"], 3)
    with open("TILES_r04.json", "w") as f:
        json.dump(out, f, indent=1)
    print(f"[tiles] wrote TILES_r04.json; best tile_r={best['tile_r']} "
          f"({out['speedup_vs_128']}x vs 128)", flush=True)


if __name__ == "__main__":
    main()
