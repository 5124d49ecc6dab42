"""K562 flavor at scale (VERDICT r3 item 8): a realistic 5kb RAWobserved
dump (~1M lines) through the streaming 5kb -> 1kb upsample + top-k.

The reference materializes a 25x upsampled dump and re-sorts it
(data/extras/upsample_hic.py + sort_hic.py); our native reader expands the
5x5 grid in-stream (native/chromegcn_native.cc hic_topk upsample_grid),
so the 1M-line dump is processed as 25M candidate contacts with no
intermediate file. Reports lines/s, expanded contacts/s, edge counts, and
graph properties; cross-checks native vs the numpy fallback on a subset.

Writes K562_r04.json. Host-only (no TPU needed): python bench_k562.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

N_LINES = 1_000_000
CHROM_MB = 60          # 60 Mb chromosome -> 12k coarse (5kb) bins
KEPT_FRAC = 0.6        # fraction of 1kb windows that are peak windows
K_PAIRS = 62_500       # hicsize 125000 contract
SUBSET_LINES = 40_000  # native-vs-fallback cross-check size


def main():
    from chromegcn_tpu import native_bridge

    rng = np.random.default_rng(7)
    n_coarse = CHROM_MB * 1_000_000 // 5000
    n_fine = CHROM_MB * 1000

    # 5kb contacts with a heavy-tailed distance profile
    i = rng.integers(0, n_coarse, size=N_LINES)
    dist = np.maximum(1, (rng.pareto(1.2, size=N_LINES) * 4).astype(np.int64))
    j = np.clip(i + np.where(rng.random(N_LINES) < 0.5, dist, -dist), 0, n_coarse - 1)
    counts = rng.integers(1, 100, size=N_LINES)

    work = "/tmp/k562_bench"
    os.makedirs(work, exist_ok=True)
    raw = os.path.join(work, "chr9.RAWobserved")
    t0 = time.time()
    with open(raw, "w") as f:
        f.writelines(
            f"{a * 5000}\t{b * 5000}\t{c}\n" for a, b, c in zip(i, j, counts)
        )
    t_write = time.time() - t0

    kept = np.sort(rng.choice(n_fine, size=int(n_fine * KEPT_FRAC), replace=False))
    starts = kept.astype(np.int64) * 1000
    norm = rng.uniform(0.7, 1.3, size=n_fine + 1)

    assert native_bridge.native_available(), "native lib must build for this bench"
    t0 = time.time()
    b1, b2, v = native_bridge.hic_topk(
        raw, starts, K_PAIRS, norm=norm, resolution_bp=1000, upsample_grid=5
    )
    t_native = time.time() - t0

    # graph properties
    fine1, fine2 = b1 // 1000, b2 // 1000
    idx = {int(s): w for w, s in enumerate(starts)}
    assert all(int(x) in idx for x in b1[:100])  # endpoints are peak windows
    report = {
        "round": 4,
        "workload": {
            "raw_lines_5kb": N_LINES,
            "expanded_candidates": N_LINES * 25,
            "chrom_mb": CHROM_MB,
            "kept_windows": int(len(starts)),
            "k_pairs": K_PAIRS,
        },
        "native": {
            "wall_s": round(t_native, 2),
            "raw_lines_per_s": round(N_LINES / t_native, 0),
            "expanded_contacts_per_s": round(N_LINES * 25 / t_native, 0),
            "pairs_kept": int(len(b1)),
            "min_val": round(float(v.min()), 4) if len(v) else None,
            "max_val": round(float(v.max()), 4) if len(v) else None,
            "mean_fine_dist_kb": round(float(np.abs(fine1 - fine2).mean()), 1),
        },
        "raw_write_s": round(t_write, 2),
    }
    print(f"[k562] native: {len(b1)} pairs in {t_native:.2f}s "
          f"({N_LINES / t_native:.0f} raw lines/s, "
          f"{N_LINES * 25 / t_native / 1e6:.2f}M expanded/s)", flush=True)

    # cross-check vs the numpy fallback on a subset
    sub = os.path.join(work, "sub.RAWobserved")
    with open(raw) as f, open(sub, "w") as g:
        for _ in range(SUBSET_LINES):
            g.write(f.readline())
    k_sub = 5000

    def canon(res):
        o1, o2, ov = res
        return sorted(zip(o1.tolist(), o2.tolist(), np.round(ov, 9).tolist()))

    t0 = time.time()
    got_n = canon(native_bridge.hic_topk(
        sub, starts, k_sub, norm=norm, upsample_grid=5))
    t_n = time.time() - t0
    t0 = time.time()
    got_f = canon(native_bridge._hic_topk_numpy(
        sub, starts, k_sub, norm, 1000, upsample_grid=5))
    t_f = time.time() - t0
    report["crosscheck"] = {
        "subset_lines": SUBSET_LINES,
        "native_equals_fallback": got_n == got_f,
        "native_s": round(t_n, 2),
        "fallback_s": round(t_f, 2),
        "native_speedup": round(t_f / max(t_n, 1e-9), 1),
    }
    assert got_n == got_f, "native and fallback top-k disagree"
    with open("K562_r04.json", "w") as f:
        json.dump(report, f, indent=1)
    print(f"[k562] wrote K562_r04.json; crosscheck ok, "
          f"native {report['crosscheck']['native_speedup']}x fallback", flush=True)


if __name__ == "__main__":
    main()
