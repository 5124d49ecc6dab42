"""Native Hi-C ingest bench: streaming top-k over a ~10M-line RAWobserved.

The reference's graph step streams up to 126M contact lines per chromosome
and sorts them in python (reference: data/7create_graph_new.py:73,93-104,
plus the external `sort -r -k3 -n` helper, data/extras/sort_hic.py:36). The
C++ `hic_topk` (native/chromegcn_native.cc) replaces that with a bounded
min-heap over a single streaming pass; this bench generates a synthetic
10M-line dump (spanning ~150k 64 KB read chunks), measures lines/sec for
the native path, and asserts its output equals the pure-numpy fallback
exactly (values are collision-free so top-k is unambiguous).

Run: `python bench_native.py` (CPU-only, ~2 min — the numpy fallback pass
dominates). Prints one JSON line; recorded in DESIGN.md §5.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from chromegcn_tpu import native_bridge

N_LINES = 10_000_000
K = 250_000
RES = 1000
N_BINS = 60_000  # ~chr1 peak-window bin count


def generate(path: str, seed: int = 0) -> None:
    rng = np.random.default_rng(seed)
    t0 = time.perf_counter()
    with open(path, "w") as f:
        chunk = 500_000
        for start in range(0, N_LINES, chunk):
            n = min(chunk, N_LINES - start)
            b1 = rng.integers(0, N_BINS, size=n) * RES
            # heavy-tailed genomic distance, like real Hi-C
            dist = np.maximum(1, (rng.pareto(1.5, size=n) * 3).astype(np.int64))
            b2 = np.clip(b1 // RES + dist, 0, N_BINS - 1) * RES
            # collision-free values: unique global line index in the mantissa
            v = rng.random(n) * 100.0 + (start + np.arange(n)) * 1e-9
            f.write(
                "\n".join(
                    f"{a}\t{b}\t{c:.12f}" for a, b, c in zip(b1, b2, v)
                )
                + "\n"
            )
    print(f"generated {N_LINES} lines in {time.perf_counter() - t0:.1f}s", flush=True)


def main() -> None:
    path = "/tmp/bench_raw.RAWobserved"
    if not (os.path.exists(path) and os.path.getsize(path) > N_LINES * 10):
        generate(path)
    size_mb = os.path.getsize(path) / 1e6
    bins = np.arange(0, N_BINS * RES, RES)
    norm = np.ones(N_BINS)  # exercise the normalization path

    assert native_bridge.native_available(), "native lib failed to build"
    t0 = time.perf_counter()
    c1, c2, cv = native_bridge.hic_topk(path, bins, K, norm=norm, resolution_bp=RES)
    dt_native = time.perf_counter() - t0
    print(f"native: {dt_native:.2f}s ({N_LINES / dt_native / 1e6:.2f} M lines/s)", flush=True)

    t0 = time.perf_counter()
    n1, n2, nv = native_bridge._hic_topk_numpy(path, bins, K, norm, RES)
    dt_numpy = time.perf_counter() - t0
    print(f"numpy fallback: {dt_numpy:.2f}s", flush=True)

    assert len(c1) == len(n1) == K, (len(c1), len(n1))
    assert sorted(zip(c1.tolist(), c2.tolist())) == sorted(zip(n1.tolist(), n2.tolist()))
    np.testing.assert_allclose(np.sort(cv), np.sort(nv), rtol=1e-12)

    print(
        json.dumps(
            {
                "metric": "native hic_topk streaming ingest (10M-line RAWobserved)",
                "value": round(N_LINES / dt_native, 1),
                "unit": "lines/sec",
                "vs_baseline": round(dt_numpy / dt_native, 2),
                "detail": {
                    "n_lines": N_LINES,
                    "file_mb": round(size_mb, 1),
                    "k": K,
                    "native_s": round(dt_native, 2),
                    "numpy_fallback_s": round(dt_numpy, 2),
                    "mb_per_s": round(size_mb / dt_native, 1),
                    "projected_126M_line_s": round(dt_native * 126 / 10, 1),
                },
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
