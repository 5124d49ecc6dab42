"""Chr-scale panelled BSR SpMM bench: compiled-path evidence on real TPU.

The flat kernel keeps x/out fully VMEM-resident, which caps N*d; chr1 at
the reference's full 1kb-window tiling (~249k windows — reference:
data/1create_windows.py tiles every 1kb window, not just peak windows)
exceeds it, so `attach_bsr` auto-panels the graph into a sparse grid of
VMEM-resident sub-matmuls (ops/spmm_pallas.py: BSRPanelOperator). This
bench checks the compiled path end-to-end on the real chip — forward and
gradient vs the XLA segment-sum oracle — and times it (single-dispatch
fori loop, the only honest timing on this backend, DESIGN.md §7).

Run: `python bench_panels.py` (~2 min TPU incl. remote compile).
Prints one JSON line; recorded in PANELS_r03.json / DESIGN.md §1.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

N_VALID = 248_950    # chr1 / 1kb windows scale
N_PAD = 249_088      # multiple of the 128 tile
N_PAIRS = 1_250_000  # same pairs/node density as the 50k-node bench graph
D = 128
ITERS = 20


def main() -> None:
    from chromegcn_tpu.data.synthetic import make_hic_edges
    from chromegcn_tpu.ops import spmm as spmm_mod
    from chromegcn_tpu.ops.sparse import build_chrom_graph
    from chromegcn_tpu.ops.spmm_pallas import (
        BSRPanelOperator,
        attach_bsr,
        spmm_pallas,
        streamed_elements,
    )

    print("building edges...", flush=True)
    s, r, v = make_hic_edges(N_VALID, N_PAIRS, seed=0)
    graph = build_chrom_graph(
        "hic", n_valid=N_VALID, n_pad=N_PAD, hic_edges=(s, r, v)
    )
    t0 = time.perf_counter()
    graph = attach_bsr(graph, d_model=D)
    t_build = time.perf_counter() - t0
    op = graph.bsr
    assert isinstance(op, BSRPanelOperator), type(op)
    print(
        f"panelled BSR built in {t_build:.1f}s: bounds={op.bounds}, "
        f"live fwd panels={len(op.fwd)}/{(len(op.bounds)-1)**2}",
        flush=True,
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(N_PAD, D)).astype(np.float32))

    print("compiling + correctness vs XLA segment-sum...", flush=True)
    out_pallas = jax.jit(spmm_pallas)(op, x)
    out_xla = jax.jit(spmm_mod.spmm_xla)(graph, x)
    err = float(jnp.max(jnp.abs(out_pallas - out_xla)))
    scale = float(jnp.max(jnp.abs(out_xla)))
    assert err < 1e-4 * max(1.0, scale), (err, scale)

    # gradient path. NOTE every big pytree (op, graph, w) must be an
    # ARGUMENT, not a closure: the axon tunnel serializes closed-over
    # constants into the remote-compile request body and its size limit
    # rejects the program (HTTP 413)
    gfun = jax.jit(
        jax.grad(lambda xx, w, o: jnp.sum(spmm_pallas(o, xx) * w))
    )
    gref = jax.jit(
        jax.grad(lambda xx, w, gr: jnp.sum(spmm_mod.spmm_xla(gr, xx) * w))
    )
    gerr = float(
        jnp.max(jnp.abs(gfun(x, out_xla, op) - gref(x, out_xla, graph)))
    )
    gscale = float(jnp.max(jnp.abs(gref(x, out_xla, graph))))
    # the gradient path must meet the same scaled tolerance as the forward
    # (a VJP regression must fail the bench, not just print)
    assert gerr < 1e-4 * max(1.0, gscale), (gerr, gscale)
    print(f"fwd err {err:.3e}, grad err {gerr:.3e}", flush=True)

    def timed(fn, operand, tag):
        def step(i, carry):
            o, xx = carry
            return o, fn(o, xx) * 0.999 + xx * 1e-4

        f = jax.jit(
            lambda o, xx: jax.lax.fori_loop(0, ITERS, step, (o, xx))[1]
        )
        jax.block_until_ready(f(operand, x))
        t0 = time.perf_counter()
        jax.block_until_ready(f(operand, x))
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{tag}: {dt * 1e3:.3f} ms/SpMM", flush=True)
        return dt

    dt_pallas = timed(spmm_pallas, op, "panelled pallas")
    dt_xla = timed(spmm_mod.spmm_xla, graph, "xla segment-sum")

    acct = streamed_elements(op, d=D)["fwd"]
    elems = acct["block_elems"]
    n_edges = int(graph.n_edges)
    print(
        json.dumps(
            {
                "metric": "chr1-1kb-scale panelled BSR SpMM (compiled TPU)",
                "value": round(n_edges / dt_pallas, 1),
                "unit": "edges/sec",
                "vs_baseline": round(dt_xla / dt_pallas, 3),
                "detail": {
                    "n_valid": N_VALID,
                    "n_pad": N_PAD,
                    "pairs": N_PAIRS,
                    "n_edges_directed": n_edges,
                    "panels_fwd": len(op.fwd),
                    "bounds": list(op.bounds),
                    "max_abs_err_fwd": err,
                    "max_abs_err_grad": gerr,
                    "ms_pallas": round(dt_pallas * 1e3, 3),
                    "ms_xla": round(dt_xla * 1e3, 3),
                    "block_elems_streamed": int(elems),
                    "pct_of_block_stream_bound": round(
                        100 * (elems / 20e9) / dt_pallas, 1
                    ),
                    "host_build_s": round(t_build, 1),
                },
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
