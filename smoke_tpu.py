"""Compiled-kernel TPU smoke: every Mosaic kernel variant compiles + runs
on the real chip at tiny scale (~2 min incl. tunnel compiles).

CI (pytest) exercises the kernels in interpret mode only, so a Mosaic
regression would otherwise surface only at bench time (VERDICT r2 weak
#8). This drives, at N=2048:
- the flat VMEM-resident BSR kernel (fwd + grad),
- the panelled operator (forced 2-panel bounds),
- the halo_bsr shard kernel on a 1-device 'graph' mesh (shard_map +
  per-shard rectangular kernels + ring-exchange plumbing),
- the fused gated-layer kernels (fwd + bwd; off-default but must stay
  compilable).
Each output is checked against the XLA segment-sum oracle.

Run: `python smoke_tpu.py` — part of the /verify recipe
(.claude/skills/verify/SKILL.md).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from chromegcn_tpu.data.synthetic import make_hic_edges
    from chromegcn_tpu.ops import spmm as spmm_mod
    from chromegcn_tpu.ops.gcn_fused import fused_gated_layer
    from chromegcn_tpu.ops.sparse import build_chrom_graph
    from chromegcn_tpu.ops.spmm_pallas import (
        attach_bsr,
        bsr_panels_from_graph,
        spmm_pallas,
    )
    from chromegcn_tpu.parallel.graph import (
        attach_shard_bsr,
        partition_graph,
        sharded_spmm,
    )
    from chromegcn_tpu.parallel.mesh import make_mesh

    print(f"backend: {jax.default_backend()}", flush=True)
    # the kernels run HIGHEST-precision dots internally; the XLA oracles
    # must match (TPU's DEFAULT is a single bf16 pass, ~1e-2 off)
    jax.config.update("jax_default_matmul_precision", "highest")
    n_valid, n_pad, d = 2000, 2048, 128
    s, r, v = make_hic_edges(n_valid, 10_000, seed=0)
    graph = build_chrom_graph("hic", n_valid=n_valid, n_pad=n_pad,
                              hic_edges=(s, r, v))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n_pad, d)).astype(np.float32))
    ref = jax.jit(spmm_mod.spmm_xla)(graph, x)
    scale = float(jnp.max(jnp.abs(ref)))

    def check(name, out, expect=None, tol=1e-4):
        expect = ref if expect is None else expect
        err = float(jnp.max(jnp.abs(out - expect)))
        assert err < tol * max(1.0, scale), (name, err)
        print(f"  {name}: max-abs err {err:.2e} OK", flush=True)

    t0 = time.time()
    g_flat = attach_bsr(graph)
    check("flat kernel fwd", jax.jit(spmm_pallas)(g_flat.bsr, x))
    gfun = jax.jit(jax.grad(lambda xx, op, w: jnp.sum(spmm_pallas(op, xx) * w)))
    gref = jax.jit(jax.grad(lambda xx, gr, w: jnp.sum(spmm_mod.spmm_xla(gr, xx) * w)))
    check(
        "flat kernel grad",
        gfun(x, g_flat.bsr, ref),
        expect=gref(x, graph, ref),
    )

    panel_op = bsr_panels_from_graph(graph, d_model=d, bounds=(0, 1024, 2048))
    check("panel kernel fwd", jax.jit(spmm_pallas)(panel_op, x))

    from chromegcn_tpu.ops.spmm_hybrid import hybrid_from_graph, spmm_hybrid

    hyb_op = hybrid_from_graph(graph, dense_region_edges=32)
    check("hybrid tile+gather fwd", jax.jit(spmm_hybrid)(hyb_op, x))
    ghyb = jax.jit(jax.grad(lambda xx, op, w_: jnp.sum(spmm_hybrid(op, xx) * w_)))
    check(
        "hybrid tile+gather grad",
        ghyb(x, hyb_op, ref),
        expect=gref(x, graph, ref),
    )

    mesh = make_mesh(1, axis="graph")
    pg = attach_shard_bsr(partition_graph(graph, 1))
    out_sh = jax.jit(
        lambda xx: sharded_spmm(pg, xx, mesh, axis="graph", strategy="halo_bsr")
    )(x)
    check("halo_bsr shard kernel (1-dev mesh)", out_sh)

    w = jnp.asarray(rng.normal(size=(d, d)).astype(np.float32) * 0.1)
    b = jnp.asarray(np.zeros(d, np.float32))
    u = jnp.asarray(rng.normal(size=(d, 1)).astype(np.float32) * 0.1)
    bu = jnp.asarray(np.zeros(1, np.float32))
    xn, z, g = jax.jit(fused_gated_layer)(g_flat.bsr, x, w, b, u, bu)
    z_ref = jnp.tanh(spmm_mod.spmm_xla(graph, x @ w) + b)
    check("fused fwd kernel", z, expect=z_ref)
    gfit = jax.jit(
        jax.grad(lambda xx: jnp.sum(fused_gated_layer(g_flat.bsr, xx, w, b, u, bu)[0]))
    )
    grft = jax.jit(
        jax.grad(
            lambda xx: jnp.sum(
                (lambda zz, gg: (1 - gg) * xx + gg * zz)(
                    jnp.tanh(spmm_mod.spmm_xla(graph, xx @ w) + b),
                    jax.nn.sigmoid(
                        jnp.tanh(spmm_mod.spmm_xla(graph, xx @ w) + b) @ u + bu
                    ),
                )
            )
        )
    )
    check("fused bwd kernel", gfit(x), expect=grft(x))

    # lax.scan LSTM paths on the real chip (VERDICT r3 weak 5: DanQ /
    # ChromeRNN previously had CPU goldens only): one compiled train step
    # each, asserting a finite loss — the Mosaic/XLA-TPU compile itself is
    # what CI can't cover.
    from chromegcn_tpu.data.constants import SRC_VOCAB
    from chromegcn_tpu.models.chrome import ChromeRNN
    from chromegcn_tpu.models.window import make_window_model
    from chromegcn_tpu.ops.seq import complement_permutation
    from chromegcn_tpu.train.finetune import chrome_train_step, create_chrome_state
    from chromegcn_tpu.train.optim import make_optimizer
    from chromegcn_tpu.train.pretrain import create_window_state, window_train_step

    danq = make_window_model("danq", n_targets=32, seq_length=500)
    wstate = create_window_state(
        danq, make_optimizer("adam", 1e-3), jax.random.PRNGKey(0), 500,
        SRC_VOCAB, batch_size=2,
    )
    toks = jnp.asarray(rng.integers(0, 4, size=(8, 500)).astype(np.int32))
    tgt = jnp.asarray((rng.random((8, 32)) < 0.2).astype(np.float32))
    comp = jnp.asarray(complement_permutation(SRC_VOCAB))
    _, loss, _ = window_train_step(
        wstate, toks, tgt, jnp.ones(8, bool), comp, jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(loss)), "danq loss"
    print(f"  danq train step (scan LSTM): loss {float(loss):.3f} OK", flush=True)

    rnn = ChromeRNN(nfeat=d, nclass=32, dropout=0.0)
    cstate = create_chrome_state(
        rnn, make_optimizer("adam", 1e-3), jax.random.PRNGKey(2), nfeat=d,
        n_nodes=256,
    )
    ctgt = jnp.asarray((rng.random((n_pad, 32)) < 0.2).astype(np.float32))
    _, loss, _ = chrome_train_step(cstate, x, x, graph, ctgt, jax.random.PRNGKey(3))
    assert np.isfinite(float(loss)), "chromernn loss"
    print(f"  chromernn train step (scan BiLSTM): loss {float(loss):.3f} OK",
          flush=True)
    print(f"SMOKE OK in {time.time() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
