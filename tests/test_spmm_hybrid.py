"""Hybrid tile+gather SpMM (ops/spmm_hybrid.py): parity vs the dense
reference on CPU; the compiled form is exercised on TPU by bench_hybrid.py
(HYBRID_r05.json). The hybrid form targets the reference's ultra-sparse
full-chromosome graphs (reference: finetune.py:29-44 — chr1 @ 1kb is
~249k windows at density ~1.5e-5), where the BSR strip path is per-block
overhead bound."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chromegcn_tpu.ops import sparse as cgs
from chromegcn_tpu.ops import spmm_hybrid as hy
from chromegcn_tpu.ops.spmm import spmm


def _graph(n, density, seed=0, diag=False):
    rng = np.random.default_rng(seed)
    dense = (rng.random((n, n)) < density).astype(np.float32)
    dense *= rng.random((n, n)).astype(np.float32)
    if diag:
        np.fill_diagonal(dense, 1.0)
    return cgs.from_dense(dense), dense


def test_hybrid_parity_with_dense_regions():
    """density 0.03 puts ~490 edges in every 128x128 region >= the 96-edge
    threshold -> the tile path must carry them, and parity must hold."""
    n = 512
    g, dense = _graph(n, density=0.03, seed=1, diag=True)
    op = hy.hybrid_from_graph(g)
    assert op.dense is not None
    x = jnp.asarray(np.random.default_rng(2).normal(size=(n, 128)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(hy.spmm_hybrid(op, x)), dense @ np.asarray(x),
        rtol=1e-4, atol=1e-4,
    )


def test_hybrid_pure_gather_when_no_dense_region():
    n = 512
    g, dense = _graph(n, density=0.002, seed=3)
    op = hy.hybrid_from_graph(g)
    assert op.dense is None
    x = jnp.asarray(np.random.default_rng(4).normal(size=(n, 64)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(hy.spmm_hybrid(op, x)), dense @ np.asarray(x),
        rtol=1e-4, atol=1e-4,
    )


def test_hybrid_gradient_is_transpose_spmm():
    n = 512
    g, dense = _graph(n, density=0.01, seed=5, diag=True)
    op = hy.hybrid_from_graph(g, dense_region_edges=32)
    x = jnp.asarray(np.random.default_rng(6).normal(size=(n, 128)).astype(np.float32))
    ct = np.random.default_rng(7).normal(size=(n, 128)).astype(np.float32)

    def f(x):
        return jnp.sum(hy.spmm_hybrid(op, x) * ct)

    gx = np.asarray(jax.grad(f)(x))
    np.testing.assert_allclose(gx, dense.T @ ct, rtol=1e-4, atol=1e-3)


def test_hybrid_under_jit_and_model_dispatch():
    """The operator rides graph.bsr through ops.spmm's impl='pallas'
    dispatch (the route models/chrome.py takes), as a jit argument."""
    n = 512
    g, dense = _graph(n, density=0.004, seed=8, diag=True)
    g = g.replace(bsr=hy.hybrid_from_graph(g))

    @jax.jit
    def f(g, x):
        return spmm(g, x, impl="pallas")

    x = jnp.asarray(np.random.default_rng(9).normal(size=(n, 128)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(f(g, x)), dense @ np.asarray(x), rtol=1e-4, atol=1e-4
    )


def test_attach_auto_picks_hybrid_for_ultrasparse():
    """Scattered ultra-sparse graph: the strip population would be ~one
    strip per edge, so the cost model must route to the hybrid form."""
    n = 2048
    g, dense = _graph(n, density=0.001, seed=10, diag=True)
    g2 = hy.attach_auto(g)
    assert isinstance(g2.bsr, hy.HybridOperator)
    x = jnp.asarray(np.random.default_rng(11).normal(size=(n, 128)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(spmm(g2, x, impl="pallas")), dense @ np.asarray(x),
        rtol=1e-4, atol=1e-4,
    )


def test_attach_auto_keeps_bsr_for_diagonal_dominant():
    """A banded near-diagonal graph (the bucketed 2048-window regime where
    the BSR kernel is the measured winner) must stay on the BSR form."""
    from chromegcn_tpu.ops import spmm_pallas as sp

    g = cgs.build_chrom_graph("constant", n_valid=2048, n_pad=2048)
    g2 = hy.attach_auto(g)
    assert isinstance(g2.bsr, (sp.BSROperator, sp.BSRPanelOperator))


def test_hybrid_strand_stacked_feature_width():
    """SpMM is linear over the feature axis, so the (N, s*d) strand-stacked
    reshape (models/chrome.py) must pass through unchanged at d=256."""
    n = 256
    g, dense = _graph(n, density=0.005, seed=12, diag=True)
    op = hy.hybrid_from_graph(g)
    x = jnp.asarray(np.random.default_rng(13).normal(size=(n, 256)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(hy.spmm_hybrid(op, x)), dense @ np.asarray(x),
        rtol=1e-4, atol=1e-4,
    )


def test_estimate_costs_counts():
    """Cost model inputs: straggler/dense-tile counts must reflect the
    partition hybrid_from_graph actually makes."""
    n = 512
    g, dense = _graph(n, density=0.03, seed=14)  # every region dense
    c = hy.estimate_costs_ns(g)
    assert c["n_straggler_edges"] == 0
    assert c["n_dense_tiles"] == 16  # all (128x128) regions of a 512 grid

    g2, _ = _graph(n, density=0.002, seed=15)  # nothing dense
    c2 = hy.estimate_costs_ns(g2)
    assert c2["n_dense_tiles"] == 0
    assert c2["n_straggler_edges"] == int(g2.n_edges)
