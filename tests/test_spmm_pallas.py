"""Block-sparse Pallas SpMM: parity vs XLA path (CPU interpret mode here;
the same kernel is exercised compiled on TPU by bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chromegcn_tpu.ops import sparse as cgs
from chromegcn_tpu.ops.spmm import spmm, spmm_xla
from chromegcn_tpu.ops.spmm_pallas import attach_bsr, bsr_from_graph


def _graph(n, density=0.03, seed=0, diag=True):
    rng = np.random.default_rng(seed)
    dense = (rng.random((n, n)) < density).astype(np.float32)
    dense *= rng.random((n, n)).astype(np.float32)
    if diag:
        np.fill_diagonal(dense, 1.0)
    return cgs.from_dense(dense), dense


@pytest.mark.parametrize("n", [512, 1024])
def test_bsr_matches_xla(n):
    g, dense = _graph(n)
    g = attach_bsr(g, tile=256, min_edges_per_tile=8)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(n, 128)).astype(np.float32))
    out_p = np.asarray(spmm(g, x, impl="pallas"))
    out_x = np.asarray(spmm_xla(g, x))
    np.testing.assert_allclose(out_p, out_x, rtol=1e-4, atol=1e-4)


def test_bsr_all_edges_in_remainder():
    """min_edges_per_tile high -> no dense tiles at all; every edge flows
    through the (8 x 128) strip population."""
    g, dense = _graph(512, density=0.01, seed=2)
    g = attach_bsr(g, tile=256, min_edges_per_tile=10**9)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(512, 128)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(spmm(g, x, impl="pallas")),
        np.asarray(spmm_xla(g, x)),
        rtol=1e-4, atol=1e-4,
    )


def test_bsr_gradient_is_transpose_spmm():
    n = 512
    g, dense = _graph(n, seed=4)
    g = attach_bsr(g, tile=256, min_edges_per_tile=8)
    x = jnp.asarray(np.random.default_rng(5).normal(size=(n, 128)).astype(np.float32))
    ct = np.random.default_rng(6).normal(size=(n, 128)).astype(np.float32)

    def f(x):
        return jnp.sum(spmm(g, x, impl="pallas") * ct)

    gx = np.asarray(jax.grad(f)(x))
    np.testing.assert_allclose(gx, dense.T @ ct, rtol=1e-4, atol=1e-3)


def test_bsr_auto_dispatch():
    """impl='auto' uses the pallas path when BSR is attached, XLA otherwise."""
    g, _ = _graph(512, seed=7)
    x = jnp.asarray(np.random.default_rng(8).normal(size=(512, 128)).astype(np.float32))
    out_plain = spmm(g, x, impl="auto")  # no bsr -> xla
    g2 = attach_bsr(g, tile=256, min_edges_per_tile=8)
    out_bsr = spmm(g2, x, impl="auto")
    np.testing.assert_allclose(
        np.asarray(out_plain), np.asarray(out_bsr), rtol=1e-4, atol=1e-4
    )


def test_bsr_requires_tile_aligned_nodes():
    g, _ = _graph(300, seed=9)
    with pytest.raises(ValueError):
        bsr_from_graph(g, tile=256)


def test_bsr_under_jit_with_attached_graph():
    g, dense = _graph(512, seed=10)
    g = attach_bsr(g, tile=256, min_edges_per_tile=8)
    x = jnp.asarray(np.random.default_rng(11).normal(size=(512, 128)).astype(np.float32))

    @jax.jit
    def f(g, x):
        return spmm(g, x, impl="pallas")

    np.testing.assert_allclose(
        np.asarray(f(g, x)), dense @ np.asarray(x), rtol=1e-4, atol=1e-4
    )


def test_bsr_bf16_fast_mode_close_to_f32():
    g, dense = _graph(512, seed=12)
    g16 = attach_bsr(g, tile=256, min_edges_per_tile=8, dtype="bfloat16")
    x = jnp.asarray(np.random.default_rng(13).normal(size=(512, 128)).astype(np.float32))
    out16 = np.asarray(spmm(g16, x, impl="pallas"))
    ref = dense @ np.asarray(x)
    # bf16 tiles + bf16 x: ~0.4% relative tolerance
    np.testing.assert_allclose(out16, ref, rtol=2e-2, atol=5e-2)


def test_bsr_auto_split_rule():
    """'auto' (the default) picks the cost-optimal tile/strip split:
    parity must hold and the split must follow the measured break-even
    (densify iff occupied 8-row strips >= AUTO_BREAKEVEN_STRIPS)."""
    from chromegcn_tpu.ops import spmm_pallas as sp

    # a graph with one genuinely dense 128x128 region and scattered rest
    n = 512
    rng = np.random.default_rng(20)
    dense = np.zeros((n, n), np.float32)
    dense[:128, :128] = (rng.random((128, 128)) < 0.5) * rng.random((128, 128))
    scat = (rng.random((n, n)) < 0.002) * rng.random((n, n))
    dense[128:, :] = scat[128:, :]
    np.fill_diagonal(dense, 1.0)
    g = cgs.from_dense(dense)

    op = bsr_from_graph(g, tile=128)  # default min_edges_per_tile='auto'
    # the dense corner occupies all 16 strip slots -> must be a tile
    assert int((np.asarray(op.fwd.tiles) != 0).any(axis=(1, 2)).sum()) >= 1
    x = jnp.asarray(rng.normal(size=(n, 128)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(spmm(g.replace(bsr=op), x, impl="pallas")),
        dense @ np.asarray(x),
        rtol=1e-4,
        atol=1e-4,
    )

    # a single 8-row band occupies 1 strip slot per region < break-even
    # -> strips only (note: a diagonal occupies all 16 slots -> tile)
    band = np.zeros((256, 256), np.float32)
    band[:8, :] = 1.0
    g_band = cgs.from_dense(band)
    op_band = bsr_from_graph(g_band, tile=128)
    assert not (np.asarray(op_band.fwd.tiles) != 0).any()
    x2 = jnp.asarray(rng.normal(size=(256, 128)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(spmm(g_band.replace(bsr=op_band), x2, impl="pallas")),
        band @ np.asarray(x2),
        rtol=1e-4,
        atol=1e-4,
    )


@pytest.mark.slow
def test_bsr_panels_match_xla_forward_and_grad():
    """Panelled operator (for graphs beyond the VMEM-resident budget):
    forward and gradient must match the flat path / dense reference for an
    uneven 3-panel split."""
    from chromegcn_tpu.ops.spmm_pallas import bsr_panels_from_graph

    n = 640
    g, dense = _graph(n, density=0.02, seed=30)
    op = bsr_panels_from_graph(
        g, tile=128, bounds=(0, 256, 512, 640)
    )
    gp = g.replace(bsr=op)
    x = jnp.asarray(np.random.default_rng(31).normal(size=(n, 128)).astype(np.float32))
    out = np.asarray(spmm(gp, x, impl="pallas"))
    np.testing.assert_allclose(out, dense @ np.asarray(x), rtol=1e-4, atol=1e-4)

    ct = np.random.default_rng(32).normal(size=(n, 128)).astype(np.float32)

    def f(x):
        return jnp.sum(spmm(gp, x, impl="pallas") * ct)

    gx = np.asarray(jax.grad(f)(jnp.asarray(x)))
    np.testing.assert_allclose(gx, dense.T @ ct, rtol=1e-4, atol=1e-3)


def test_bsr_panels_skip_empty_and_jit():
    """Blocks land only on populated panels; empty row panels produce zero
    rows; jit with the operator as a pytree arg works."""
    from chromegcn_tpu.ops.spmm_pallas import bsr_panels_from_graph

    n = 512
    dense = np.zeros((n, n), np.float32)
    dense[:128, :128] = np.eye(128, dtype=np.float32)  # only panel (0, 0)
    g = cgs.from_dense(dense)
    op = bsr_panels_from_graph(g, tile=128, bounds=(0, 256, 512))
    assert op.fwd_coords == ((0, 0),)
    x = jnp.asarray(np.random.default_rng(33).normal(size=(n, 128)).astype(np.float32))

    @jax.jit
    def f(op, x):
        return spmm(g.replace(bsr=op), x, impl="pallas")

    out = np.asarray(f(op, x))
    np.testing.assert_allclose(out[:128], np.asarray(x)[:128], rtol=1e-5, atol=1e-5)
    assert (out[128:] == 0).all()


@pytest.mark.slow
def test_attach_bsr_auto_panels_oversized():
    """attach_bsr switches to the panelled form when 2*N*d exceeds the
    VMEM-resident budget (simulated via a tiny d_model budget override)."""
    from chromegcn_tpu.ops import spmm_pallas as sp

    g, dense = _graph(512, seed=34)
    g2 = attach_bsr(g, tile=128, d_model=sp._VMEM_RESIDENT_BYTES // (2 * 512))
    assert isinstance(g2.bsr, sp.BSRPanelOperator)
    x = jnp.asarray(np.random.default_rng(35).normal(size=(512, 64)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(spmm(g2, x, impl="pallas")), dense @ np.asarray(x),
        rtol=1e-4, atol=1e-4,
    )
