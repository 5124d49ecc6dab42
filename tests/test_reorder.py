"""Node reordering: permutation correctness + occupancy accounting.

The measured RCM-on-Hi-C ablation (a 0.52x LOSS — genomic order is already
near-optimal, DESIGN.md §1) lives in DESIGN; these tests pin the machinery
it used: permutation equivariance of the SpMM, validity of the generated
orders, and that the streamed-element objective moves the right way.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chromegcn_tpu.data.synthetic import make_hic_edges
from chromegcn_tpu.ops import reorder, spmm, spmm_pallas
from chromegcn_tpu.ops.sparse import build_chrom_graph


@pytest.fixture(scope="module")
def graph():
    s, r, v = make_hic_edges(900, 4000, seed=3)
    return build_chrom_graph("hic", n_valid=900, n_pad=1024, hic_edges=(s, r, v))


def _random_order(graph, seed=0):
    rng = np.random.default_rng(seed)
    n_valid = int(np.asarray(graph.node_mask).sum())
    order = np.arange(graph.n_nodes, dtype=np.int32)
    order[:n_valid] = rng.permutation(n_valid).astype(np.int32)
    return order


def test_permute_graph_spmm_equivariance(graph):
    order = _random_order(graph)
    pg = reorder.permute_graph(graph, order)
    x = jax.random.normal(jax.random.PRNGKey(0), (graph.n_nodes, 16))
    y = spmm.spmm_xla(graph, x)
    y_perm = spmm.spmm_xla(pg, x[order])
    np.testing.assert_allclose(np.asarray(y_perm), np.asarray(y)[order], rtol=1e-6)


def test_permute_graph_pallas_parity(graph):
    order = reorder.rcm_permutation(graph)
    pg = spmm_pallas.attach_bsr(reorder.permute_graph(graph, order))
    x = jax.random.normal(jax.random.PRNGKey(1), (graph.n_nodes, 16))
    y_ref = spmm.spmm_xla(pg, x[order])
    y_pallas = spmm_pallas.spmm_pallas(pg.bsr, x[order])
    np.testing.assert_allclose(
        np.asarray(y_pallas), np.asarray(y_ref), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("maker", [reorder.rcm_permutation,
                                   reorder.degree_sort_permutation])
def test_generated_orders_are_valid(graph, maker):
    order = maker(graph)
    n_valid = int(np.asarray(graph.node_mask).sum())
    assert np.array_equal(np.sort(order[:n_valid]), np.arange(n_valid))
    assert np.array_equal(order[n_valid:], np.arange(n_valid, graph.n_nodes))
    # round trip through the inverse is the identity
    inv = reorder.inverse_permutation(order)
    assert np.array_equal(order[inv], np.arange(graph.n_nodes))


def test_permute_rejects_bad_orders(graph):
    bad = np.arange(graph.n_nodes); bad[0] = 1  # not a permutation
    with pytest.raises(ValueError):
        reorder.permute_graph(graph, bad)
    n_valid = int(np.asarray(graph.node_mask).sum())
    moves_tail = np.arange(graph.n_nodes)
    moves_tail[[0, n_valid]] = moves_tail[[n_valid, 0]]
    with pytest.raises(ValueError):
        reorder.permute_graph(graph, moves_tail)


def test_streamed_elements_objective_moves(graph):
    """A random shuffle destroys the genomic diagonal band -> must stream
    more block elements than genomic order (the DESIGN §1 ablation logic)."""
    base = reorder.streamed_block_elements(graph)
    shuffled = reorder.permute_graph(graph, _random_order(graph, seed=7))
    assert reorder.streamed_block_elements(shuffled) > base


def test_streamed_elements_counts_live_blocks_only():
    """Bucketing pads block lists to 128; the accounting must count the
    live grid steps, not the padded capacity."""
    s, r, v = make_hic_edges(120, 300, seed=0)
    g = build_chrom_graph("hic", n_valid=120, n_pad=128, hic_edges=(s, r, v))
    op = spmm_pallas.bsr_from_graph(g)
    acct = spmm_pallas.streamed_elements(op)["fwd"]
    lt, ls = (int(x) for x in np.asarray(op.fwd.live))
    assert acct["tile_elems"] == lt * spmm_pallas.TILES_PER_STEP * 128 * 128
    assert acct["strip_elems"] == ls * spmm_pallas.STRIPS_PER_STEP * 8 * 128
    # far below padded capacity (128-bucketed tiles would be 128*128*128)
    assert acct["block_elems"] < op.fwd.tiles.size + op.fwd.strips.size
