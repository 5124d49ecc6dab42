"""Graph construction parity vs scipy implementations of the reference equations."""

import numpy as np
import pytest
import scipy.sparse as sp

from chromegcn_tpu.ops import sparse as cgs
from chromegcn_tpu.ops.spmm import spmm


def _ref_normalize(mx):
    """Row-normalize exactly as reference utils/util_methods.py:99-106."""
    rowsum = np.array(mx.sum(1)).astype(float)
    with np.errstate(divide="ignore"):
        r_inv = np.power(rowsum, -1).flatten()
    r_inv[np.isinf(r_inv)] = 0.0
    return sp.diags(r_inv).dot(mx)


def _ref_constant_graph(constant_range, x_size):
    """Reference utils/util_methods.py:137-144 semantics."""
    diagonals, indices = [], []
    for i in range(-constant_range, constant_range + 1):
        if i != 0:
            diagonals.append(np.ones(x_size - abs(i)))
            indices.append(i)
    return sp.diags(diagonals, indices).tocoo()


def _dense(graph):
    return np.asarray(cgs.to_dense(graph))


def _random_sym_hic(n, n_pairs, seed=0):
    rng = np.random.default_rng(seed)
    i = rng.integers(0, n, size=n_pairs)
    j = rng.integers(0, n, size=n_pairs)
    keep = i != j
    i, j = i[keep], j[keep]
    s = np.concatenate([i, j]).astype(np.int32)
    r = np.concatenate([j, i]).astype(np.int32)
    # Binary symmetric contacts like reference data/7create_graph_new.py:108-120
    dense = np.zeros((n, n), dtype=np.float32)
    dense[r, s] = 1.0
    rr, ss = np.nonzero(dense)
    return ss.astype(np.int32), rr.astype(np.int32), dense[rr, ss], dense


@pytest.mark.parametrize("n", [13, 64])
def test_constant_graph_matches_reference(n):
    ref = _ref_constant_graph(7, n)
    ref = ref + sp.eye(n)
    ref = _ref_normalize(ref).toarray()

    g = cgs.build_chrom_graph("constant", n_valid=n, n_pad=n)
    np.testing.assert_allclose(_dense(g), ref, rtol=1e-6, atol=1e-7)


def test_hic_graph_matches_reference():
    n = 50
    s, r, v, dense = _random_sym_hic(n, 120)
    ref = sp.coo_matrix(dense) + sp.eye(n)
    ref = ref.tocsr()
    ref[ref > 0] = 1
    ref[ref < 0] = 0
    ref = _ref_normalize(ref).toarray()

    g = cgs.build_chrom_graph("hic", n_valid=n, n_pad=n, hic_edges=(s, r, v))
    np.testing.assert_allclose(_dense(g), ref, rtol=1e-6, atol=1e-7)


def test_both_graph_matches_reference():
    n = 40
    s, r, v, dense = _random_sym_hic(n, 60, seed=3)
    ref = sp.coo_matrix(dense) + _ref_constant_graph(7, n) + sp.eye(n)
    ref = _ref_normalize(ref).toarray()

    g = cgs.build_chrom_graph("both", n_valid=n, n_pad=n, hic_edges=(s, r, v))
    np.testing.assert_allclose(_dense(g), ref, rtol=1e-6, atol=1e-7)


def test_none_graph_is_identity():
    g = cgs.build_chrom_graph("none", n_valid=9, n_pad=16)
    dense = _dense(g)
    np.testing.assert_allclose(dense[:9, :9], np.eye(9), atol=0)
    assert dense[9:, :].sum() == 0


def test_row_normalize_zero_row_guard():
    """Rows with zero degree must stay all-zero (util_methods.py:103 guard)."""
    dense = np.zeros((8, 8), dtype=np.float32)
    dense[0, 1] = 2.0
    dense[0, 2] = 2.0
    # row 3 empty
    g = cgs.from_dense(dense)
    g = cgs.row_normalize(g)
    out = _dense(g)
    np.testing.assert_allclose(out[0, 1], 0.5, rtol=1e-6)
    assert np.all(out[3] == 0)


def test_padding_edges_are_noops():
    n_valid, n_pad = 10, 16
    g = cgs.build_chrom_graph("constant", n_valid=n_valid, n_pad=n_pad, edge_capacity=4096)
    x = np.random.default_rng(0).normal(size=(n_pad, 8)).astype(np.float32)
    out = np.asarray(spmm(g, x, impl="xla"))
    # padded rows receive nothing
    assert np.all(out[n_valid:] == 0)
    # dense reference over valid block
    dense = _dense(g)
    np.testing.assert_allclose(out, dense @ x, rtol=1e-5, atol=1e-5)


def test_coalesce_sums_duplicates():
    s = np.array([1, 1, 2], dtype=np.int32)
    r = np.array([0, 0, 0], dtype=np.int32)
    v = np.array([1.0, 2.0, 5.0], dtype=np.float32)
    cs, cr, cv = cgs.coalesce_coo(s, r, v, n_nodes=4)
    assert len(cs) == 2
    assert cv[list(cs).index(1)] == 3.0
