"""HiChIP contact extraction + per-label degree weights (reference
data/eqtl_data/HiChIP.py and scripts/analyze_results.py:226-267)."""

import numpy as np
import pytest

from chromegcn_tpu.analysis.results import label_degree_weights
from chromegcn_tpu.ops.sparse import build_chrom_graph
from chromegcn_tpu.pipeline import hichip


@pytest.fixture
def pairs_file(tmp_path):
    rows = [
        # intra-chrom, different 1kb bins -> kept
        ("r1", "chr1", "1499", "+", "chr1", "3200", "-", "0"),
        # banker's rounding: 1500 -> 2000 (ties to even), 2500 -> 2000
        ("r2", "chr1", "1500", "+", "chr1", "2500", "-", "0"),
        # same bin after rounding (distance 0 <= 10) -> dropped
        ("r3", "chr1", "5100", "+", "chr1", "5300", "-", "0"),
        # inter-chromosomal -> dropped
        ("r4", "chr1", "1000", "+", "chr2", "9000", "-", "0"),
        # second chromosome
        ("r5", "chr2", "100", "+", "chr2", "7800", "-", "0"),
        # malformed position -> skipped, not fatal
        ("r6", "chr2", "oops", "+", "chr2", "1000", "-", "0"),
        # duplicate of r1's bins (reversed order) for aggregation
        ("r7", "chr1", "3300", "+", "chr1", "1200", "-", "0"),
    ]
    path = tmp_path / "sample.allValidPairs"
    path.write_text("\n".join("\t".join(r) for r in rows) + "\n")
    return str(path)


def test_iter_intra_contacts_rounding_and_filters(pairs_file):
    got = list(hichip.iter_intra_contacts(pairs_file))
    # r2 is dropped: both positions round to 2000 (banker's) -> distance 0;
    # r3 same-bin, r4 inter-chrom, r6 malformed — all dropped.
    assert got == [
        ("chr1", 1000, 3000, 2000),  # r1: 1499 -> 1000, 3200 -> 3000
        ("chr2", 0, 8000, 8000),     # r5
        ("chr1", 3000, 1000, 2000),  # r7 (order preserved, not sorted)
    ]


def test_bankers_rounding_matches_reference():
    # the reference uses python round(pos, -3): ties go to the even 1kb bin
    assert round(1500, -3) == 2000
    assert round(2500, -3) == 2000
    assert round(500, -3) == 0


def test_extract_hichip_contacts_writes_per_chrom(pairs_file, tmp_path):
    out = tmp_path / "out"
    counts = hichip.extract_hichip_contacts(pairs_file, str(out))
    assert counts == {"chr1": 2, "chr2": 1}
    chr1 = (out / "chr1.allValidPairs").read_text().strip().splitlines()
    assert chr1 == ["1000\t3000\t2000", "3000\t1000\t2000"]
    chr2 = (out / "chr2.allValidPairs").read_text().strip().splitlines()
    assert chr2 == ["0\t8000\t8000"]


def test_hichip_edges_aggregates_binned_pairs(pairs_file):
    b1, b2, cnt = hichip.hichip_edges(pairs_file, "chr1")
    # r1 and r7 hit the same unordered bin pair (1, 3)
    assert b1.tolist() == [1] and b2.tolist() == [3]
    assert cnt.tolist() == [2.0]
    b1, b2, cnt = hichip.hichip_edges(pairs_file, "chr2")
    assert (b1.tolist(), b2.tolist(), cnt.tolist()) == ([0], [8], [1.0])
    b1, b2, cnt = hichip.hichip_edges(pairs_file, "chr3")
    assert len(b1) == 0


def test_hichip_edges_max_dist_filter(pairs_file):
    b1, _, _ = hichip.hichip_edges(pairs_file, "chr2", max_dist_bp=5000)
    assert len(b1) == 0  # the only chr2 contact spans 8000 bp


def test_label_degree_weights_matches_manual():
    # chromosome A: 4 valid nodes; edges with values >1 (clamped) and <1 (kept)
    sA = np.array([1, 2, 3, 0], np.int32)
    rA = np.array([0, 0, 1, 2], np.int32)
    vA = np.array([2.0, 0.5, 1.0, 3.0], np.float32)  # deg: [1.5, 1, 1, 0]
    gA = build_chrom_graph("hic", n_valid=4, n_pad=8, hic_edges=(sA, rA, vA),
                           row_normalize_values=False)
    # build_chrom_graph symmetrizes + adds self loops depending on flavor —
    # so compute the expected degrees from the graph itself:
    def degrees(g):
        n_edges = int(g.n_edges)
        deg = np.zeros(g.n_nodes)
        np.add.at(deg, np.asarray(g.receivers)[:n_edges],
                  np.minimum(np.asarray(g.vals)[:n_edges], 1.0))
        return deg

    tA = np.array([[1, 0], [1, 1], [0, 1], [0, 0]], np.float32)
    degA = degrees(gA)
    expected = np.array([
        (degA[0] + degA[1]) / 2.0,          # label 0 on nodes 0,1
        (degA[1] + degA[2]) / 2.0,          # label 1 on nodes 1,2
    ])
    got = label_degree_weights([gA], [tA])
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_label_degree_weights_multi_chrom_and_nan():
    s = np.array([1], np.int32); r = np.array([0], np.int32)
    v = np.array([1.0], np.float32)
    g1 = build_chrom_graph("hic", n_valid=2, n_pad=4, hic_edges=(s, r, v),
                           row_normalize_values=False)
    g2 = build_chrom_graph("hic", n_valid=2, n_pad=4, hic_edges=(s, r, v),
                           row_normalize_values=False)
    t1 = np.array([[1, 0, 0], [0, 0, 0]], np.float32)
    t2 = np.array([[1, 0, 0], [1, 0, 0]], np.float32)
    w = label_degree_weights([g1, g2], [t1, t2])
    assert np.isfinite(w[0])          # label 0 present on 3 nodes
    assert np.isnan(w[1]) and np.isnan(w[2])  # labels never positive -> NaN
    with pytest.raises(ValueError):
        label_degree_weights([g1], [t1, t2])


def test_hichip_to_graph_to_spmm_end_to_end(tmp_path):
    """D14 chained into the runtime: allValidPairs -> per-chrom binned
    contacts (banker's rounding) -> SparseGraph -> SpMM, plus RCM
    reordering (ops/reorder.py exists precisely for non-genomic contact
    maps like HiChIP) preserving the SpMM result under permutation."""
    import jax.numpy as jnp

    from chromegcn_tpu.ops import reorder
    from chromegcn_tpu.ops.sparse import build_chrom_graph
    from chromegcn_tpu.ops.spmm import spmm_xla

    rng = np.random.default_rng(0)
    n_bins = 40
    rows = []
    for i in range(600):
        b1, b2 = rng.integers(0, n_bins, 2)
        if b1 == b2:
            continue
        rows.append(
            ("r%d" % i, "chr9", str(int(b1) * 1000 + 100), "+",
             "chr9", str(int(b2) * 1000 + 100), "-", "0")
        )
    path = tmp_path / "big.allValidPairs"
    path.write_text("\n".join("\t".join(r) for r in rows) + "\n")

    b1, b2, cnt = hichip.hichip_edges(str(path), "chr9", resolution=1000)
    assert len(b1) > 50 and cnt.max() >= 1
    senders = np.concatenate([b1, b2]).astype(np.int32)
    receivers = np.concatenate([b2, b1]).astype(np.int32)
    vals = np.concatenate([cnt, cnt]).astype(np.float32)
    graph = build_chrom_graph(
        "hic", n_valid=n_bins, n_pad=64, hic_edges=(senders, receivers, vals)
    )
    x = jnp.asarray(rng.normal(size=(64, 8)).astype(np.float32))
    out = spmm_xla(graph, x)
    # row-normalized adjacency: valid connected rows sum to 1
    sums = np.asarray(spmm_xla(graph, jnp.ones((64, 1), jnp.float32)))[:, 0]
    assert np.allclose(sums[:n_bins], 1.0, atol=1e-5)
    assert out.shape == (64, 8)

    # RCM permutation: permuted graph + permuted features == permuted output
    order = reorder.rcm_permutation(graph)
    pg = reorder.permute_graph(graph, order)
    out_p = spmm_xla(pg, x[order])
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out)[order], rtol=1e-5, atol=1e-5
    )
