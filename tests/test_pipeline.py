"""Ingest pipeline: FASTA windows/peaks/labels/Hi-C graphs on synthetic raw
inputs — replaces reference data/ steps 1-7 + create_torch_data."""

import os

import numpy as np
import pytest

from chromegcn_tpu import native_bridge
from chromegcn_tpu.data import artifact
from chromegcn_tpu.pipeline import build, genome, hic


@pytest.fixture(scope="module")
def raw_world(tmp_path_factory):
    root = tmp_path_factory.mktemp("raw")
    rng = np.random.default_rng(0)
    bases = np.array(list("acgt"))
    contigs = {
        "chr1": "".join(rng.choice(bases, size=30_000)),
        "chr2": "".join(rng.choice(bases, size=40_000)),
        "chr3": "".join(rng.choice(bases, size=25_000)),
    }
    fasta_path = str(root / "genome.fa")
    genome.write_fasta(fasta_path, contigs)

    peak_dir = root / "peaks"
    peak_dir.mkdir()
    # two assays with peaks on known windows
    with open(peak_dir / "tf_a.narrowPeak", "w") as f:
        for chrom, start in [("chr1", 1200), ("chr1", 5400), ("chr2", 10100), ("chr3", 2100)]:
            f.write(f"{chrom}\t{start}\t{start + 400}\ttf_a\t0\t.\t0\t0\t0\t0\n")
    with open(peak_dir / "hm_b.narrowPeak", "w") as f:
        for chrom, start in [("chr1", 1300), ("chr2", 20500), ("chr2", 10050)]:
            f.write(f"{chrom}\t{start}\t{start + 300}\thm_b\t0\t.\t0\t0\t0\t0\n")

    hic_dir = root / "hic"
    hic_dir.mkdir()
    # contacts between chr1 peak windows (bins are window starts)
    with open(hic_dir / "chr1.RAWobserved", "w") as f:
        f.write("1000\t5000\t50.0\n")   # both are peak windows
        f.write("1000\t9000\t99.0\n")   # 9000 not a peak window -> dropped
        f.write("5000\t5000\t77.0\n")   # self -> dropped
    with open(hic_dir / "chr1.SQRTVCnorm", "w") as f:
        # norm values for bins 0..5 (1kb resolution)
        f.write("\n".join(["1.0"] * 10) + "\n")

    return {"fasta": fasta_path, "peaks": str(peak_dir), "hic": str(hic_dir), "root": str(root)}


def test_fasta_fetch_roundtrip(raw_world):
    fa = genome.Fasta(raw_world["fasta"])
    assert set(fa.contigs()) == {"chr1", "chr2", "chr3"}
    seq = fa.fetch("chr1", 100, 160)
    assert len(seq) == 60
    assert set(seq) <= set("acgt")
    # spot-check against full parse
    full = "".join(
        line.strip()
        for line in open(raw_world["fasta"])
        if not line.startswith(">")
    )[:30_000]
    assert fa.fetch("chr1", 123, 456) == full[123:456]


def test_build_dataset_contracts(raw_world):
    out_dir = os.path.join(raw_world["root"], "out")
    splits = build.build_dataset(
        raw_world["fasta"], raw_world["peaks"], out_dir, verbose=lambda *a: None
    )
    # chr1 is a test chrom, chr3 valid, chr2 train (reference split contract)
    assert set(np.unique(splits["test"].chroms)) == {"chr1"}
    assert set(np.unique(splits["valid"].chroms)) == {"chr3"}
    assert set(np.unique(splits["train"].chroms)) == {"chr2"}
    # windows with peaks only: chr1 peaks at 1200-1600 (win 1000), 5400-5800 (win 5000), 1300-1600
    assert splits["test"].starts.tolist() == [1000, 5000]
    # labels: window 1000 has tf_a + hm_b, window 5000 only tf_a
    tgt = splits["test"].targets
    vocab = splits["test"].tgt_vocab
    assert tgt[0, vocab["tf_a"]] == 1 and tgt[0, vocab["hm_b"]] == 1
    assert tgt[1, vocab["tf_a"]] == 1 and tgt[1, vocab["hm_b"]] == 0
    # tokens are 2000-long extended windows
    assert splits["test"].tokens.shape[1] == 2000
    # artifact round-trip
    loaded = artifact.load_dataset(os.path.join(out_dir, "dataset.npz"))
    np.testing.assert_array_equal(loaded["test"].tokens, splits["test"].tokens)


def test_fractional_overlap_threshold(raw_world):
    # a peak covering only 99bp of a 1000bp window fails -f 0.1
    w, p = native_bridge.intersect_fraction(
        np.array([0]), np.array([1000]), np.array([901]), np.array([1000]), 0.1
    )
    assert len(w) == 0
    w, p = native_bridge.intersect_fraction(
        np.array([0]), np.array([1000]), np.array([900]), np.array([1000]), 0.1
    )
    assert len(w) == 1


def test_build_hic_graphs(raw_world):
    out_dir = os.path.join(raw_world["root"], "out2")
    splits = build.build_dataset(
        raw_world["fasta"], raw_world["peaks"], out_dir, verbose=lambda *a: None
    )
    build.build_hic_graphs(
        splits, raw_world["hic"], out_dir, hicsize=10, hicnorm="SQRTVC",
        verbose=lambda *a: None,
    )
    path = hic.split_graph_paths(
        os.path.join(out_dir, "hic"), "test", "10", "SQRTVC"
    )
    edges = artifact.load_graph_edges(path)
    s, r, v = edges["chr1"]
    # only the (1000,5000) contact survives: windows 0<->1, symmetric
    assert sorted(zip(s.tolist(), r.tolist())) == [(0, 1), (1, 0)]
    np.testing.assert_array_equal(v, [1.0, 1.0])


def test_hic_norm_discards_zero_norm_bins(tmp_path):
    raw = tmp_path / "c.RAWobserved"
    raw.write_text("0\t1000\t100.0\n0\t2000\t10.0\n")
    b1, b2, v = native_bridge.hic_topk(
        str(raw), np.array([0, 1000, 2000]), k=5,
        norm=np.array([1.0, 0.0, 2.0]), resolution_bp=1000,
    )
    # bin 1000 has norm 0 -> contact discarded; 0-2000 kept with val 10/(1*2)
    assert b1.tolist() == [0] and b2.tolist() == [2000]
    np.testing.assert_allclose(v, [5.0])


def test_upsample_5kb_to_1kb():
    b1, b2, v = hic.upsample_contacts_5kb_to_1kb(
        np.array([5000]), np.array([20000]), np.array([2.0])
    )
    assert len(b1) == 25
    assert set(b1.tolist()) == {5000, 6000, 7000, 8000, 9000}
    assert set(b2.tolist()) == {20000, 21000, 22000, 23000, 24000}
    assert all(x == 2.0 for x in v)


def test_max_dist_cutoff(tmp_path):
    """Distance-thresholded graph variant (reference: data/7create_graph_old.py
    keeps only contacts within a genomic distance)."""
    raw = tmp_path / "c.RAWobserved"
    raw.write_text("0\t1000\t50.0\n0\t4000\t40.0\n1000\t4000\t30.0\n")
    starts = np.array([0, 1000, 4000])
    # no cutoff: all three pairs survive (symmetric -> 6 directed edges)
    s, r, v = hic.chrom_topk_edges(str(raw), starts, n_pairs=5)
    assert len(s) == 6
    # 2kb cutoff keeps only the 0<->1000 contact
    s, r, v = hic.chrom_topk_edges(str(raw), starts, n_pairs=5, max_dist_bp=2000)
    assert sorted(zip(s.tolist(), r.tolist())) == [(0, 1), (1, 0)]


def test_artifact_preserves_long_chrom_names(tmp_path):
    """Contig names longer than 8 chars must round-trip unclipped (a fixed
    "U8" dtype silently corrupted e.g. chr11_gl000202_random)."""
    from chromegcn_tpu.data.loader import WindowDataset

    name = "chr11_gl000202_random"
    ds = WindowDataset(
        tokens=np.zeros((3, 10), np.int32),
        targets=np.zeros((3, 2), np.uint8),
        chroms=np.asarray([name, name, "chr1"], dtype=object),
        starts=np.arange(3, dtype=np.int64),
        src_vocab={"a": 0}, tgt_vocab={"t": 0},
    )
    path = str(tmp_path / "ds.npz")
    artifact.save_dataset(path, {"train": ds})
    loaded = artifact.load_dataset(path)
    assert loaded["train"].chroms[0] == name


def test_min_dist_filter_is_pre_topk(tmp_path):
    """The old builder's min_distance_threshold applies while STREAMING —
    before top-k — so the k best are chosen among qualifying contacts
    (reference: data/7create_graph_old.py:166). A post-selection filter
    would instead pick the close high-value contact and then drop it."""
    raw = tmp_path / "c.RAWobserved"
    raw.write_text("0\t1000\t50.0\n0\t9000\t10.0\n")
    bins = np.array([0, 1000, 9000])
    for fn in (native_bridge.hic_topk, native_bridge._hic_topk_numpy):
        b1, b2, v = fn(str(raw), bins, 1, None, 1000, min_dist_bp=2000)
        assert (b1.tolist(), b2.tolist()) == ([0], [9000]), fn.__name__
        np.testing.assert_allclose(v, [10.0])
        # floor inclusive: dist == min_dist_bp survives
        b1, b2, v = fn(str(raw), bins, 2, None, 1000, min_dist_bp=1000)
        assert len(b1) == 2, fn.__name__


def test_max_dist_filter_is_pre_topk(tmp_path):
    raw = tmp_path / "c.RAWobserved"
    raw.write_text("0\t9000\t50.0\n0\t1000\t10.0\n")
    bins = np.array([0, 1000, 9000])
    for fn in (native_bridge.hic_topk, native_bridge._hic_topk_numpy):
        b1, b2, v = fn(str(raw), bins, 1, None, 1000, max_dist_bp=2000)
        assert (b1.tolist(), b2.tolist()) == ([0], [1000]), fn.__name__


def test_hic_topk_line_spanning_multiple_chunks(tmp_path):
    """The C++ reader streams 64 KB chunks; a line may span ANY number of
    chunk boundaries (a previous revision parsed carry+chunk as a complete
    line whenever the carry was non-empty, truncating lines crossing more
    than one boundary). parse_ll skips leading whitespace, so a >128 KB
    line of padding exercises the multi-chunk carry path exactly."""
    raw = tmp_path / "c.RAWobserved"
    long_line = " " * (3 * (1 << 16)) + "0\t1000\t50.0"
    raw.write_text("0\t2000\t10.0\n" + long_line + "\n0\t3000\t5.0")
    bins = np.array([0, 1000, 2000, 3000])
    for fn in (native_bridge.hic_topk, native_bridge._hic_topk_numpy):
        b1, b2, v = fn(str(raw), bins, 5, None, 1000)
        got = sorted(zip(b1.tolist(), b2.tolist(), v.tolist()))
        assert got == [(0, 1000, 50.0), (0, 2000, 10.0), (0, 3000, 5.0)], fn


def test_hic_topk_chunk_boundary_straddle(tmp_path):
    """Lines placed so a newline falls exactly at / just past the 64 KB
    chunk edge: native output must equal the numpy fallback regardless of
    where the boundaries land."""
    lines = []
    val = 1.0
    pos = 0
    # enough variety of line lengths to hit boundaries at many offsets
    for i in range(9000):
        b1 = i * 1000
        b2 = b1 + 1000 * (1 + i % 7)
        lines.append(f"{b1}\t{b2}\t{val + i * 0.5}")
        pos += 1
    text = "\n".join(lines) + "\n"
    raw = tmp_path / "c.RAWobserved"
    raw.write_text(text)
    assert len(text) > 2 * (1 << 16)  # spans several chunks
    bins = np.arange(0, 9000 * 1000 + 8000, 1000)
    n1, n2, nv = native_bridge._hic_topk_numpy(str(raw), bins, 50, None, 1000)
    c1, c2, cv = native_bridge.hic_topk(str(raw), bins, 50, None, 1000)
    assert sorted(zip(c1.tolist(), c2.tolist(), cv.tolist())) == sorted(
        zip(n1.tolist(), n2.tolist(), nv.tolist())
    )


def test_streaming_upsample_matches_materialized(tmp_path):
    """upsample_grid=5 in the streaming reader (native AND fallback) must
    equal the reference's materialize-then-stream flow (write the 25x dump
    via upsample_contacts_5kb_to_1kb, then read at grid=1)."""
    rng = np.random.default_rng(3)
    n_coarse = 40
    b1 = rng.integers(0, 12, size=n_coarse) * 5000
    b2 = rng.integers(0, 12, size=n_coarse) * 5000
    vals = rng.integers(1, 50, size=n_coarse).astype(float)
    raw = tmp_path / "k.RAWobserved"
    raw.write_text("".join(f"{a}\t{b}\t{c}\n" for a, b, c in zip(b1, b2, vals)))
    # materialized golden: expand, write, stream at grid=1
    ub1, ub2, uv = hic.upsample_contacts_5kb_to_1kb(b1, b2, vals)
    mat = tmp_path / "k.up"
    mat.write_text("".join(f"{a}\t{b}\t{c}\n" for a, b, c in zip(ub1, ub2, uv)))
    starts = np.arange(60, dtype=np.int64) * 1000
    norm = np.linspace(0.5, 1.5, 61)
    k = 200

    def canon(res):
        o1, o2, ov = res
        return sorted(zip(o1.tolist(), o2.tolist(), np.round(ov, 9).tolist()))

    golden = canon(native_bridge.hic_topk(str(mat), starts, k, norm=norm))
    got_native = canon(
        native_bridge.hic_topk(str(raw), starts, k, norm=norm, upsample_grid=5)
    )
    got_fallback = canon(
        native_bridge._hic_topk_numpy(str(raw), starts, k, norm, 1000,
                                      upsample_grid=5)
    )
    assert len(golden) > 0
    assert got_native == golden
    assert got_fallback == golden


def test_build_hic_graphs_upsample_5kb(tmp_path):
    """build_hic_graphs(upsample_5kb=True) end-to-end on a 5kb dump: the
    K562 recipe (reference README + data/extras/upsample_hic.py)."""
    from chromegcn_tpu.data.loader import WindowDataset
    from chromegcn_tpu.data import artifact as _art
    from chromegcn_tpu.pipeline.build import build_hic_graphs

    n = 30
    ds = WindowDataset(
        tokens=np.zeros((n, 4), np.int32),
        targets=np.ones((n, 2), np.uint8),
        chroms=np.asarray(["chr9"] * n, dtype=object),
        starts=np.arange(n, dtype=np.int64) * 1000,
        src_vocab={"a": 0}, tgt_vocab={"x": 0, "y": 1},
    )
    hic_dir = tmp_path / "hic"
    hic_dir.mkdir()
    (hic_dir / "chr9.RAWobserved").write_text("0\t10000\t7.0\n5000\t20000\t3.0\n")
    out = tmp_path / "out"
    build_hic_graphs({"train": ds}, str(hic_dir), str(out),
                     hicsize=400, hicnorm="", upsample_5kb=True,
                     verbose=lambda *a: None)
    edges = _art.load_graph_edges(
        str(out / "hic" / "train_graphs_400_norm.npz")
    )
    s, r, v = edges["chr9"]
    # contact (0,10000) expands to senders 0..4, receivers 10..14 (and the
    # symmetric direction); (5000,20000) to 5..9 x 20..24
    pairs = set(zip(s.tolist(), r.tolist()))
    assert (0, 10) in pairs and (4, 14) in pairs and (10, 0) in pairs
    assert (5, 20) in pairs and (9, 24) in pairs
    # 2 coarse contacts x 25 offsets x 2 directions, all within k=200
    assert len(s) == 100
