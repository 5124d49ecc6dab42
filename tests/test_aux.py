"""Aux subsystems: variant effects, expression labels, saliency, analysis,
summarize, profiling counters."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from chromegcn_tpu.analysis import saliency
from chromegcn_tpu.analysis.chord import chord_plot
from chromegcn_tpu.analysis.results import per_label_table, write_per_label_csv
from chromegcn_tpu.data.constants import SRC_VOCAB
from chromegcn_tpu.data.synthetic import make_window_dataset
from chromegcn_tpu.models.chrome import ChromeGCN
from chromegcn_tpu.models.window import Expecto
from chromegcn_tpu.ops.seq import complement_permutation
from chromegcn_tpu.ops.sparse import build_chrom_graph
from chromegcn_tpu.pipeline import expression, genome, variants
from chromegcn_tpu.train.optim import make_optimizer
from chromegcn_tpu.train.pretrain import create_window_state
from chromegcn_tpu.utils.profiling import Throughput
from chromegcn_tpu.utils.summarize import summarize_data


def test_variant_effect_scores(tmp_path):
    rng = np.random.default_rng(0)
    seq = "".join(rng.choice(list("acgt"), size=3000))
    fasta_path = str(tmp_path / "g.fa")
    genome.write_fasta(fasta_path, {"chr1": seq})
    fa = genome.Fasta(fasta_path)

    pos = 1500
    ref = seq[pos]
    alt = "a" if ref != "a" else "c"

    model = Expecto(n_targets=3, seq_length=500, d_model=8)
    state = create_window_state(
        model, make_optimizer("adam", 1e-3), jax.random.PRNGKey(0), 500, SRC_VOCAB
    )
    comp_map = jnp.asarray(complement_permutation(SRC_VOCAB))
    scores = variants.score_snp_table(
        state, comp_map, fa, [("chr1", pos, ref, alt)], extended=500
    )
    assert scores.shape == (1, 3)
    assert np.isfinite(scores).all()
    assert not np.allclose(scores, 0)  # the substitution must change predictions

    # probe: wrong ref allele is rejected
    import pytest

    wrong = "t" if ref != "t" else "g"
    with pytest.raises(ValueError, match="reference mismatch"):
        variants.variant_sequences(fa, "chr1", pos, wrong, alt, extended=500)


def test_expression_labels():
    vals = np.array([[10, 12, 11], [0.1, 0.2, 0.1], [5, 6, 5], [0.0, 0.0, 0.1]])
    expressed = expression.threshold_expression(vals, "median")
    assert expressed.tolist() == [1, 0, 1, 0]
    tss = expression.annotate_tss(
        np.array([100, 200]), np.array(["+", "-"]), np.array([150, 250])
    )
    assert tss.tolist() == [100, 250]
    labels = expression.tss_window_labels(
        np.array([0, 1000, 2000]), np.array([1500, 2500]), np.array([1, 1])
    )
    assert labels.tolist() == [0, 1, 1]


def _small_gcn():
    n, d = 32, 8
    graph = build_chrom_graph("constant", n_valid=n, n_pad=n)
    model = ChromeGCN(nfeat=d, nhid=d, nclass=4, dropout=0.0, layers=2)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(n, d)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, graph, train=False)
    return model, variables, x, graph


def test_saliency_and_gates():
    model, variables, x, graph = _small_gcn()
    sal = saliency.adjacency_saliency(model, variables, x, graph, target_label=1)
    assert sal.shape == graph.vals.shape
    assert np.isfinite(sal).all() and not np.allclose(sal, 0)
    g1, g2 = saliency.gate_values(model, variables, x, graph)
    assert g1.shape == (32, 1) and g2.shape == (32, 1)
    fs = saliency.feature_saliency(model, variables, x, graph, target_label=0)
    assert fs.shape == x.shape
    emb = saliency.refined_embeddings(model, variables, x, graph)
    assert emb.shape == x.shape


def test_chord_plot_writes_png(tmp_path):
    _, variables, x, graph = _small_gcn()
    out = chord_plot(graph, title="test", out_path=str(tmp_path / "chord.png"))
    assert os.path.exists(out)
    assert os.path.getsize(out) > 1000


def test_per_label_table_and_csv(tmp_path):
    rng = np.random.default_rng(0)
    targets = (rng.random((50, 3)) < 0.4).astype(float)
    preds = targets * 0.6 + rng.random((50, 3)) * 0.4
    table = per_label_table(preds, targets, ["a", "b", "c"])
    assert np.all(table["auroc"] > 0.5)
    path = str(tmp_path / "labels.csv")
    write_per_label_csv(path, preds, targets, ["a", "b", "c"])
    lines = open(path).read().splitlines()
    assert len(lines) == 4 and lines[0].startswith("label,")


def test_summarize_data():
    splits = {
        "train": make_window_dataset({"chr2": 10}, n_targets=4, seq_length=100, seed=0),
        "valid": make_window_dataset({"chr3": 6}, n_targets=4, seq_length=100, seed=1),
        "test": make_window_dataset({"chr1": 6}, n_targets=4, seq_length=100, seed=2),
    }
    stats = summarize_data(splits, verbose=lambda *a: None)
    assert stats["num_train"] == 10
    assert stats["mean_labels_per_sample"] >= 0
    assert stats["label_pearson"].shape == (4, 4)


def test_throughput_counter():
    t = Throughput()
    t.start()
    rates = t.step(edges=1000)
    assert rates["edges"] > 0
    assert "edges/s" in t.summary()


def test_analysis_plots(tmp_path):
    from chromegcn_tpu.analysis import plots

    rng = np.random.default_rng(0)
    targets = (rng.random((60, 5)) < 0.3).astype(float)
    preds = targets * 0.5 + rng.random((60, 5)) * 0.5
    fig = plots.plot_auroc(targets, preds, "cnn", str(tmp_path / "roc.png"))
    assert os.path.exists(tmp_path / "roc.png")
    fig = plots.plot_aupr(targets, preds, "cnn", save_path=str(tmp_path / "pr.png"))
    assert os.path.exists(tmp_path / "pr.png")

    base = rng.random(5)
    refined = base + rng.normal(0, 0.05, 5)
    plots.plot_comparison(base, refined, save_path=str(tmp_path / "cmp.png"))
    names = ["atf2tfbs", "e116-h3k4me3", "dnase", "foo", "bar"]
    plots.plot_label_difference(
        base, refined, names, degree_weights=rng.random(5),
        save_path=str(tmp_path / "diff.png"),
    )
    plots.violin_plot(
        {"cnn": rng.random(30), "gcn": rng.random(30)},
        save_path=str(tmp_path / "violin.png"),
    )
    for f in ("cmp.png", "diff.png", "violin.png"):
        assert os.path.exists(tmp_path / f)


def test_tf_knockout_matrix():
    from chromegcn_tpu.analysis.saliency import tf_knockout_matrix
    from chromegcn_tpu.data.synthetic import make_hic_edges

    n, d, L = 64, 8, 4
    rng = np.random.default_rng(0)
    s, r, v = make_hic_edges(n, 120, seed=0)
    g = build_chrom_graph("hic", n_valid=n, n_pad=n, hic_edges=(s, r, v))
    model = ChromeGCN(nfeat=d, nhid=d, nclass=L, dropout=0.0, layers=2, spmm_impl="xla")
    x_f = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    x_r = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x_f, g, train=False)
    targets = (rng.random((n, L)) < 0.4).astype(np.float32)

    mat = tf_knockout_matrix(model, variables, x_f, x_r, g, targets, range(L))
    assert mat.shape == (L, L)
    assert np.all(np.diag(mat) == 0.0)  # i == j skipped, as in the reference
    assert np.all(np.isfinite(mat))
    # knocking out contacts must change at least one pair's prediction
    assert np.any(mat != 0.0)


def test_mesh_helpers():
    from chromegcn_tpu.parallel.mesh import init_distributed, make_mesh_2d

    init_distributed()  # single host: must be a no-op
    mesh = make_mesh_2d(2, 4)
    assert mesh.shape == {"data": 2, "graph": 4}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        make_mesh_2d(4, 4)  # only 8 virtual devices in the test mesh


def test_init_distributed_never_touches_backend_first(monkeypatch):
    """jax.distributed.initialize must be callable before any backend query:
    init_distributed may not call jax.process_count()/jax.devices() before
    deciding (VERDICT r1: querying first silently initializes the local
    backend and breaks pod init)."""
    from chromegcn_tpu.parallel import mesh as pmesh

    calls = []

    def forbidden(*a, **k):
        raise AssertionError("backend query before jax.distributed.initialize")

    monkeypatch.setattr(jax, "process_count", forbidden)
    monkeypatch.setattr(jax, "devices", forbidden)
    monkeypatch.setattr(jax, "local_devices", forbidden, raising=False)
    monkeypatch.setattr(
        jax.distributed, "is_initialized", lambda: False, raising=False
    )
    monkeypatch.setattr(
        jax.distributed,
        "initialize",
        lambda **kw: calls.append(kw),
    )

    from jax._src import xla_bridge

    monkeypatch.setattr(xla_bridge, "backends_are_initialized", lambda: False)

    # single host, no env hints: pure no-op, backend untouched
    for var in ("COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES",
                "MEGASCALE_COORDINATOR_ADDRESS"):
        monkeypatch.delenv(var, raising=False)
    pmesh.init_distributed()
    assert calls == []

    # single-host worker list (this image sets "localhost"): still a no-op
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    pmesh.init_distributed()
    assert calls == []

    # pod-style env: initialize runs, still without backend queries
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host0,host1")
    pmesh.init_distributed()
    assert len(calls) == 1
    monkeypatch.delenv("TPU_WORKER_HOSTNAMES")
    monkeypatch.setenv("COORDINATOR_ADDRESS", "10.0.0.1:8476")
    pmesh.init_distributed()
    assert len(calls) == 2

    # already initialized by the launcher: no double-init
    monkeypatch.setattr(jax.distributed, "is_initialized", lambda: True)
    pmesh.init_distributed()
    assert len(calls) == 2

    # explicit args trigger initialize even without env vars
    monkeypatch.delenv("COORDINATOR_ADDRESS")
    monkeypatch.setattr(jax.distributed, "is_initialized", lambda: False)
    pmesh.init_distributed(
        coordinator_address="10.0.0.1:8476", num_processes=2, process_id=0
    )
    assert len(calls) == 3 and calls[2]["num_processes"] == 2

    # explicit args after the backend came up: loud failure, not silence
    monkeypatch.setattr(xla_bridge, "backends_are_initialized", lambda: True)
    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        pmesh.init_distributed(coordinator_address="10.0.0.1:8476")


def test_graph_coupled_generator_neighbor_only_labels():
    """neighbor_only_frac: the first frac*n targets fire on the neighbor
    condition ALONE (own presence ignored); the rest keep the own-AND-
    neighbor coupling; frac=0 reproduces the original construction."""
    import numpy as np

    from chromegcn_tpu.data.synthetic import make_graph_coupled_dataset

    kw = dict(n_targets=16, seq_length=300, seed=5)
    sp0, _ = make_graph_coupled_dataset({"train": {"chr2": 300}}, **kw)
    sp1, _ = make_graph_coupled_dataset(
        {"train": {"chr2": 300}}, neighbor_only_frac=0.5, **kw
    )
    t0, t1 = sp0["train"].targets, sp1["train"].targets
    # the coupled half is identical between the two runs (same rng stream)
    np.testing.assert_array_equal(t1[:, 8:], t0[:, 8:])
    # neighbor-only labels are a superset of the coupled version of the
    # same label (dropping the own-presence factor can only add positives)
    assert (t1[:, :8] >= t0[:, :8]).all()
    assert t1[:, :8].sum() > t0[:, :8].sum()
    # and carry higher prevalence (no own-presence filter)
    assert t1[:, :8].mean() > t1[:, 8:].mean()
