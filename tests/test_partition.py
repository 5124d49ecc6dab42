"""Edge-partition invariance: sharded SpMM == single-device SpMM for any
partition (SURVEY §4 distributed test contract), on the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chromegcn_tpu.ops import sparse as cgs
from chromegcn_tpu.ops.spmm import spmm_xla
from chromegcn_tpu.parallel.graph import partition_graph, sharded_spmm
from chromegcn_tpu.parallel.mesh import make_mesh


def _graph(n, density=0.05, seed=0):
    rng = np.random.default_rng(seed)
    dense = (rng.random((n, n)) < density).astype(np.float32)
    dense *= rng.random((n, n)).astype(np.float32)
    return cgs.from_dense(dense), dense


@pytest.mark.parametrize("n_shards", [2, 4, 8])
@pytest.mark.parametrize("strategy", ["all_gather", "halo"])
def test_sharded_spmm_matches_single_device(n_shards, strategy):
    n, d = 64, 16
    graph, dense = _graph(n)
    x = np.random.default_rng(1).normal(size=(n, d)).astype(np.float32)

    expected = np.asarray(spmm_xla(graph, jnp.asarray(x)))

    mesh = make_mesh(n_shards, axis="graph")
    pg = partition_graph(graph, n_shards)
    out = sharded_spmm(pg, jnp.asarray(x), mesh, axis="graph", strategy=strategy)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("n_shards", [1, 2, 8])
def test_halo_bsr_matches_single_device(n_shards):
    """halo exchange feeding the per-shard Pallas BSR kernels == single-device
    SpMM (forward AND gradient — the custom VJP must route d(halo) = A_halo^T g
    back through the all_to_all transpose). n_shards=1 exercises the
    empty-halo-operator edge case of the local/halo split."""
    from chromegcn_tpu.parallel.graph import attach_shard_bsr

    n, d = 1024, 8  # rows_per_shard must be a multiple of the 128 tile
    graph, dense = _graph(n, density=0.01, seed=2)
    x = np.random.default_rng(1).normal(size=(n, d)).astype(np.float32)

    expected = np.asarray(spmm_xla(graph, jnp.asarray(x)))
    mesh = make_mesh(n_shards, axis="graph")
    pg = attach_shard_bsr(partition_graph(graph, n_shards))
    out = sharded_spmm(pg, jnp.asarray(x), mesh, axis="graph", strategy="halo_bsr")
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5, atol=1e-5)

    # gradient: d/dx sum(A x * w) = A^T w for a fixed weight matrix w
    w = np.random.default_rng(2).normal(size=(n, d)).astype(np.float32)
    g_ref = jax.grad(
        lambda xx: jnp.sum(spmm_xla(graph, xx) * w)
    )(jnp.asarray(x))
    g_sh = jax.grad(
        lambda xx: jnp.sum(
            sharded_spmm(pg, xx, mesh, axis="graph", strategy="halo_bsr") * w
        )
    )(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_ref), rtol=1e-5, atol=1e-5)


def test_sharded_graph_dispatch_and_train_step_parity():
    """ops.spmm routes a ShardedGraph to the shard_map path, and the REAL
    chrome_train_step produces the same loss/update as single-device."""
    from chromegcn_tpu.models.chrome import ChromeGCN
    from chromegcn_tpu.ops.spmm import spmm
    from chromegcn_tpu.parallel.graph import shard_graph
    from chromegcn_tpu.parallel.mesh import node_sharding
    from chromegcn_tpu.train.finetune import chrome_train_step, create_chrome_state
    from chromegcn_tpu.train.optim import make_optimizer

    n, d, ncls = 1024, 16, 6
    graph, _ = _graph(n, density=0.01, seed=4)
    mesh = make_mesh(8, axis="graph")
    sg = shard_graph(graph, mesh, strategy="halo")

    x = jnp.asarray(np.random.default_rng(0).normal(size=(n, d)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(spmm(sg, x)), np.asarray(spmm_xla(graph, x)),
        rtol=1e-5, atol=1e-5,
    )

    rng = jax.random.PRNGKey(0)
    nprng = np.random.default_rng(1)
    model = ChromeGCN(nfeat=d, nhid=d, nclass=ncls, dropout=0.0, layers=2)
    x_f = nprng.normal(size=(n, d)).astype(np.float32)
    x_r = nprng.normal(size=(n, d)).astype(np.float32)
    targets = (nprng.random((n, ncls)) < 0.3).astype(np.float32)

    st1 = create_chrome_state(model, make_optimizer("sgd", 0.25), rng, nfeat=d, n_nodes=128)
    st1, loss1, probs1 = chrome_train_step(
        st1, jnp.asarray(x_f), jnp.asarray(x_r), graph, jnp.asarray(targets), rng
    )
    ns = node_sharding(mesh)
    st8 = create_chrome_state(model, make_optimizer("sgd", 0.25), rng, nfeat=d, n_nodes=128)
    st8, loss8, probs8 = chrome_train_step(
        st8,
        jax.device_put(x_f, ns), jax.device_put(x_r, ns),
        sg, jax.device_put(targets, ns), rng,
    )
    np.testing.assert_allclose(float(loss8), float(loss1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(probs8), np.asarray(probs1), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(st8.params["GC1"]["weight"]),
        np.asarray(st1.params["GC1"]["weight"]),
        rtol=1e-4, atol=1e-6,
    )


def test_partition_preserves_masks_and_edges():
    n = 32
    graph, dense = _graph(n, density=0.2, seed=3)
    pg = partition_graph(graph, 4)
    assert pg.n_nodes == n
    # every real edge appears exactly once across shards
    total = sum(
        int((np.asarray(pg.vals[s]) != 0).sum()) for s in range(4)
    )
    assert total == int((dense != 0).sum())


def test_partition_requires_divisible_nodes():
    graph, _ = _graph(48)
    with pytest.raises(ValueError):
        partition_graph(graph, 5)


def test_tp_placement_matches_unsharded_step():
    """TP is a placement policy: a dp x tp 2D-mesh train step must produce
    the same loss and parameter update as the unsharded step."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from chromegcn_tpu.data.constants import SRC_VOCAB
    from chromegcn_tpu.models.window import Expecto
    from chromegcn_tpu.ops.seq import complement_permutation
    from chromegcn_tpu.parallel.mesh import make_mesh_2d
    from chromegcn_tpu.parallel.tp import place_window_state, tp_batch_sharding
    from chromegcn_tpu.train.optim import make_optimizer
    from chromegcn_tpu.train.pretrain import create_window_state, window_train_step

    rng = jax.random.PRNGKey(0)
    nprng = np.random.default_rng(0)
    seq_len, n_targets, batch = 500, 6, 8
    model = Expecto(n_targets=n_targets, seq_length=seq_len, d_model=16)
    tx = make_optimizer("sgd", 0.25)
    state = create_window_state(model, tx, rng, seq_len, SRC_VOCAB, batch_size=2)
    comp_map = jnp.asarray(complement_permutation(SRC_VOCAB))
    tokens = nprng.integers(0, 4, size=(batch, seq_len)).astype(np.int32)
    targets = (nprng.random((batch, n_targets)) < 0.3).astype(np.float32)
    mask = np.ones(batch, bool)

    ref_state, ref_loss, ref_probs = window_train_step(
        state, jnp.asarray(tokens), jnp.asarray(targets), jnp.asarray(mask),
        comp_map, rng,
    )

    mesh = make_mesh_2d(4, 2, axes=("data", "model"))
    state = create_window_state(model, tx, rng, seq_len, SRC_VOCAB, batch_size=2)
    state_tp = place_window_state(state, mesh, min_elements=1024)
    # the feature kernel must actually be sharded over 'model'
    k = state_tp.params["model"]["linear"]["kernel"]
    assert "model" in str(k.sharding.spec), k.sharding
    bs = tp_batch_sharding(mesh)
    tp_state, tp_loss, tp_probs = window_train_step(
        state_tp,
        jax.device_put(tokens, bs),
        jax.device_put(targets, bs),
        jax.device_put(mask, bs),
        comp_map, rng,
    )
    np.testing.assert_allclose(float(tp_loss), float(ref_loss), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(tp_probs), np.asarray(ref_probs), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(tp_state.params["model"]["linear"]["kernel"]),
        np.asarray(ref_state.params["model"]["linear"]["kernel"]),
        rtol=1e-4, atol=1e-6,
    )


def test_halo_widths_are_per_offset_not_global_max():
    """One dense boundary pair must inflate only ITS ring offset's width
    (the r2 design sized every buffer by the global max — VERDICT r2
    weak #4). Shards of 8 rows; dense edges only between shards 0 and 1
    (offset 1); a single long-range edge at offset 3."""
    n, shards = 64, 8
    rows = n // shards
    # dense block: every node of shard 1 reads every node of shard 0
    s0 = np.repeat(np.arange(0, rows), rows)
    r1 = np.tile(np.arange(rows, 2 * rows), rows)
    # single edge from shard 0 -> shard 3 (offset 3)
    s_extra, r_extra = np.array([2]), np.array([3 * rows + 1])
    senders = np.concatenate([s0, s_extra]).astype(np.int32)
    receivers = np.concatenate([r1, r_extra]).astype(np.int32)
    vals = np.ones(len(senders), np.float32)
    from chromegcn_tpu.ops.sparse import build_chrom_graph

    graph = build_chrom_graph(
        "hic", n_valid=n, n_pad=n, hic_edges=(senders, receivers, vals)
    )
    pg = partition_graph(graph, shards)
    # width exists per offset; the dense pair inflates only offset 1
    assert len(pg.halo_widths) == shards - 1
    assert pg.halo_widths[0] >= pg.halo_widths[2] > 0
    # offsets with no edges at all ship nothing and skip their rounds
    assert any(w == 0 for w in pg.halo_widths)
    # and the sharded result still equals the single-device SpMM
    mesh = make_mesh(shards, axis="graph")
    rng = np.random.default_rng(0)
    x = rng.normal(size=(n, 4)).astype(np.float32)
    out = sharded_spmm(pg, jnp.asarray(x), mesh, axis="graph", strategy="halo")
    ref = spmm_xla(graph, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)
