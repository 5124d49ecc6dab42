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
