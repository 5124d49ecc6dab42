"""Fused GEMM+SpMM+gate layer (ops/gcn_fused.py) parity vs the unfused
composition — forward, all cotangents, and the full model/train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chromegcn_tpu.data.synthetic import make_hic_edges
from chromegcn_tpu.models.chrome import ChromeGCN
from chromegcn_tpu.ops import spmm as spmm_mod
from chromegcn_tpu.ops.gcn_fused import fused_fits, fused_gated_layer
from chromegcn_tpu.ops.sparse import build_chrom_graph
from chromegcn_tpu.ops.spmm_pallas import attach_bsr


@pytest.fixture(scope="module")
def world():
    n_valid, n_pad, d = 200, 256, 32
    s, r, v = make_hic_edges(n_valid, 400, seed=3)
    graph = build_chrom_graph("hic", n_valid=n_valid, n_pad=n_pad, hic_edges=(s, r, v))
    graph = attach_bsr(graph)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n_pad, d)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(d, d)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.normal(size=(d,)).astype(np.float32) * 0.1)
    u = jnp.asarray(rng.normal(size=(d, 1)).astype(np.float32) * 0.1)
    bu = jnp.asarray(rng.normal(size=(1,)).astype(np.float32) * 0.1)
    return graph, x, w, b, u, bu


def reference_layer(graph, x, w, b, u, bu):
    """The unfused composition (reference: models/SubLayers.py:42-52 +
    models/ChromeModels.py:38-40), on the XLA SpMM."""
    support = jnp.dot(x, w, preferred_element_type=jnp.float32)
    z = jnp.tanh(spmm_mod.spmm_xla(graph, support) + b)
    g = jax.nn.sigmoid(z @ u + bu)
    return (1.0 - g) * x + g * z, z, g


def test_forward_parity(world):
    graph, x, w, b, u, bu = world
    xn_f, z_f, g_f = fused_gated_layer(graph.bsr, x, w, b, u, bu)
    xn_r, z_r, g_r = reference_layer(graph, x, w, b, u, bu)
    np.testing.assert_allclose(z_f, z_r, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(g_f, g_r, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(xn_f, xn_r, rtol=1e-5, atol=1e-5)


def test_gradient_parity_all_cotangents(world):
    """Loss touches x_next, z AND g so every output cotangent flows."""
    graph, x, w, b, u, bu = world
    rng = np.random.default_rng(1)
    r1 = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
    r2 = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
    r3 = jnp.asarray(rng.normal(size=(x.shape[0], 1)).astype(np.float32))

    def loss_fused(x, w, b, u, bu):
        xn, z, g = fused_gated_layer(graph.bsr, x, w, b, u, bu)
        return jnp.sum(xn * r1) + jnp.sum(z * r2) + jnp.sum(g * r3)

    def loss_ref(x, w, b, u, bu):
        xn, z, g = reference_layer(graph, x, w, b, u, bu)
        return jnp.sum(xn * r1) + jnp.sum(z * r2) + jnp.sum(g * r3)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, w, b, u, bu)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, w, b, u, bu)
    for a, r, name in zip(gf, gr, ("dx", "dw", "db", "du", "dbu")):
        scale = max(1.0, float(jnp.max(jnp.abs(r))))
        np.testing.assert_allclose(
            a, r, rtol=1e-5, atol=1e-5 * scale, err_msg=name
        )


def test_model_parity_fused_vs_off(world):
    """ChromeGCN(fused='auto') == ChromeGCN(fused='off') — identical param
    tree (by construction: _GCParams/_DenseParams mirror the module paths),
    identical outputs and parameter gradients."""
    graph, x, *_ = world
    d = x.shape[1]
    kwargs = dict(nfeat=d, nhid=d, nclass=5, dropout=0.0, layers=2)
    m_fused = ChromeGCN(fused="on", **kwargs)
    m_off = ChromeGCN(fused="off", **kwargs)
    variables = m_off.init(jax.random.PRNGKey(0), x, graph, train=False)
    v_fused = m_fused.init(jax.random.PRNGKey(0), x, graph, train=False)
    jax.tree_util.tree_map(
        np.testing.assert_allclose, variables["params"], v_fused["params"]
    )
    assert fused_fits(graph.bsr, d)

    out_f = m_fused.apply(variables, x, graph, train=False)
    out_r = m_off.apply(variables, x, graph, train=False)
    np.testing.assert_allclose(out_f[0], out_r[0], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(out_f[1], out_r[1], rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(out_f[2][0], out_r[2][0], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(out_f[2][1], out_r[2][1], rtol=1e-5, atol=1e-5)

    targ = jnp.asarray((np.random.default_rng(2).random((x.shape[0], 5)) < 0.2
                        ).astype(np.float32))

    def loss(params, model):
        _, logits, _ = model.apply({"params": params, "batch_stats": variables.get("batch_stats", {})}, x, graph, train=False)
        p = jax.nn.log_sigmoid(logits)
        q = jax.nn.log_sigmoid(-logits)
        return -jnp.mean(targ * p + (1 - targ) * q)

    gf = jax.grad(loss)(variables["params"], m_fused)
    gr = jax.grad(loss)(variables["params"], m_off)
    flat_f = jax.tree_util.tree_leaves_with_path(gf)
    flat_r = jax.tree_util.tree_leaves_with_path(gr)
    for (pf, af), (pr, ar) in zip(flat_f, flat_r):
        assert pf == pr
        scale = max(1.0, float(jnp.max(jnp.abs(ar))))
        np.testing.assert_allclose(
            af, ar, rtol=1e-4, atol=1e-5 * scale,
            err_msg=jax.tree_util.keystr(pf),
        )


def test_train_step_parity(world):
    """3 chrome_train_step steps: fused and unfused models produce the same
    loss trajectory from the same init."""
    from chromegcn_tpu.train.finetune import chrome_train_step, create_chrome_state
    from chromegcn_tpu.train.optim import make_optimizer

    graph, x, *_ = world
    d = x.shape[1]
    rng = np.random.default_rng(4)
    x_f = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
    x_r = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
    targets = jnp.asarray((rng.random((x.shape[0], 7)) < 0.2).astype(np.float32))

    losses = {}
    for fused in ("on", "off"):
        model = ChromeGCN(nfeat=d, nhid=d, nclass=7, dropout=0.0, layers=2,
                          fused=fused)
        state = create_chrome_state(
            model, make_optimizer("sgd", 0.25), jax.random.PRNGKey(0),
            nfeat=d, n_nodes=256,
        )
        ls = []
        key = jax.random.PRNGKey(1)
        for i in range(3):
            key, step = jax.random.split(key)
            state, loss, _ = chrome_train_step(
                state, x_f, x_r, graph, targets, step
            )
            ls.append(float(loss))
        losses[fused] = ls
    np.testing.assert_allclose(losses["on"], losses["off"], rtol=1e-5)
