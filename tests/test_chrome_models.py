"""Gated-GCN equation parity vs an independent numpy implementation of the
reference math (models/ChromeModels.py:34-52), plus masked-BatchNorm parity
vs torch.nn.BatchNorm1d."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as torch_nn

from chromegcn_tpu.models.chrome import ChromeGCN, GraphConvolution, make_chrome_model
from chromegcn_tpu.models.norm import MaskedBatchNorm
from chromegcn_tpu.ops import sparse as cgs


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _random_graph(n, density=0.2, seed=0):
    rng = np.random.default_rng(seed)
    dense = (rng.random((n, n)) < density).astype(np.float32)
    np.fill_diagonal(dense, 1.0)
    rowsum = dense.sum(1, keepdims=True)
    dense = dense / rowsum
    return cgs.from_dense(dense), dense


def _numpy_chromegcn(params, stats, dense, x, nlayers=2):
    """Reference equations, eval mode."""
    p = params

    def gc(name, h):
        return dense @ (h @ np.asarray(p[name]["weight"])) + np.asarray(p[name]["bias"])

    z = np.tanh(gc("GC1", x))
    g = _sigmoid(z @ np.asarray(p["W1"]["kernel"]) + np.asarray(p["W1"]["bias"]))
    x = (1 - g) * x + g * z
    if nlayers == 2:
        z2 = np.tanh(gc("GC2", x))
        g2 = _sigmoid(z2 @ np.asarray(p["W2"]["kernel"]) + np.asarray(p["W2"]["bias"]))
        x = (1 - g2) * x + g2 * z2
    h = np.maximum(x, 0)
    mean = np.asarray(stats["batch_norm"]["mean"])
    var = np.asarray(stats["batch_norm"]["var"])
    h = (h - mean) / np.sqrt(var + 1e-5)
    h = h * np.asarray(p["batch_norm"]["scale"]) + np.asarray(p["batch_norm"]["bias"])
    out = h @ np.asarray(p["out"]["kernel"]) + np.asarray(p["out"]["bias"])
    return x, out


def test_chromegcn_matches_numpy_reference():
    n, d, nclass = 40, 16, 9
    graph, dense = _random_graph(n)
    x = np.random.default_rng(1).normal(size=(n, d)).astype(np.float32)

    model = ChromeGCN(nfeat=d, nhid=d, nclass=nclass, dropout=0.0, layers=2)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(x), graph, train=False
    )
    # randomize batch stats so eval-mode BN is non-trivial
    rng = np.random.default_rng(2)
    variables = jax.device_get(variables)
    variables["batch_stats"]["batch_norm"]["mean"] = rng.normal(size=d).astype(np.float32)
    variables["batch_stats"]["batch_norm"]["var"] = rng.uniform(0.5, 2.0, size=d).astype(np.float32)
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    x_ref, out_ref = _numpy_chromegcn(
        jax.device_get(variables["params"]),
        jax.device_get(variables["batch_stats"]),
        dense,
        x,
    )
    x_out, logits, (g1, g2) = model.apply(
        variables, jnp.asarray(x), graph, train=False
    )
    np.testing.assert_allclose(np.asarray(x_out), x_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(logits), out_ref, rtol=1e-4, atol=1e-4)
    assert g1.shape == (n, 1) and g2.shape == (n, 1)


def test_chromegcn_single_layer():
    n, d = 16, 8
    graph, _ = _random_graph(n, seed=3)
    x = jnp.asarray(np.random.default_rng(4).normal(size=(n, d)).astype(np.float32))
    model = ChromeGCN(nfeat=d, nhid=d, nclass=5, dropout=0.0, layers=1)
    variables = model.init(jax.random.PRNGKey(0), x, graph, train=False)
    _, logits, (g1, g2) = model.apply(variables, x, graph, train=False)
    assert g2 is None
    assert logits.shape == (16, 5)
    assert "GC2" not in variables["params"]


def test_graphconv_no_graph_is_dense():
    x = jnp.asarray(np.random.default_rng(5).normal(size=(6, 4)).astype(np.float32))
    layer = GraphConvolution(out_features=3)
    variables = layer.init(jax.random.PRNGKey(0), x, None)
    out = layer.apply(variables, x, None)
    w = np.asarray(variables["params"]["weight"])
    b = np.asarray(variables["params"]["bias"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) @ w + b, rtol=1e-5, atol=1e-6)


def test_xavier_gain_002_scale():
    """reference models/SubLayers.py:33: xavier_normal gain=0.02."""
    layer = GraphConvolution(out_features=128)
    x = jnp.zeros((4, 128))
    variables = layer.init(jax.random.PRNGKey(0), x, None)
    w = np.asarray(variables["params"]["weight"])
    expected_std = 0.02 * np.sqrt(2.0 / (128 + 128))
    assert abs(w.std() - expected_std) / expected_std < 0.1


def test_masked_batchnorm_matches_torch_on_valid_rows():
    n_valid, n_pad, c = 20, 32, 8
    rng = np.random.default_rng(6)
    x = rng.normal(size=(n_pad, c)).astype(np.float32)
    x[n_valid:] = 1e6  # garbage in padding — must not leak into stats
    mask = np.zeros(n_pad, bool)
    mask[:n_valid] = True

    bn = MaskedBatchNorm()
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x), use_running_average=False)
    out, updates = bn.apply(
        variables,
        jnp.asarray(x),
        use_running_average=False,
        mask=jnp.asarray(mask),
        mutable=["batch_stats"],
    )

    tbn = torch_nn.BatchNorm1d(c).train()
    with torch.no_grad():
        t_out = tbn(torch.tensor(x[:n_valid]))
    np.testing.assert_allclose(
        np.asarray(out)[:n_valid], t_out.numpy(), rtol=1e-4, atol=1e-4
    )
    # running stats must match torch's (unbiased-var update, momentum 0.1)
    np.testing.assert_allclose(
        np.asarray(updates["batch_stats"]["mean"]),
        tbn.running_mean.numpy(), rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(updates["batch_stats"]["var"]),
        tbn.running_var.numpy(), rtol=1e-4, atol=1e-4,
    )


def test_chrome_rnn_shapes():
    n, d = 24, 16
    graph, _ = _random_graph(n, seed=7)
    x = jnp.asarray(np.random.default_rng(8).normal(size=(n, d)).astype(np.float32))
    model = make_chrome_model("rnn", nclass=6, nfeat=d)
    variables = model.init(jax.random.PRNGKey(0), x, graph, train=False)
    x_in, logits, _ = model.apply(variables, x, graph, train=False)
    assert logits.shape == (n, 6)
    np.testing.assert_array_equal(np.asarray(x_in), np.asarray(x))


class TorchChromeRNN(torch_nn.Module):
    """Reference ChromeRNN (models/ChromeModels.py:55-72) — independent
    re-implementation for golden-parity testing: bidirectional nfeat/2-hidden
    LSTM over the chromosome-as-one-sequence, ReLU, BatchNorm1d, Linear."""

    def __init__(self, nfeat, nclass, layers):
        super().__init__()
        self.lstm = torch_nn.LSTM(
            nfeat, nfeat // 2, num_layers=layers, dropout=0.5,
            batch_first=True, bidirectional=True,
        )
        self.batch_norm = torch_nn.BatchNorm1d(nfeat)
        self.out = torch_nn.Linear(nfeat, nclass)

    def forward(self, x):
        x, _ = self.lstm(x.unsqueeze(0))
        x = torch.relu(x.squeeze(0))
        x = self.batch_norm(x)
        return self.out(x)


def test_chromernn_golden_parity_vs_torch():
    from chromegcn_tpu.models.chrome import ChromeRNN
    from chromegcn_tpu.utils import torch_port

    n, d, nclass, layers = 30, 16, 7, 2
    tmodel = TorchChromeRNN(d, nclass, layers).eval()
    rng = np.random.default_rng(13)
    with torch.no_grad():
        tmodel.batch_norm.running_mean.copy_(
            torch.tensor(rng.normal(size=d).astype(np.float32)))
        tmodel.batch_norm.running_var.copy_(
            torch.tensor(rng.uniform(0.5, 2.0, size=d).astype(np.float32)))
    x = rng.normal(size=(n, d)).astype(np.float32)
    with torch.no_grad():
        t_out = tmodel(torch.tensor(x))

    state = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    variables = torch_port.port_chromernn(state, layers=layers)
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    jmodel = ChromeRNN(nfeat=d, nclass=nclass, dropout=0.0, layers=layers)
    x_in, j_out, _ = jmodel.apply(variables, jnp.asarray(x), None, train=False)
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(x_in), x)


def test_chromegcn_strand_stacked_matches_per_strand():
    """(N, 2, d) stacked forward == two (N, d) forwards (eval mode)."""
    n, d = 32, 8
    graph, _ = _random_graph(n, seed=11)
    rng = np.random.default_rng(12)
    x_f = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    x_r = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    model = ChromeGCN(nfeat=d, nhid=d, nclass=5, dropout=0.0, layers=2)
    variables = model.init(jax.random.PRNGKey(0), x_f, graph, train=False)
    _, p_f, _ = model.apply(variables, x_f, graph, train=False)
    _, p_r, _ = model.apply(variables, x_r, graph, train=False)
    _, p_stacked, _ = model.apply(
        variables, jnp.stack([x_f, x_r], axis=1), graph, train=False
    )
    np.testing.assert_allclose(np.asarray(p_stacked[:, 0]), np.asarray(p_f), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(p_stacked[:, 1]), np.asarray(p_r), rtol=1e-5, atol=1e-5)


def test_skip_head_linearity():
    """skip_head + one head GEMM on averaged features == averaged logits
    (the head is linear; the train/eval steps rely on this identity)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from chromegcn_tpu.models.chrome import ChromeGCN
    from chromegcn_tpu.ops.sparse import build_chrom_graph

    d, n = 16, 64
    rng = np.random.default_rng(0)
    graph = build_chrom_graph("constant", n_valid=60, n_pad=n)
    model = ChromeGCN(nfeat=d, nhid=d, nclass=9, dropout=0.0, layers=2)
    x_f = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    x_r = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x_f, graph, train=False)

    _, l_f, _ = model.apply(variables, x_f, graph, train=False)
    _, l_r, _ = model.apply(variables, x_r, graph, train=False)
    avg_logits = (l_f + l_r) / 2.0

    _, h_f, _ = model.apply(variables, x_f, graph, train=False, skip_head=True)
    _, h_r, _ = model.apply(variables, x_r, graph, train=False, skip_head=True)
    h = (h_f + h_r) / 2.0
    p = variables["params"]["out"]
    once = h @ p["kernel"] + p["bias"]
    np.testing.assert_allclose(once, avg_logits, rtol=1e-5, atol=1e-6)
