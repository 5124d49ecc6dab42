"""Window model shape math + golden parity vs a torch implementation of the
published Expecto/DeepSEA architectures (eval mode, ported weights)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as torch_nn

from chromegcn_tpu.models.window import DanQ, DeepSEA, Expecto, make_window_model
from chromegcn_tpu.utils import torch_port

SEQ = 500  # small but valid: n_channels = 12 for Expecto


def test_expecto_n_channels_matches_reference_formula():
    # reference models/WindowModels.py:54-61 at seq_length 2000 -> 106
    assert Expecto(n_targets=3, seq_length=2000).n_channels == 106
    assert DeepSEA(n_targets=3, seq_length=2000).n_channels == 115
    assert DanQ(n_targets=3, seq_length=2000).n_steps == 151


@pytest.mark.parametrize("name", ["expecto", "deepsea", "danq"])
def test_window_model_shapes(name):
    model = make_window_model(name, n_targets=7, seq_length=SEQ)
    toks = jnp.zeros((2, SEQ), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), toks, train=False)
    x_feat, logits = model.apply(variables, toks, train=False)
    assert logits.shape == (2, 7)
    expected_feat = 925 if name == "danq" else 128
    assert x_feat.shape == (2, expected_feat)
    assert np.isfinite(np.asarray(logits)).all()


class TorchExpecto(torch_nn.Module):
    """Published ExPecto architecture (Zhou et al. 2018), as specified in the
    reference models/WindowModels.py:9-87 — independent re-implementation
    for golden-parity testing."""

    def __init__(self, nclass, seq_length):
        super().__init__()
        self.src_word_emb = torch_nn.Embedding(5, 5)
        k, p = 8, 4
        self.conv_net = torch_nn.Sequential(
            torch_nn.Conv1d(5, 320, k), torch_nn.ReLU(),
            torch_nn.Conv1d(320, 320, k), torch_nn.ReLU(),
            torch_nn.MaxPool1d(p, p), torch_nn.BatchNorm1d(320),
            torch_nn.Conv1d(320, 480, k), torch_nn.ReLU(),
            torch_nn.Conv1d(480, 480, k), torch_nn.ReLU(),
            torch_nn.MaxPool1d(p, p), torch_nn.BatchNorm1d(480), torch_nn.Dropout(0.2),
            torch_nn.Conv1d(480, 960, k), torch_nn.ReLU(),
            torch_nn.Conv1d(960, 960, k), torch_nn.ReLU(),
            torch_nn.BatchNorm1d(960), torch_nn.Dropout(0.5),
        )
        reduce_by = 2 * (k - 1)
        n = (seq_length - reduce_by) // p
        n = (n - reduce_by) // p
        self.n_channels = n - reduce_by
        self.linear = torch_nn.Linear(960 * self.n_channels, 128)
        self.batch_norm = torch_nn.BatchNorm1d(128)
        self.classifier = torch_nn.Linear(128, nclass)

    def forward(self, x):
        x = self.src_word_emb(x)
        out = self.conv_net(x.permute(0, 2, 1))
        x_feat = self.linear(out.reshape(out.size(0), -1))
        h = torch.relu(x_feat)
        h = self.batch_norm(h)
        return x_feat, self.classifier(h)


def _randomize_bn_stats(model, rng):
    for m in model.modules():
        if isinstance(m, torch_nn.BatchNorm1d):
            m.running_mean.copy_(
                torch.tensor(rng.normal(size=m.running_mean.shape).astype(np.float32))
            )
            m.running_var.copy_(
                torch.tensor(
                    rng.uniform(0.5, 2.0, size=m.running_var.shape).astype(np.float32)
                )
            )


def test_expecto_golden_parity_vs_torch():
    rng = np.random.default_rng(0)
    nclass = 11
    tmodel = TorchExpecto(nclass, SEQ).eval()
    with torch.no_grad():
        _randomize_bn_stats(tmodel, rng)

    toks = rng.integers(0, 5, size=(3, SEQ)).astype(np.int64)
    with torch.no_grad():
        t_feat, t_logits = tmodel(torch.tensor(toks))

    state = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    variables = torch_port.port_expecto(state, n_channels=tmodel.n_channels)
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    jmodel = Expecto(n_targets=nclass, seq_length=SEQ)
    j_feat, j_logits = jmodel.apply(variables, jnp.asarray(toks), train=False)

    np.testing.assert_allclose(np.asarray(j_feat), t_feat.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(j_logits), t_logits.numpy(), rtol=1e-4, atol=1e-4
    )


def test_expecto_train_mode_runs_and_updates_stats():
    model = Expecto(n_targets=5, seq_length=SEQ)
    toks = jnp.asarray(
        np.random.default_rng(1).integers(0, 5, size=(4, SEQ)).astype(np.int32)
    )
    variables = model.init(jax.random.PRNGKey(0), toks, train=False)
    (feat, logits), updates = model.apply(
        variables,
        toks,
        train=True,
        mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(2)},
    )
    before = variables["batch_stats"]["bn1"]["mean"]
    after = updates["batch_stats"]["bn1"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


class TorchDeepSEA(torch_nn.Module):
    """Published DeepSEA architecture (Zhou & Troyanskaya 2015), as specified
    in the reference models/WindowModels.py:89-156 — independent
    re-implementation for golden-parity testing. Includes the reference's
    quirk: the classifier consumes the pre-ReLU feature vector."""

    def __init__(self, nclass, seq_length):
        super().__init__()
        k, p = 8, 4
        self.src_word_emb = torch_nn.Embedding(5, 5)
        self.conv_net = torch_nn.Sequential(
            torch_nn.Conv1d(5, 320, k), torch_nn.ReLU(),
            torch_nn.MaxPool1d(p, p), torch_nn.Dropout(0.2),
            torch_nn.Conv1d(320, 480, k), torch_nn.ReLU(),
            torch_nn.MaxPool1d(p, p), torch_nn.Dropout(0.2),
            torch_nn.Conv1d(480, 960, k), torch_nn.ReLU(), torch_nn.Dropout(0.5),
        )
        n = (seq_length - (k - 1)) // p
        n = (n - (k - 1)) // p
        self.n_channels = n - (k - 1)
        self.linear = torch_nn.Linear(960 * self.n_channels, 128)
        self.classifier = torch_nn.Linear(128, nclass)

    def forward(self, x):
        x = self.src_word_emb(x)
        out = self.conv_net(x.permute(0, 2, 1))
        x_feat = self.linear(out.reshape(out.size(0), -1))
        return x_feat, self.classifier(x_feat)


def test_deepsea_golden_parity_vs_torch():
    rng = np.random.default_rng(5)
    nclass = 9
    tmodel = TorchDeepSEA(nclass, SEQ).eval()
    toks = rng.integers(0, 5, size=(3, SEQ)).astype(np.int64)
    with torch.no_grad():
        t_feat, t_logits = tmodel(torch.tensor(toks))

    state = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    variables = torch_port.port_deepsea(state, n_channels=tmodel.n_channels)
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    jmodel = DeepSEA(n_targets=nclass, seq_length=SEQ)
    assert jmodel.n_channels == tmodel.n_channels
    j_feat, j_logits = jmodel.apply(variables, jnp.asarray(toks), train=False)
    np.testing.assert_allclose(np.asarray(j_feat), t_feat.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(j_logits), t_logits.numpy(), rtol=1e-4, atol=1e-4
    )


class TorchDanQ(torch_nn.Module):
    """Published DanQ architecture (Quang & Xie 2015), as specified in the
    reference models/WindowModels.py:158-204 — independent re-implementation
    for golden-parity testing. Sized down: n_steps derived, not 151."""

    def __init__(self, nclass, seq_length):
        super().__init__()
        self.src_word_emb = torch_nn.Embedding(5, 5)
        self.Conv1 = torch_nn.Conv1d(5, 320, 26)
        self.Maxpool = torch_nn.MaxPool1d(13, 13)
        self.Drop1 = torch_nn.Dropout(0.2)
        self.BiLSTM = torch_nn.LSTM(320, 320, num_layers=2, batch_first=True,
                                    dropout=0.5, bidirectional=True)
        self.n_steps = (seq_length - 25) // 13
        self.Linear1 = torch_nn.Linear(640 * self.n_steps, 925)
        self.Linear2 = torch_nn.Linear(925, nclass)

    def forward(self, x):
        x = self.src_word_emb(x).permute(0, 2, 1)
        x = torch.relu(self.Conv1(x))
        x = self.Drop1(self.Maxpool(x))
        x, _ = self.BiLSTM(torch.transpose(x, 1, 2))
        x = x.contiguous().view(-1, 640 * self.n_steps)
        x_feat = torch.relu(self.Linear1(x))
        return x_feat, self.Linear2(x_feat)


def test_danq_golden_parity_vs_torch():
    seq = 26 + 13 * 5  # 5 LSTM steps, keeps the test fast
    nclass = 7
    tmodel = TorchDanQ(nclass, seq).eval()
    rng = np.random.default_rng(3)
    toks = rng.integers(0, 5, size=(2, seq)).astype(np.int64)
    with torch.no_grad():
        t_feat, t_logits = tmodel(torch.tensor(toks))

    state = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    variables = torch_port.port_danq(state)
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    jmodel = DanQ(n_targets=nclass, seq_length=seq)
    j_feat, j_logits = jmodel.apply(variables, jnp.asarray(toks), train=False)
    np.testing.assert_allclose(np.asarray(j_feat), t_feat.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_logits), t_logits.numpy(), rtol=1e-4, atol=1e-4)
