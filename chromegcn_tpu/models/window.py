"""Window (sequence) models: Expecto, DeepSEA, DanQ.

Per-window DNA sequence -> (d_model feature vector, multi-label logits).

TPU-first design: NWC layout (batch, length, channels) so convolutions map
straight onto XLA's TPU conv path, and the flatten is taken in NWC order
(the torch models flatten channel-major — reference:
models/WindowModels.py:81-82; mathematically equivalent up to a fixed
permutation of the first linear layer, handled by the checkpoint porter in
``chromegcn_tpu.utils.torch_port``).

Architecture parity (layer structure, kernel sizes, channel widths,
dropout rates, the DeepSEA classifier-on-preactivation quirk) follows the
reference: models/WindowModels.py:9-204.

All models return ``(x_feat, logits)``; features feed the chromosome-stage
GCN (reference contract: pretrain.py:57-60 -> finetune.py:30-34).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from chromegcn_tpu.models.norm import MaskedBatchNorm


def _max_pool_1d(x: jax.Array, window: int) -> jax.Array:
    """Non-overlapping 1D max pool over axis 1 (NWC), floor semantics."""
    return nn.max_pool(x, window_shape=(window,), strides=(window,), padding="VALID")


class Expecto(nn.Module):
    """ExPecto-style CNN (Zhou et al. 2018); reference models/WindowModels.py:9-87.

    6 valid convs (k=8) in 3 blocks (320/480/960 channels), two 4x max pools,
    BatchNorm per block, dropout 0.2/0.5, then Linear->d_model feature and a
    classifier head over ReLU+BatchNorm'd features.
    """

    n_targets: int
    seq_length: int = 2000
    d_model: int = 128

    @property
    def n_channels(self) -> int:
        reduce_by = 2 * (8 - 1)
        n = (self.seq_length - reduce_by) // 4
        n = (n - reduce_by) // 4
        return n - reduce_by

    @nn.compact
    def __call__(self, tokens: jax.Array, train: bool) -> Tuple[jax.Array, jax.Array]:
        conv = lambda ch, name: nn.Conv(
            ch, kernel_size=(8,), padding="VALID", name=name
        )
        x = nn.Embed(5, 5, name="embed")(tokens)  # (B, L, 5)

        x = nn.relu(conv(320, "conv1a")(x))
        x = nn.relu(conv(320, "conv1b")(x))
        x = _max_pool_1d(x, 4)
        x = MaskedBatchNorm(name="bn1")(x, use_running_average=not train)

        x = nn.relu(conv(480, "conv2a")(x))
        x = nn.relu(conv(480, "conv2b")(x))
        x = _max_pool_1d(x, 4)
        x = MaskedBatchNorm(name="bn2")(x, use_running_average=not train)
        x = nn.Dropout(0.2, deterministic=not train)(x)

        x = nn.relu(conv(960, "conv3a")(x))
        x = nn.relu(conv(960, "conv3b")(x))
        x = MaskedBatchNorm(name="bn3")(x, use_running_average=not train)
        x = nn.Dropout(0.5, deterministic=not train)(x)

        x = x.reshape(x.shape[0], 960 * self.n_channels)
        x_feat = nn.Dense(self.d_model, name="linear")(x)
        h = nn.relu(x_feat)
        h = MaskedBatchNorm(name="head_bn")(h, use_running_average=not train)
        logits = nn.Dense(self.n_targets, name="classifier")(h)
        return x_feat, logits


class DeepSEA(nn.Module):
    """DeepSEA CNN (Zhou & Troyanskaya 2015); reference models/WindowModels.py:89-156.

    Quirk preserved: the classifier is applied to the *pre-ReLU* feature
    vector (reference models/WindowModels.py:153 passes ``x_feat``, not the
    ReLU'd ``predict``).
    """

    n_targets: int
    seq_length: int = 2000
    d_model: int = 128

    @property
    def n_channels(self) -> int:
        reduce_by = 8 - 1
        n = (self.seq_length - reduce_by) // 4
        n = (n - reduce_by) // 4
        return n - reduce_by

    @nn.compact
    def __call__(self, tokens: jax.Array, train: bool) -> Tuple[jax.Array, jax.Array]:
        x = nn.Embed(5, 5, name="embed")(tokens)
        x = nn.relu(nn.Conv(320, (8,), padding="VALID", name="conv1")(x))
        x = _max_pool_1d(x, 4)
        x = nn.Dropout(0.2, deterministic=not train)(x)
        x = nn.relu(nn.Conv(480, (8,), padding="VALID", name="conv2")(x))
        x = _max_pool_1d(x, 4)
        x = nn.Dropout(0.2, deterministic=not train)(x)
        x = nn.relu(nn.Conv(960, (8,), padding="VALID", name="conv3")(x))
        x = nn.Dropout(0.5, deterministic=not train)(x)

        x = x.reshape(x.shape[0], 960 * self.n_channels)
        x_feat = nn.Dense(self.d_model, name="linear")(x)
        logits = nn.Dense(self.n_targets, name="classifier")(x_feat)
        return x_feat, logits


class _BiLSTM(nn.Module):
    """2-layer bidirectional LSTM with inter-layer dropout (torch semantics).

    Built on lax.scan via flax RNN; replaces cuDNN LSTM
    (reference: models/WindowModels.py:172-176).
    """

    hidden: int
    num_layers: int = 2
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        for layer in range(self.num_layers):
            fwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden), name=f"fwd{layer}")
            bwd = nn.RNN(
                nn.OptimizedLSTMCell(self.hidden), reverse=True, keep_order=True,
                name=f"bwd{layer}",
            )
            x = jnp.concatenate([fwd(x), bwd(x)], axis=-1)
            if layer + 1 < self.num_layers:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class DanQ(nn.Module):
    """DanQ CNN+BiLSTM (Quang & Xie 2015); reference models/WindowModels.py:158-204.

    Note the reference hard-codes the post-pool length to 151 (seq 2000,
    k=26, pool 13); we derive it. The feature vector is the 925-dim ReLU'd
    first linear output (reference models/WindowModels.py:201-203).
    """

    n_targets: int
    seq_length: int = 2000

    @property
    def n_steps(self) -> int:
        return (self.seq_length - 25) // 13

    @nn.compact
    def __call__(self, tokens: jax.Array, train: bool) -> Tuple[jax.Array, jax.Array]:
        x = nn.Embed(5, 5, name="embed")(tokens)
        x = nn.relu(nn.Conv(320, (26,), padding="VALID", name="conv1")(x))
        x = _max_pool_1d(x, 13)
        x = nn.Dropout(0.2, deterministic=not train)(x)
        x = _BiLSTM(hidden=320, name="bilstm")(x, train)
        x = x.reshape(x.shape[0], 640 * self.n_steps)
        x = nn.Dense(925, name="linear1")(x)
        x_feat = nn.relu(x)
        logits = nn.Dense(self.n_targets, name="linear2")(x_feat)
        return x_feat, logits


WINDOW_MODELS = {"expecto": Expecto, "deepsea": DeepSEA, "danq": DanQ}


def make_window_model(name: str, n_targets: int, seq_length: int = 2000, d_model: int = 128):
    """Factory mirroring the reference dispatch (reference: main.py:40-45)."""
    name = name.lower()
    if name == "danq":
        return DanQ(n_targets=n_targets, seq_length=seq_length)
    if name in WINDOW_MODELS:
        return WINDOW_MODELS[name](
            n_targets=n_targets, seq_length=seq_length, d_model=d_model
        )
    raise ValueError(f"unknown window model {name!r}")
