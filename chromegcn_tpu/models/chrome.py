"""Chromosome models: gated GCN (ChromeGCN) and BiLSTM baseline (ChromeRNN).

Whole-chromosome refinement: all window feature vectors of one chromosome
(N x d) are refined jointly over the Hi-C adjacency, then re-classified.

Equations (reference: models/ChromeModels.py:34-52):
    z_l   = tanh(GC_l(x, A))            GC: X W + b then A (X W)  [SpMM]
    g_l   = sigmoid(W_l z_l)            per-node scalar gate
    x     = (1 - g_l) * x + g_l * z_l   gated residual update
    out   = Linear(Dropout(BatchNorm(ReLU(x))))

The SpMM runs through chromegcn_tpu.ops.spmm (Pallas on TPU). BatchNorm is
masked so padded nodes don't pollute the statistics (the torch reference
had ragged N and no padding; reference: models/ChromeModels.py:49).

Note: the reference constructs ChromeGCN with a ``gate`` flag but the
forward path always gates (reference: models/ChromeModels.py:34-46); we
preserve that behavior and keep the flag for config parity only.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from chromegcn_tpu.models.norm import MaskedBatchNorm
from chromegcn_tpu.ops.sparse import SparseGraph
from chromegcn_tpu.ops.spmm import spmm


def _xavier_normal_gain(gain: float):
    """Xavier-normal with explicit gain (reference: models/SubLayers.py:33 uses
    gain=0.02, an unusually small init that the published results depend on)."""

    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = shape[0], shape[1]
        std = gain * jnp.sqrt(2.0 / (fan_in + fan_out))
        return jax.random.normal(key, shape, dtype) * std

    return init


class GraphConvolution(nn.Module):
    """X W then SpMM(A, X W) + b (reference: models/SubLayers.py:7-57).

    The dense X W GEMM hits the MXU; the aggregation is the Pallas/XLA SpMM.
    """

    out_features: int
    use_bias: bool = True
    init_method: str = "xavier"
    spmm_impl: str = "auto"

    @nn.compact
    def __call__(self, x: jax.Array, graph: Optional[SparseGraph]) -> jax.Array:
        in_features = x.shape[-1]
        if self.init_method == "xavier":
            w_init = _xavier_normal_gain(0.02)
        elif self.init_method == "kaiming":
            w_init = nn.initializers.kaiming_normal()
        elif self.init_method == "uniform":
            bound = 1.0 / jnp.sqrt(self.out_features)
            w_init = nn.initializers.uniform(scale=2 * bound)  # approx; see tests
        else:
            raise NotImplementedError(self.init_method)
        weight = self.param("weight", w_init, (in_features, self.out_features))
        support = jnp.dot(x, weight, preferred_element_type=jnp.float32)
        if graph is not None:
            if support.ndim == 3:
                # (N, S, d) strand-stacked input: SpMM is linear over the
                # feature axis, so both strands share one aggregation pass
                # over the adjacency (halves SpMM count per layer)
                n, s, d = support.shape
                out = spmm(
                    graph, support.reshape(n, s * d), impl=self.spmm_impl
                ).reshape(n, s, d)
            else:
                out = spmm(graph, support, impl=self.spmm_impl)
        else:
            out = support
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.out_features,))
            out = out + bias
        return out


class _GCParams(nn.Module):
    """Parameter holder matching GraphConvolution's tree ("weight"/"bias") —
    used by the fused kernel path so checkpoints/param trees are identical
    whichever path a config selects (flax derives param RNG from the path,
    so init values match too)."""

    in_features: int
    out_features: int

    @nn.compact
    def __call__(self):
        w = self.param(
            "weight", _xavier_normal_gain(0.02),
            (self.in_features, self.out_features),
        )
        b = self.param("bias", nn.initializers.zeros, (self.out_features,))
        return w, b


class _DenseParams(nn.Module):
    """Parameter holder matching nn.Dense's tree ("kernel"/"bias")."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_features, self.features),
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class ChromeGCN(nn.Module):
    """Gated residual 2-layer GCN head (reference: models/ChromeModels.py:21-52).

    Accepts (N, d) single-strand or (N, S, d) strand-stacked inputs; the
    stacked form runs both strands through each SpMM in one pass (they share
    the adjacency — the reference runs two sequential passes,
    finetune.py:41-42). With stacking, BatchNorm statistics pool both
    strands (documented divergence, same spirit as models/strand.py).

    ``fused='on'`` routes each layer through the fused
    SpMM+GEMM+tanh kernel (ops/gcn_fused.py) whenever the graph carries a
    flat BSROperator that fits the fused VMEM budget — gradient-exact vs
    the unfused composition (tests/test_fused.py). Default 'off': fusion
    is a MEASURED LOSS on this chip/backend (12.9 vs 10.4 ms/step at chr1
    scale — Mosaic epilogue overheads exceed the saved HBM round-trips,
    which are not the bottleneck; DESIGN.md §1 round-3 ablation)."""

    nfeat: int = 128
    nhid: int = 128
    nclass: int = 919
    dropout: float = 0.2
    gate: bool = True  # kept for config parity; forward always gates (see module doc)
    layers: int = 2
    spmm_impl: str = "auto"
    fused: str = "off"

    def _use_fused(self, x: jax.Array, graph) -> bool:
        from chromegcn_tpu.ops.gcn_fused import fused_fits
        from chromegcn_tpu.ops.spmm_pallas import BSROperator

        return (
            self.fused == "on"
            and self.spmm_impl in ("auto", "pallas")
            and graph is not None
            and isinstance(getattr(graph, "bsr", None), BSROperator)
            and x.ndim == 2
            and x.shape[-1] == self.nhid == self.nfeat
            and fused_fits(graph.bsr, x.shape[-1])
        )

    @nn.compact
    def __call__(
        self,
        x_in: jax.Array,
        graph: Optional[SparseGraph],
        train: bool,
        node_mask: Optional[jax.Array] = None,
        skip_head: bool = False,
    ) -> Tuple[jax.Array, jax.Array, Tuple[jax.Array, Optional[jax.Array]]]:
        """Returns (x_refined, logits, (gate1, gate2)) for N x d node features.

        ``skip_head=True`` returns the post-dropout penultimate features
        in place of logits (the final Dense is linear, so strand-averaged
        logits == head applied ONCE to strand-averaged features — the
        train/eval steps exploit this to halve the (N, d) x (d, nclass)
        head GEMMs; exactness pinned in tests/test_chrome_models.py)."""
        if node_mask is None and graph is not None:
            node_mask = graph.node_mask

        use_fused = self._use_fused(x_in, graph)
        if use_fused:
            from chromegcn_tpu.ops.gcn_fused import fused_gated_layer

        x = x_in
        if use_fused:
            w1, b1 = _GCParams(x.shape[-1], self.nhid, name="GC1")()
            u1, bu1 = _DenseParams(self.nhid, 1, name="W1")()
            x, z1, g = fused_gated_layer(graph.bsr, x, w1, b1, u1, bu1)
            # per-layer activations for the parity harness (utils/parity.py):
            # the fused kernel materializes tanh/sigmoid space, not the
            # pre-activation GC/Dense outputs the unfused modules sow
            self.sow("intermediates", "fused_z1", z1)
            self.sow("intermediates", "fused_g1", g)
        else:
            z = GraphConvolution(self.nhid, spmm_impl=self.spmm_impl, name="GC1")(x, graph)
            z = jnp.tanh(z)
            g = jax.nn.sigmoid(nn.Dense(1, name="W1")(z))
            x = (1.0 - g) * x + g * z

        g2 = None
        if self.layers == 2:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
            if use_fused:
                w2, b2 = _GCParams(x.shape[-1], self.nfeat, name="GC2")()
                u2, bu2 = _DenseParams(self.nfeat, 1, name="W2")()
                x, z2s, g2 = fused_gated_layer(graph.bsr, x, w2, b2, u2, bu2)
                self.sow("intermediates", "fused_z2", z2s)
                self.sow("intermediates", "fused_g2", g2)
            else:
                z2 = GraphConvolution(self.nfeat, spmm_impl=self.spmm_impl, name="GC2")(x, graph)
                z2 = jnp.tanh(z2)
                g2 = jax.nn.sigmoid(nn.Dense(1, name="W2")(z2))
                x = (1.0 - g2) * x + g2 * z2

        h = nn.relu(x)
        h = MaskedBatchNorm(name="batch_norm")(
            h, use_running_average=not train, mask=node_mask
        )
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        if skip_head:
            return x, h, (g, g2)
        out = nn.Dense(self.nclass, name="out")(h)
        return x, out, (g, g2)


class ChromeRNN(nn.Module):
    """BiLSTM over the window sequence of a chromosome
    (reference: models/ChromeModels.py:55-72).

    The chromosome's N windows are treated as one sequence; implemented with
    lax.scan-based RNN layers. Padded suffix nodes are processed (static
    shapes) but excluded from stats/loss via node_mask.
    """

    nfeat: int = 128
    nclass: int = 919
    dropout: float = 0.2
    layers: int = 2

    @nn.compact
    def __call__(
        self,
        x_in: jax.Array,
        graph: Optional[SparseGraph],
        train: bool,
        node_mask: Optional[jax.Array] = None,
        skip_head: bool = False,
    ) -> Tuple[jax.Array, jax.Array, Tuple[Optional[jax.Array], Optional[jax.Array]]]:
        if node_mask is None and graph is not None:
            node_mask = graph.node_mask
        hidden = self.nfeat // 2
        x = x_in[None, :, :]  # (1, N, d) — chromosome as one sequence
        for layer in range(self.layers):
            fwd = nn.RNN(nn.OptimizedLSTMCell(hidden), name=f"fwd{layer}")
            bwd = nn.RNN(nn.OptimizedLSTMCell(hidden), reverse=True, keep_order=True, name=f"bwd{layer}")
            x = jnp.concatenate([fwd(x), bwd(x)], axis=-1)
            if layer + 1 < self.layers:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = x[0]
        h = nn.relu(x)
        h = MaskedBatchNorm(name="batch_norm")(
            h, use_running_average=not train, mask=node_mask
        )
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        if skip_head:
            return x_in, h, (None, None)
        out = nn.Dense(self.nclass, name="out")(h)
        return x_in, out, (None, None)


def make_chrome_model(
    name: str,
    nclass: int,
    dropout: float = 0.2,
    gate: bool = True,
    layers: int = 2,
    nfeat: int = 128,
    spmm_impl: str = "auto",
    fused: str = "off",
):
    """Factory mirroring reference dispatch (reference: main.py:59-62)."""
    name = name.lower()
    if name == "gcn":
        return ChromeGCN(
            nfeat=nfeat, nhid=nfeat, nclass=nclass, dropout=dropout,
            gate=gate, layers=layers, spmm_impl=spmm_impl, fused=fused,
        )
    if name == "rnn":
        return ChromeRNN(nfeat=nfeat, nclass=nclass, dropout=dropout, layers=layers)
    raise ValueError(f"unknown chrome model {name!r}")
