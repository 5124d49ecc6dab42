"""Port PyTorch checkpoints into this framework's parameter pytrees.

Lets users of the reference bring trained ChromeGCN/Expecto checkpoints
across, and powers golden parity tests (BASELINE requirement: per-layer
activations allclose vs the torch reference).

Layout conversions:
- torch Conv1d weight (out_ch, in_ch, k)  -> flax Conv kernel (k, in_ch, out_ch)
- torch Linear weight (out, in)           -> flax Dense kernel (in, out)
- the post-conv flatten: torch flattens channel-major (B, C*L)
  (reference: models/WindowModels.py:81-82) while our NWC models flatten
  length-major (B, L*C); the first Dense after the flatten needs its input
  axis permuted accordingly.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def conv1d_kernel(w: np.ndarray) -> np.ndarray:
    """(out_ch, in_ch, k) -> (k, in_ch, out_ch)."""
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 1, 0)))


def dense_kernel(w: np.ndarray) -> np.ndarray:
    """(out, in) -> (in, out)."""
    return np.ascontiguousarray(np.transpose(np.asarray(w)))


def flatten_dense_kernel(w: np.ndarray, channels: int, length: int) -> np.ndarray:
    """Dense after a channel-major flatten -> kernel for length-major flatten.

    torch: y = W @ flatten_CL(x), W: (out, C*L).
    ours:  y = flatten_LC(x) @ K,  K: (L*C, out).
    """
    w = np.asarray(w)
    out = w.shape[0]
    w = w.reshape(out, channels, length)          # (out, C, L)
    w = np.transpose(w, (2, 1, 0))                # (L, C, out)
    return np.ascontiguousarray(w.reshape(length * channels, out))


def batchnorm(params: Mapping[str, np.ndarray]) -> Dict[str, Dict[str, np.ndarray]]:
    """torch BatchNorm state -> (params, batch_stats) fragments."""
    return {
        "params": {
            "scale": np.asarray(params["weight"]),
            "bias": np.asarray(params["bias"]),
        },
        "batch_stats": {
            "mean": np.asarray(params["running_mean"]),
            "var": np.asarray(params["running_var"]),
        },
    }


def port_expecto(state: Mapping[str, np.ndarray], n_channels: int) -> Dict:
    """Map a torch Expecto state_dict (reference models/WindowModels.py:9-87,
    conv_net indices 0,2,5,6,8,10,13,15 / linear / batch_norm / classifier)
    into {params, batch_stats} for models.window.Expecto."""

    def g(key):
        return np.asarray(state[key])

    conv_names = {
        "conv1a": "conv_net.0", "conv1b": "conv_net.2",
        "conv2a": "conv_net.6", "conv2b": "conv_net.8",
        "conv3a": "conv_net.13", "conv3b": "conv_net.15",
    }
    bn_names = {"bn1": "conv_net.5", "bn2": "conv_net.11", "bn3": "conv_net.17"}

    params: Dict = {"embed": {"embedding": g("src_word_emb.weight")}}
    stats: Dict = {}
    for ours, theirs in conv_names.items():
        params[ours] = {
            "kernel": conv1d_kernel(g(theirs + ".weight")),
            "bias": g(theirs + ".bias"),
        }
    for ours, theirs in bn_names.items():
        frag = batchnorm({k: g(f"{theirs}.{k}") for k in
                          ("weight", "bias", "running_mean", "running_var")})
        params[ours] = frag["params"]
        stats[ours] = frag["batch_stats"]

    params["linear"] = {
        "kernel": flatten_dense_kernel(g("linear.weight"), 960, n_channels),
        "bias": g("linear.bias"),
    }
    frag = batchnorm({k: g(f"batch_norm.{k}") for k in
                      ("weight", "bias", "running_mean", "running_var")})
    params["head_bn"] = frag["params"]
    stats["head_bn"] = frag["batch_stats"]
    params["classifier"] = {
        "kernel": dense_kernel(g("classifier.weight")),
        "bias": g("classifier.bias"),
    }
    return {"params": params, "batch_stats": stats}


def port_deepsea(state: Mapping[str, np.ndarray], n_channels: int) -> Dict:
    """Map a torch DeepSEA state_dict (reference models/WindowModels.py:89-156,
    conv_net Sequential indices 0/4/8, no batch norms) into {params} for
    models.window.DeepSEA. The post-conv flatten is channel-major in torch
    and length-major here, so the first Dense ports via
    flatten_dense_kernel (same as Expecto)."""

    def g(key):
        return np.asarray(state[key])

    conv_names = {"conv1": "conv_net.0", "conv2": "conv_net.4", "conv3": "conv_net.8"}
    params: Dict = {"embed": {"embedding": g("src_word_emb.weight")}}
    for ours, theirs in conv_names.items():
        params[ours] = {
            "kernel": conv1d_kernel(g(theirs + ".weight")),
            "bias": g(theirs + ".bias"),
        }
    params["linear"] = {
        "kernel": flatten_dense_kernel(g("linear.weight"), 960, n_channels),
        "bias": g("linear.bias"),
    }
    params["classifier"] = {
        "kernel": dense_kernel(g("classifier.weight")),
        "bias": g("classifier.bias"),
    }
    return {"params": params}


def port_chromegcn(state: Mapping[str, np.ndarray], layers: int = 2) -> Dict:
    """Map a torch ChromeGCN state_dict (reference models/ChromeModels.py:21-52)
    into {params, batch_stats} for models.chrome.ChromeGCN.

    GraphConvolution stores weight as (in, out) already
    (reference: models/SubLayers.py:12 — mm(input, weight)), so no transpose.
    """

    def g(key):
        return np.asarray(state[key])

    params: Dict = {
        "GC1": {"weight": g("GC1.weight"), "bias": g("GC1.bias")},
        "W1": {"kernel": dense_kernel(g("W1.weight")), "bias": g("W1.bias")},
        "out": {"kernel": dense_kernel(g("out.weight")), "bias": g("out.bias")},
    }
    if layers == 2:
        params["GC2"] = {"weight": g("GC2.weight"), "bias": g("GC2.bias")}
        params["W2"] = {"kernel": dense_kernel(g("W2.weight")), "bias": g("W2.bias")}
    frag = batchnorm({k: g(f"batch_norm.{k}") for k in
                      ("weight", "bias", "running_mean", "running_var")})
    params["batch_norm"] = frag["params"]
    stats = {"batch_norm": frag["batch_stats"]}
    return {"params": params, "batch_stats": stats}


def lstm_cell(
    weight_ih: np.ndarray,
    weight_hh: np.ndarray,
    bias_ih: np.ndarray,
    bias_hh: np.ndarray,
) -> Dict:
    """torch LSTM direction weights -> flax OptimizedLSTMCell params.

    torch packs gates (i, f, g, o) along rows of (4H, in)/(4H, H) matrices
    with two bias vectors; flax uses per-gate Dense layers (input gates
    without bias, hidden gates with bias = bias_ih + bias_hh).
    """
    h = weight_hh.shape[1]
    gates = ("i", "f", "g", "o")
    out: Dict = {}
    bias = np.asarray(bias_ih) + np.asarray(bias_hh)
    for k, gate in enumerate(gates):
        sl = slice(k * h, (k + 1) * h)
        out[f"i{gate}"] = {"kernel": dense_kernel(np.asarray(weight_ih)[sl])}
        out[f"h{gate}"] = {
            "kernel": dense_kernel(np.asarray(weight_hh)[sl]),
            "bias": bias[sl],
        }
    return out


def port_chromernn(state: Mapping[str, np.ndarray], layers: int = 2) -> Dict:
    """Map a torch ChromeRNN state_dict (reference models/ChromeModels.py:55-72:
    bidirectional nfeat/2-hidden LSTM + BatchNorm1d + Linear head) into
    {params, batch_stats} for models.chrome.ChromeRNN.

    The flax cells are auto-named in declaration order per layer:
    OptimizedLSTMCell_{2L} = forward layer L, _{2L+1} = backward layer L.
    """

    def g(key):
        return np.asarray(state[key])

    params: Dict = {}
    for layer in range(layers):
        for j, suffix in enumerate(("", "_reverse")):
            params[f"OptimizedLSTMCell_{2 * layer + j}"] = lstm_cell(
                g(f"lstm.weight_ih_l{layer}{suffix}"),
                g(f"lstm.weight_hh_l{layer}{suffix}"),
                g(f"lstm.bias_ih_l{layer}{suffix}"),
                g(f"lstm.bias_hh_l{layer}{suffix}"),
            )
    frag = batchnorm({k: g(f"batch_norm.{k}") for k in
                      ("weight", "bias", "running_mean", "running_var")})
    params["batch_norm"] = frag["params"]
    params["out"] = {"kernel": dense_kernel(g("out.weight")), "bias": g("out.bias")}
    return {"params": params, "batch_stats": {"batch_norm": frag["batch_stats"]}}


def port_danq(state: Mapping[str, np.ndarray]) -> Dict:
    """Map a torch DanQ state_dict (reference models/WindowModels.py:158-204)
    into {params} for models.window.DanQ.

    The flax BiLSTM cells are auto-named in declaration order:
    OptimizedLSTMCell_0 = forward layer 0, _1 = backward layer 0,
    _2 = forward layer 1, _3 = backward layer 1. The post-LSTM flatten is
    position-major in both frameworks, so linear1 ports with a plain
    transpose.
    """

    def g(key):
        return np.asarray(state[key])

    cells = {}
    order = [("l0", ""), ("l0", "_reverse"), ("l1", ""), ("l1", "_reverse")]
    for i, (layer, suffix) in enumerate(order):
        lnum = layer[1]
        cells[f"OptimizedLSTMCell_{i}"] = lstm_cell(
            g(f"BiLSTM.weight_ih_l{lnum}{suffix}"),
            g(f"BiLSTM.weight_hh_l{lnum}{suffix}"),
            g(f"BiLSTM.bias_ih_l{lnum}{suffix}"),
            g(f"BiLSTM.bias_hh_l{lnum}{suffix}"),
        )

    params = {
        "embed": {"embedding": g("src_word_emb.weight")},
        "conv1": {
            "kernel": conv1d_kernel(g("Conv1.weight")),
            "bias": g("Conv1.bias"),
        },
        "bilstm": cells,
        "linear1": {"kernel": dense_kernel(g("Linear1.weight")), "bias": g("Linear1.bias")},
        "linear2": {"kernel": dense_kernel(g("Linear2.weight")), "bias": g("Linear2.bias")},
    }
    return {"params": params}
