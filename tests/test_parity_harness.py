"""The chr-scale parity harness (utils.parity / parity_chr.py) at CI scale:
same code path — torch.sparse oracle, ported checkpoint, per-layer capture —
at a smaller N so the CPU mesh can run it. The full N≈50k compiled-kernel
run is parity_chr.py on the TPU."""

import numpy as np

from chromegcn_tpu.utils.parity import (
    LAYER_ORDER,
    chromegcn_chr_parity,
    make_chromegcn_state,
    torch_chromegcn_oracle,
)


def test_chr_parity_harness_small_scale():
    report = chromegcn_chr_parity(
        n_valid=1900, n_pad=2048, n_pairs=6000, d=32, nclass=21
    )
    assert set(report) == {"xla", "pallas"}
    for impl, per_layer in report.items():
        assert set(per_layer) == set(LAYER_ORDER)
        worst = max(per_layer.values())
        assert worst < 2e-4, (impl, per_layer)


def test_oracle_is_deterministic_and_layered():
    state = make_chromegcn_state(8, 5, seed=1)
    s = np.array([0, 1, 2], np.int32)
    r = np.array([1, 2, 0], np.int32)
    v = np.array([0.5, 0.25, 1.0], np.float32)
    x = np.random.default_rng(2).normal(size=(4, 8)).astype(np.float32)
    a = torch_chromegcn_oracle(state, s, r, v, 4, x)
    b = torch_chromegcn_oracle(state, s, r, v, 4, x)
    assert set(a) == set(LAYER_ORDER)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])
    assert a["out"].shape == (4, 5)
