"""ChromeRNN chrome-stage step timing on the real chip (VERDICT r3 weak 5).

The ChromeRNN treats a chromosome's N windows as ONE sequence through a
2-layer BiLSTM (reference: models/ChromeModels.py:55-72) — on TPU this is
the lax.scan path, whose per-step latency (sequential, no batch to
amortize) is the likeliest performance trap. Times the full train step
(fwd+bwd, both strands) at one node bucket (N=2048) and reports ms/step
and windows/sec; fori-loop single-dispatch timing, median-of-5.

Run: python bench_rnn.py  (TPU, ~5 min incl. compile)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

N_VALID, N_PAD, D, NCLASS = 2000, 2048, 128, 919
ITERS = 5
REPEATS = 5


def main():
    import jax
    import jax.numpy as jnp

    from chromegcn_tpu.data.synthetic import make_hic_edges
    from chromegcn_tpu.models.chrome import ChromeRNN
    from chromegcn_tpu.ops.sparse import build_chrom_graph
    from chromegcn_tpu.train.finetune import chrome_train_step, create_chrome_state
    from chromegcn_tpu.train.optim import make_optimizer

    s, r, v = make_hic_edges(N_VALID, 10_000, seed=0)
    graph = build_chrom_graph("hic", n_valid=N_VALID, n_pad=N_PAD, hic_edges=(s, r, v))
    rng = np.random.default_rng(0)
    x_f = jnp.asarray(rng.normal(size=(N_PAD, D)).astype(np.float32))
    x_r = jnp.asarray(rng.normal(size=(N_PAD, D)).astype(np.float32))
    targets = jnp.asarray((rng.random((N_PAD, NCLASS)) < 0.1).astype(np.float32))

    with jax.default_matmul_precision("high"):
        model = ChromeRNN(nfeat=D, nclass=NCLASS, dropout=0.2)
        state = create_chrome_state(
            model, make_optimizer("sgd", 0.25), jax.random.PRNGKey(0),
            nfeat=D, n_nodes=256,
        )
        key = jax.random.PRNGKey(1)
        inner = chrome_train_step.__wrapped__

        def body(i, carry):
            st, _ = carry
            st, loss, _ = inner(st, x_f, x_r, graph, targets, key)
            return st, loss

        f = jax.jit(
            lambda st: jax.lax.fori_loop(0, ITERS, body, (st, jnp.float32(0)))
        )
        print("[rnn] compiling ...", flush=True)
        jax.block_until_ready(f(state))
        times = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            jax.block_until_ready(f(state))
            times.append((time.perf_counter() - t0) / ITERS)
    dt = float(np.median(times))
    print(json.dumps({
        "metric": "ChromeRNN chrome train step (fwd+bwd, both strands, "
                  "N=2048 sequence through 2-layer BiLSTM)",
        "value": round(N_PAD / dt, 1),
        "unit": "windows/sec",
        "detail": {
            "step_ms": round(dt * 1e3, 2),
            "step_ms_spread": [round(t * 1e3, 2) for t in sorted(times)],
            "scan_len": N_PAD, "d": D, "n_targets": NCLASS,
            "backend": jax.default_backend(),
        },
    }), flush=True)


if __name__ == "__main__":
    main()
