"""Window-stage (CNN pretrain) throughput: windows/sec/chip.

The GCN step has bench.py; this measures the other stage — the
strand-averaged Expecto train step at the reference recipe (batch 64,
seq 2000, 919 targets; reference README.md:34) — in the production
precision mode and optionally the bf16 fast mode.

Prints one JSON line. Run on the TPU; budget a few minutes for the
tunnel compile.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 64
SEQ = 2000
NCLASS = 919


def bench_precision(precision, model_name, iters=20):
    from chromegcn_tpu.data.constants import SRC_VOCAB
    from chromegcn_tpu.models.window import make_window_model
    from chromegcn_tpu.ops.seq import complement_permutation
    from chromegcn_tpu.train.optim import make_optimizer
    from chromegcn_tpu.train.pretrain import create_window_state, window_train_step

    import contextlib

    ctx = (
        jax.default_matmul_precision(precision)
        if precision
        else contextlib.nullcontext()
    )
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, 5, size=(BATCH, SEQ)).astype(np.int32))
    targets = jnp.asarray((rng.random((BATCH, NCLASS)) < 0.05).astype(np.float32))
    row_mask = jnp.ones(BATCH, bool)
    with ctx:
        model = make_window_model(model_name, n_targets=NCLASS, seq_length=SEQ)
        comp_map = jnp.asarray(complement_permutation(SRC_VOCAB))
        state = create_window_state(
            model, make_optimizer("sgd", 0.25), jax.random.PRNGKey(0),
            seq_length=SEQ, src_vocab=SRC_VOCAB,
        )
        key = jax.random.PRNGKey(1)

        # single-dispatch fori timing — the only pattern this backend times
        # honestly (DESIGN.md §7; a python step loop reported an impossible
        # 0.5 ms for a ~3.4 TFLOP step)
        inner = window_train_step.__wrapped__

        def body(i, carry):
            st, _ = carry
            st, loss, _ = inner(st, tokens, targets, row_mask, comp_map, key)
            return st, loss

        f = jax.jit(
            lambda st: jax.lax.fori_loop(0, iters, body, (st, jnp.float32(0)))
        )
        jax.block_until_ready(f(state))
        # median-of-5 launches: single-shot timings scatter ±15% on this
        # backend (DESIGN.md §7)
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(f(state))
            times.append((time.perf_counter() - t0) / iters)
        return float(np.median(times))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="expecto",
                   choices=["expecto", "deepsea", "danq"])
    p.add_argument("--fast", action="store_true",
                   help="also measure DEFAULT (bf16) precision")
    args = p.parse_args()

    dt = bench_precision("high", args.model)
    out = {
        "metric": f"windows/sec/chip, {args.model} pretrain step "
                  "(fwd+bwd, both strands, batch 64, seq 2000)",
        "value": round(BATCH / dt, 1),
        "unit": "windows/sec",
        "detail": {
            "step_ms": {"high": round(dt * 1e3, 3)},
            "batch": BATCH, "seq": SEQ, "n_targets": NCLASS,
            "matmul_precision": "high (production default)",
            "backend": jax.default_backend(),
        },
    }
    if args.fast:
        dtf = bench_precision(None, args.model)
        out["detail"]["step_ms"]["default_bf16"] = round(dtf * 1e3, 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
