"""Chr-scale parity check: torch oracle vs XLA vs Pallas, per-layer.

Runs the BASELINE "per-layer activations allclose" claim at the scale the
benchmark runs (N≈50k, chr1-sized Hi-C graph) instead of toy N — see
chromegcn_tpu/utils/parity.py. Prints one JSON line with per-layer
max-abs errors per impl and PASS/FAIL against the threshold.

On the TPU this exercises the compiled Pallas kernel; on CPU (JAX_PLATFORMS
unset won't work here — the axon plugin overrides it; tests use the small-N
variant instead) the kernel runs in interpret mode.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_VALID = 49_000
N_PAD = 50_176
N_PAIRS = 180_000
THRESHOLD = 2e-4  # f32 accumulation noise over ~300k-edge rows, 2 layers


def main():
    import jax

    from chromegcn_tpu.utils.parity import chromegcn_chr_parity

    precision = os.environ.get("CHROMEGCN_PARITY_PRECISION", "high")
    report = chromegcn_chr_parity(N_VALID, N_PAD, N_PAIRS, precision=precision)
    worst = max(
        err for per in report.values() for err in per.values()
        if isinstance(err, float)  # skip the fused-path "_space" annotation
    )
    print(
        json.dumps(
            {
                "check": "chr-scale per-layer parity vs torch.sparse oracle",
                "matmul_precision": precision,
                "n_valid": N_VALID,
                "backend": jax.default_backend(),
                "max_abs_err": report,
                "worst": worst,
                "pass": worst < THRESHOLD,
            }
        ),
        flush=True,
    )
    sys.exit(0 if worst < THRESHOLD else 1)


if __name__ == "__main__":
    main()
