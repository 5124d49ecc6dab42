"""Non-strand-specific wrapper: run both strands, average the *logits*.

Reference: models/NonStrandSpecific.py:47-97 (GraphNonStrandSpecific) —
returns the forward-strand features, reverse-strand features, and the mean
of the two logit tensors (logits, not probabilities — load-bearing for
parity; reference: models/NonStrandSpecific.py:92-94).

TPU note: both strand passes share one weight set, so we batch them into a
single model call (2B batch) — one conv stack launch instead of two, better
MXU utilization at small batch sizes.

Documented divergence: in train mode the torch reference runs two separate
passes, so BatchNorm statistics are computed per-strand and running stats
update twice per step; here statistics are computed once over the combined
2B batch (strand-symmetric, arguably better estimates). Eval-mode behavior
(running averages) is identical.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from chromegcn_tpu.ops.seq import reverse_complement


class NonStrandSpecific(nn.Module):
    """Wraps a window model; forward + reverse-complement strand averaging.

    Call args:
      tokens: (B, L) int tokens.
      comp_map: (V,) complement permutation (see ops.seq).
      train: dropout/batch-stats mode.

    Returns:
      (x_fwd, x_rev, logits_mean): features for each strand and averaged
      logits. Matches the reference return contract used by pretrain.py:37.
    """

    model: nn.Module
    mode: str = "mean"

    @nn.compact
    def __call__(
        self, tokens: jax.Array, comp_map: jax.Array, train: bool
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        if self.mode != "mean":
            raise NotImplementedError("only 'mean' mode is supported (as used by the reference)")
        b = tokens.shape[0]
        rc = reverse_complement(tokens, comp_map)
        both = jnp.concatenate([tokens, rc], axis=0)  # (2B, L)
        x_both, y_both = self.model(both, train)
        x_fwd, x_rev = x_both[:b], x_both[b:]
        logits = (y_both[:b] + y_both[b:]) / 2.0
        return x_fwd, x_rev, logits
