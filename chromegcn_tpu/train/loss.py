"""Losses: binary cross-entropy with logits, with row masking for padding.

Reference loss: ``F.binary_cross_entropy_with_logits(pred, tgt)`` with the
default mean reduction (reference: pretrain.py:44, finetune.py:45). Padded
rows (static-shape batches / padded chromosome nodes) are excluded so the
mean matches the reference's over real rows exactly.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def bce_with_logits(
    logits: jax.Array,
    targets: jax.Array,
    row_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Mean BCE-with-logits over valid rows.

    Numerically stable form: max(x,0) - x*z + log1p(exp(-|x|)).

    Args:
      logits: (N, L) raw scores.
      targets: (N, L) {0,1} labels (any float/int dtype).
      row_mask: optional (N,) bool; False rows are excluded from the mean.
    """
    x = logits.astype(jnp.float32)
    z = targets.astype(jnp.float32)
    per_elem = jnp.maximum(x, 0.0) - x * z + jnp.log1p(jnp.exp(-jnp.abs(x)))
    if row_mask is None:
        return jnp.mean(per_elem)
    m = row_mask.astype(jnp.float32)[:, None]
    denom = jnp.maximum(jnp.sum(m) * per_elem.shape[1], 1.0)
    return jnp.sum(per_elem * m) / denom
