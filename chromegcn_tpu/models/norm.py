"""Batch normalization with torch-parity semantics and node masking.

Two reasons not to use ``flax.linen.BatchNorm`` directly:

1. Torch parity: ``torch.nn.BatchNorm1d`` normalizes with the *biased*
   batch variance but updates running stats with the *unbiased* variance
   (momentum 0.1). The GCN-head warm-start copies the CNN's BatchNorm
   scale/bias (reference: main.py:78-81), and the BASELINE requires
   per-layer allclose parity, so these details are load-bearing.

2. Masking: chromosome node tensors are padded to static shapes. BatchNorm
   over nodes (reference: models/ChromeModels.py:49 — BatchNorm1d over the
   N x 128 node matrix) must exclude padding rows from mean/var or the
   statistics drift with the padding fraction.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over leading axes with an optional validity mask.

    Input: (..., C); statistics are computed over all leading axes
    (equivalently: torch BatchNorm1d on (B, C) or on (B, C, L) after
    moving C last). ``mask`` broadcasts over the leading axes; masked-out
    rows neither contribute to statistics nor receive meaningful outputs
    (they are normalized with the valid-row stats, harmless since they are
    dropped downstream).

    Args (call):
      x: (..., C) activations.
      use_running_average: eval mode — normalize with stored stats.
      mask: optional (...,) bool — True for valid rows.
    """

    momentum: float = 0.1  # torch default: new = (1-m)*old + m*batch
    epsilon: float = 1e-5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        use_running_average: bool,
        mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(features, jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(features, jnp.float32)
        )

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            x32 = x.astype(jnp.float32)
            reduce_axes = tuple(range(x.ndim - 1))
            if mask is None:
                n = jnp.asarray(
                    jnp.prod(jnp.asarray(x.shape[:-1])), dtype=jnp.float32
                )
                mean = jnp.mean(x32, axis=reduce_axes)
                var = jnp.mean(jnp.square(x32 - mean), axis=reduce_axes)
            else:
                # broadcast the mask across any extra leading axes (e.g. a
                # strand axis in (N, S, C) inputs), then add the channel axis
                m = mask.astype(jnp.float32)
                m = m.reshape(m.shape + (1,) * (x.ndim - 1 - m.ndim))
                m = jnp.broadcast_to(m, x.shape[:-1])[..., None]
                n = jnp.maximum(jnp.sum(m), 1.0)
                mean = jnp.sum(x32 * m, axis=reduce_axes) / n
                var = jnp.sum(jnp.square(x32 - mean) * m, axis=reduce_axes) / n

            if not self.is_initializing():
                # torch updates running_var with the unbiased estimate.
                unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))
                ra_mean.value = (
                    (1.0 - self.momentum) * ra_mean.value + self.momentum * mean
                )
                ra_var.value = (
                    (1.0 - self.momentum) * ra_var.value + self.momentum * unbiased
                )

        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        return y.astype(self.dtype or x.dtype)
