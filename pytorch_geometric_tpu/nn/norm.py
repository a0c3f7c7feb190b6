"""Normalisation layers for padded node sets.

Reference GIN examples use ``torch.nn.BatchNorm1d`` over nodes
(examples/mutag_gin.py:25-43).  Under the TPU static-padding design the
node axis contains padding rows; naive BatchNorm would fold their zeros
into the batch statistics.  ``MaskedBatchNorm`` computes masked moments
(and keeps EMA running stats for eval), restoring the reference
semantics exactly.
"""

import jax.numpy as jnp
from flax import linen as nn


class MaskedBatchNorm(nn.Module):
    momentum: float = 0.9
    epsilon: float = 1e-5
    use_scale: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, mask=None, *, train: bool = False):
        F = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((F,)))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((F,)))
        if train:
            if mask is None:
                mean = jnp.mean(x, axis=0)
                var = jnp.var(x, axis=0)
            else:
                m = mask.astype(x.dtype)[:, None]
                cnt = jnp.maximum(jnp.sum(m), 1.0)
                mean = jnp.sum(x * m, axis=0) / cnt
                var = jnp.sum(((x - mean) ** 2) * m, axis=0) / cnt
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + \
                    (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + \
                    (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (x - mean) / jnp.sqrt(var + self.epsilon)
        if self.use_scale:
            y = y * self.param("scale", nn.initializers.ones, (F,))
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (F,))
        return y
