"""Parameter init helpers.

Reference counterpart: ``torch_geometric.nn.inits.uniform/zeros/glorot``
(reference usage: examples/infomax.py:8,42; gmm_conv.py:9,89-93).
Exposed both as flax-style initializer factories (for linen modules) and
as direct array constructors.
"""

import math

import jax
import jax.numpy as jnp


def uniform(size: int):
    """PyG's fan-based uniform: U(-1/sqrt(size), 1/sqrt(size))."""
    bound = 1.0 / math.sqrt(size) if size > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def glorot(key, shape, dtype=jnp.float32):
    """Glorot/Xavier uniform over the last two dims (PyG semantics:
    stdv = sqrt(6 / (fan_in + fan_out)))."""
    fan_in, fan_out = shape[-2], shape[-1]
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def zeros(key, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


def ones(key, shape, dtype=jnp.float32):
    return jnp.ones(shape, dtype)


def kaiming_uniform(key, shape, dtype=jnp.float32, fan=None, a=math.sqrt(5)):
    fan = fan if fan is not None else shape[-2]
    gain = math.sqrt(2.0 / (1 + a ** 2))
    bound = gain * math.sqrt(3.0 / fan)
    return jax.random.uniform(key, shape, dtype, -bound, bound)
