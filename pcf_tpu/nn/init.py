"""torch-default Linear initializers.

The reference never calls util.common_util.init_weights from its trainer —
every Linear trains from torch's nn.Linear.reset_parameters() defaults:
  weight ~ kaiming_uniform_(a=sqrt(5))  ==  U(-1/sqrt(fan_in), 1/sqrt(fan_in))
  bias   ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in))
flax's Dense defaults (lecun_normal kernel, zero bias) are a different
distribution family; matching the reference's init removes one more
degree of freedom from the from-scratch-training parity story.

flax Dense kernels are [fan_in, fan_out]; torch weights are the transpose —
fan_in is shape[0] here either way.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def torch_linear_kernel(key, shape, dtype=jnp.float32):
    bound = 1.0 / jnp.sqrt(jnp.maximum(shape[0], 1))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_bias(fan_in: int):
    """Bias init needs the layer's fan_in, which flax doesn't pass to bias
    initializers (bias shape is [out]); close over it."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / jnp.sqrt(jnp.maximum(fan_in, 1))
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init
