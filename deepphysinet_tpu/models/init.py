"""Initializers matching the reference's torch defaults.

Training dynamics in the reference depend on torch's default Linear/Conv init
(uniform +-1/sqrt(fan_in) for kernels and biases) and on the learnable tokens
being drawn from U[0, 1) (model/transformer_net.py:102).  Flax defaults differ
(lecun_normal, zero bias), so these are provided explicitly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def torch_kernel_init(key, shape, dtype=jnp.float32):
    """Dense kernel [fan_in, fan_out]: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / np.sqrt(shape[0])
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init(fan_in: int):
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def kaiming_normal_conv_init(key, shape, dtype=jnp.float32):
    """Conv kernel [k, c_in, c_out], fan_in mode, leaky_relu gain (embed.py:43-45)."""
    fan_in = shape[0] * shape[1]
    gain = np.sqrt(2.0 / (1.0 + 0.01**2))
    std = gain / np.sqrt(fan_in)
    return std * jax.random.normal(key, shape, dtype)


def uniform01_init(key, shape, dtype=jnp.float32):
    """U[0, 1), for the learnable tokens (model/transformer_net.py:102)."""
    return jax.random.uniform(key, shape, dtype)
