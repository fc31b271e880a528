"""Weight initializers reproducing the reference's training initialization.

- torch's nn.Conv2d/nn.Linear default: kaiming_uniform(a=sqrt(5)) for weights
  => U(-1/sqrt(fan_in), 1/sqrt(fan_in)); bias U(-1/sqrt(fan_in), 1/sqrt(fan_in)).
- residual blocks: kaiming_normal(fan_in) scaled by 0.1, zero bias
  (``codes/models/modules/module_util.py:7-24, 46``).
- SIREN layers: U(-1/n, 1/n) first, U(-sqrt(6/n)/omega, +) hidden
  (``codes/models/modules/SIREN.py:35-45``).
- DCN offset/mask conv: zeros (``DCNv2/dcn_v2.py:123-125``).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import random


def _fan_in(shape):
    # HWIO conv kernels or (in, out) dense kernels.
    if len(shape) == 4:
        return shape[0] * shape[1] * shape[2]
    return shape[0]


def torch_default_kernel(key, shape, dtype=jnp.float32):
    bound = 1.0 / np.sqrt(_fan_in(shape))
    return random.uniform(key, shape, dtype, -bound, bound)


def torch_default_bias_for(fan_in: int):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / np.sqrt(fan_in)
        return random.uniform(key, shape, dtype, -bound, bound)

    return init


def scaled_kaiming_normal(scale: float = 0.1):
    """kaiming_normal(fan_in, a=0) * scale — residual-block init."""

    def init(key, shape, dtype=jnp.float32):
        std = np.sqrt(2.0 / _fan_in(shape))
        return random.normal(key, shape, dtype) * (std * scale)

    return init


def siren_first(key, shape, dtype=jnp.float32):
    n = _fan_in(shape)
    return random.uniform(key, shape, dtype, -1.0 / n, 1.0 / n)


def siren_hidden(omega: float = 30.0):
    def init(key, shape, dtype=jnp.float32):
        n = _fan_in(shape)
        b = np.sqrt(6.0 / n) / omega
        return random.uniform(key, shape, dtype, -b, b)

    return init
