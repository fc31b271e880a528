"""SIREN coordinate MLP.

Parity target: ``codes/models/modules/SIREN.py:14-79`` — sine-activated MLP
with omega_0=30, per-layer uniform init, optional plain linear output layer.
``hidden_features`` is a per-layer width list, as in the reference.

The decoder evaluates these MLPs over millions of (x, y, t) queries: each layer
is a (Q, in) x (in, out) matmul — pure MXU work. The module is
layout-agnostic: any leading batch dims, features last.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from stif_tpu.nn.init import siren_first, siren_hidden, torch_default_bias_for


class SirenDense(nn.Module):
    features: int
    is_first: bool = False
    omega0: float = 30.0
    final_linear: bool = False  # plain linear output (no sine)

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        if self.is_first:
            kinit = siren_first
        else:
            kinit = siren_hidden(self.omega0)
        kernel = self.param("kernel", kinit, (cin, self.features))
        # torch nn.Linear default bias: U(+-1/sqrt(fan_in)) — SIREN's init
        # only overrides the weight (SIREN.py:35-43).
        bias = self.param("bias", torch_default_bias_for(cin), (self.features,))
        y = jnp.dot(x, kernel.astype(x.dtype),
                    preferred_element_type=jnp.float32) + bias
        if self.final_linear:
            return y.astype(x.dtype)
        return jnp.sin(self.omega0 * y).astype(x.dtype)


class Siren(nn.Module):
    """net = [Sine(first), Sine x hidden_layers, Linear|Sine]."""

    hidden_features: Sequence[int]
    hidden_layers: int
    out_features: int
    outermost_linear: bool = True
    first_omega0: float = 30.0
    hidden_omega0: float = 30.0

    @nn.compact
    def __call__(self, x):
        x = SirenDense(self.hidden_features[0], is_first=True,
                       omega0=self.first_omega0, name="layer0")(x)
        for i in range(self.hidden_layers):
            x = SirenDense(self.hidden_features[i + 1],
                           omega0=self.hidden_omega0, name=f"layer{i + 1}")(x)
        x = SirenDense(self.out_features, omega0=self.hidden_omega0,
                       final_linear=self.outermost_linear,
                       name=f"layer{self.hidden_layers + 1}")(x)
        return x
