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
    in_features: int
    is_first: bool = False
    omega0: float = 30.0
    final_linear: bool = False  # plain linear output (no sine)

    def setup(self):
        if self.is_first:
            kinit = siren_first
        else:
            kinit = siren_hidden(self.omega0)
        self.kernel = self.param("kernel", kinit,
                                 (self.in_features, self.features))
        # torch nn.Linear default bias: U(+-1/sqrt(fan_in)) — SIREN's init
        # only overrides the weight (SIREN.py:35-43).
        self.bias = self.param("bias", torch_default_bias_for(self.in_features),
                               (self.features,))

    def weights(self):
        """(kernel, bias) — used by the fused Pallas path."""
        return self.kernel, self.bias

    def __call__(self, x):
        y = jnp.dot(x, self.kernel.astype(x.dtype),
                    preferred_element_type=jnp.float32) + self.bias
        if self.final_linear:
            return y.astype(x.dtype)
        return jnp.sin(self.omega0 * y).astype(x.dtype)


class Siren(nn.Module):
    """net = [Sine(first), Sine x hidden_layers, Linear|Sine].

    With ``use_pallas`` the whole chain runs as one fused Pallas kernel
    (``stif_tpu.ops.siren_pallas``): query tiles stay in VMEM through every
    layer. Requires ``outermost_linear`` (the only form the models use) and a
    TPU backend.
    """

    hidden_features: Sequence[int]
    hidden_layers: int
    out_features: int
    outermost_linear: bool = True
    first_omega0: float = 30.0
    hidden_omega0: float = 30.0
    use_pallas: bool = False
    # e.g. jnp.bfloat16: half-width MLP matmuls on the MXU. Accumulation and
    # the sine stay fp32 (SirenDense uses preferred_element_type=f32); only
    # layer inputs/weights are narrowed. Output is cast back to the caller's
    # dtype. Quality-gate on a trained checkpoint before enabling.
    compute_dtype: object = None
    # split-K first layer for tuple inputs: y0 = sum_i x_i @ W[k_i] + b — the
    # wide (Q, sum_i c_i) concat never materializes in HBM. Same math to
    # fp32-accumulation reordering (measured 4.5e-8 on the 525-wide
    # encode_imnet, ~18% faster there: DECODE_DECOMPOSE_r04.jsonl). Default
    # off: flip only behind a trained-quality gate, like compute_dtype.
    split_first: bool = False

    @nn.compact
    def __call__(self, x):
        """``x``: features-last array, or a tuple/list of arrays to be
        concatenated on the feature axis — with ``use_pallas`` the concat
        happens per-tile in VMEM (the wide input never hits HBM)."""
        is_multi = isinstance(x, (tuple, list))
        cin = (sum(v.shape[-1] for v in x) if is_multi else x.shape[-1])
        dims = ([cin] + list(self.hidden_features[: self.hidden_layers + 1])
                + [self.out_features])
        layers = [
            SirenDense(dims[1], dims[0], is_first=True,
                       omega0=self.first_omega0, name="layer0")
        ]
        for i in range(self.hidden_layers):
            layers.append(
                SirenDense(dims[i + 2], dims[i + 1],
                           omega0=self.hidden_omega0, name=f"layer{i + 1}")
            )
        layers.append(
            SirenDense(dims[-1], dims[-2], omega0=self.hidden_omega0,
                       final_linear=self.outermost_linear,
                       name=f"layer{self.hidden_layers + 1}")
        )

        # compute_dtype wins over use_pallas: the fused kernel is fp32-only,
        # and silently ignoring the narrower mode would corrupt bf16-vs-
        # pallas A/B provenance (both knobs are plumbed from LunaTokis).
        # use_pallas vs split_first is NOT a silent precedence: the fused
        # kernel ignores split_first, so asking for both is a config error
        # (ADVICE r4 — bench provenance would otherwise record split-K as
        # active on a path that never splits).
        if (self.use_pallas and self.outermost_linear
                and self.compute_dtype is None):
            assert not self.split_first, (
                "Siren: use_pallas and split_first are mutually exclusive — "
                "the fused Pallas kernel has no split-K form; disable one"
            )
            from stif_tpu.ops.siren_pallas import siren_apply_fused

            ws, bs = zip(*[layer.weights() for layer in layers])
            assert self.first_omega0 == self.hidden_omega0
            return siren_apply_fused(x, list(ws), list(bs),
                                     omega0=self.hidden_omega0)

        if is_multi and self.split_first:
            out_dtype = x[0].dtype
            parts = [v.astype(self.compute_dtype)
                     if self.compute_dtype is not None else v for v in x]
            l0 = layers[0]
            kernel, bias = l0.weights()
            y = None
            off = 0
            for v in parts:
                c = v.shape[-1]
                t = jnp.dot(v, kernel[off:off + c].astype(v.dtype),
                            preferred_element_type=jnp.float32)
                y = t if y is None else y + t
                off += c
            y = y + bias
            h = jnp.sin(l0.omega0 * y).astype(parts[0].dtype)
            for layer in layers[1:]:
                h = layer(h)
            return h.astype(out_dtype)

        if is_multi:
            x = jnp.concatenate(list(x), axis=-1)
        out_dtype = x.dtype
        if self.compute_dtype is not None:
            x = x.astype(self.compute_dtype)
        for layer in layers:
            x = layer(x)
        return x.astype(out_dtype)
