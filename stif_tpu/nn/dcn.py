"""DCN_sep module: deformable conv whose offsets/mask come from a *different*
feature map than the one convolved — the PCD trick.

Parity target: ``codes/models/modules/DCNv2/dcn_v2.py:110-140`` (DCN_sep) on
top of the CUDA kernel semantics implemented in ``stif_tpu.ops.deform_conv``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from stif_tpu.nn.blocks import Conv
from stif_tpu.ops.deform_conv import deform_conv2d, split_offset_mask


class DCNSep(nn.Module):
    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    deformable_groups: int = 8
    gather_dtype: object = None  # e.g. jnp.bfloat16: faster, lossier gathers
    impl: str = "auto"           # "auto"/"patch" gather | "dense" shifts
    shift_bound: int = 6         # dense impl: max |shift| covered (exact iff
                                 # dcn_shift_stats(offsets) <= this)

    @nn.compact
    def __call__(self, x, fea):
        """x: features to convolve; fea: features producing offsets/mask."""
        G = self.deformable_groups
        k = self.kernel_size
        raw = Conv(G * 3 * k * k, k, self.stride, self.padding,
                   kernel_init=nn.initializers.zeros,
                   bias_init=nn.initializers.zeros,
                   name="conv_offset_mask")(fea)
        offset, mask = split_offset_mask(raw, G, k)

        cin = x.shape[-1]
        # torch DCNv2.reset_parameters: U(+-1/sqrt(Cin*k*k)), zero bias
        # (dcn_v2.py:69-75).
        stdv = 1.0 / np.sqrt(cin * k * k)
        weight = self.param(
            "weight",
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32,
                                                  -stdv, stdv),
            (k, k, cin, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return deform_conv2d(x, offset, mask, weight, bias,
                             stride=self.stride, padding=self.padding,
                             dilation=self.dilation, impl=self.impl,
                             gather_dtype=self.gather_dtype,
                             shift_bound=self.shift_bound)
