"""Basic conv building blocks (channels-last).

Parity targets: ``ResidualBlock_noBN`` / ``make_layer``
(``codes/models/modules/module_util.py:27-52``) and the plain conv + leaky-ReLU
idiom used throughout the encoder.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import flax.linen as nn

from stif_tpu.nn.init import (
    scaled_kaiming_normal,
    torch_default_kernel,
)


def lrelu(x):
    """LeakyReLU(0.1) — the reference's universal activation."""
    return jax.nn.leaky_relu(x, negative_slope=0.1)


class Conv(nn.Module):
    """2D conv, NHWC, HWIO kernel, torch-compatible defaults.

    ``padding`` is an explicit symmetric pixel count (torch convention), not
    'SAME', so strided convs produce torch-identical output sizes.
    """

    features: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 1
    use_bias: bool = True
    kernel_init: Callable = torch_default_kernel
    bias_init: Optional[Callable] = None  # default: torch U(+-1/sqrt(fan_in))

    @nn.compact
    def weights(self, cin: int):
        """Declare and return (kernel, bias) for a given input width —
        lets callers fuse several same-shaped convs into one grouped conv
        (see ``pcd._dual_conv``) without changing the parameter tree."""
        ks = (self.kernel_size,) * 2 if isinstance(self.kernel_size, int) else self.kernel_size
        kernel = self.param(
            "kernel", self.kernel_init, (ks[0], ks[1], cin, self.features)
        )
        bias = None
        if self.use_bias:
            fan_in = ks[0] * ks[1] * cin
            bias_init = self.bias_init
            if bias_init is None:
                bound = 1.0 / jnp.sqrt(fan_in)

                def bias_init(key, shape, dtype=jnp.float32):
                    return jax.random.uniform(key, shape, dtype, -bound, bound)

            bias = self.param("bias", bias_init, (self.features,))
        return kernel, bias

    def __call__(self, x):
        ks = (self.kernel_size,) * 2 if isinstance(self.kernel_size, int) else self.kernel_size
        st = (self.stride,) * 2 if isinstance(self.stride, int) else self.stride
        pd = (self.padding,) * 2 if isinstance(self.padding, int) else self.padding
        kernel, bias = self.weights(x.shape[-1])
        dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype),
            window_strides=st,
            padding=((pd[0], pd[0]), (pd[1], pd[1])),
            dimension_numbers=dn,
        )
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y


class ResidualBlockNoBN(nn.Module):
    """conv-ReLU-conv + identity, kaiming init scaled x0.1, zero bias."""

    nf: int = 64

    @nn.compact
    def __call__(self, x):
        out = Conv(self.nf, 3, 1, 1,
                   kernel_init=scaled_kaiming_normal(0.1),
                   bias_init=nn.initializers.zeros, name="conv1")(x)
        out = jax.nn.relu(out)
        out = Conv(self.nf, 3, 1, 1,
                   kernel_init=scaled_kaiming_normal(0.1),
                   bias_init=nn.initializers.zeros, name="conv2")(out)
        return x + out


class _ScanBlockBody(nn.Module):
    nf: int

    @nn.compact
    def __call__(self, carry, _):
        return ResidualBlockNoBN(self.nf, name="block")(carry), None


class ResidualTrunk(nn.Module):
    """``make_layer``: n_blocks sequential residual blocks.

    For deep trunks (the 40-block recon trunk) the blocks are ``nn.scan``-ned
    with per-block stacked parameters: the body compiles once instead of
    unrolling 80 convs into the HLO — compile time stays flat in depth while
    the computation is identical. Shallow trunks stay unrolled (marginally
    better fusion). Checkpoint conversion handles both layouts
    (``stif_tpu/convert``).
    """

    nf: int = 64
    n_blocks: int = 5
    scan_threshold: int = 8

    @nn.compact
    def __call__(self, x):
        if self.n_blocks >= self.scan_threshold:
            scan = nn.scan(
                _ScanBlockBody,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=self.n_blocks,
            )
            x, _ = scan(self.nf, name="blocks")(x, None)
            return x
        for i in range(self.n_blocks):
            x = ResidualBlockNoBN(self.nf, name=f"block{i}")(x)
        return x
