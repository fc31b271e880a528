"""Pixel shuffle (depth-to-space) with torch channel ordering, NHWC.

Parity target: ``nn.PixelShuffle`` as used by the legacy x4 upsampling head
(``codes/models/modules/Sakuya_arch_test.py:295-299``) and the fixed-scale
models (``Sakuya_arch_o.py``, ``STVSR.py``).
"""

from __future__ import annotations

import jax.numpy as jnp


def pixel_shuffle(x, r: int):
    """(B, H, W, C*r*r) -> (B, H*r, W*r, C).

    Channel layout matches torch: input channel ``c*r*r + i*r + j`` lands at
    output pixel offset ``(i, j)`` of channel ``c``.
    """
    B, H, W, Crr = x.shape
    C = Crr // (r * r)
    x = x.reshape(B, H, W, C, r, r)
    x = jnp.transpose(x, (0, 1, 4, 2, 5, 3))  # B, H, i, W, j, C
    return x.reshape(B, H * r, W * r, C)
