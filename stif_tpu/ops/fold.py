"""3x3 overlap-add fold (torch ``F.fold(kernel_size=3, padding=1)`` parity).

Parity target: the train-variant decoder's patch assembly
(``codes/models/modules/Sakuya_arch.py:458``): the encode MLP predicts
overlapping 3x3 RGB patches per query which are summed back onto the canvas.

Implemented as a sum of 9 statically shifted slices of a zero-padded canvas —
pure static-shape XLA, no scatter.
"""

from __future__ import annotations

import jax.numpy as jnp


def fold3x3(x):
    """(B, H, W, C*9) -> (B, H, W, C) overlap-add.

    Input channel layout matches torch fold: channel ``c*9 + i*3 + j`` is the
    patch value at offset ``(i-1, j-1)`` from the query pixel.
    """
    B, H, W, C9 = x.shape
    C = C9 // 9
    x = x.reshape(B, H, W, C, 3, 3)
    # Contribution of a patch centered at p to output pixel p + (i-1, j-1):
    # out[y, x] = sum_{i,j} patches[y - (i-1), x - (j-1), i, j].
    out = jnp.zeros((B, H + 2, W + 2, C), dtype=x.dtype)
    for i in range(3):
        for j in range(3):
            out = out.at[:, i:i + H, j:j + W, :].add(x[..., i, j])
    return out[:, 1:1 + H, 1:1 + W, :]
