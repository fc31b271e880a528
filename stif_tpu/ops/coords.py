"""LIIF coordinate helpers.

Parity target: ``make_coord`` in the reference architecture
(``codes/models/modules/Sakuya_arch_test.py:1233-1248``) — cell-center
coordinates in [-1, 1], row-major (y, x) channel order — and the zoom-demo
variant ``make_coord_demo`` (``:1250-1277``).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def make_coord(shape, ranges=None, flatten: bool = True, dtype=jnp.float32):
    """Coordinates at grid-cell centers.

    For each axis ``i`` with ``n = shape[i]`` and range ``(v0, v1)`` (default
    ``(-1, 1)``), produces ``v0 + r + 2*r*arange(n)`` with ``r = (v1-v0)/(2n)``.
    Output has last-dim channel order matching the axis order of ``shape``
    (i.e. ``(y, x)`` for a ``(H, W)`` shape).

    Returns ``(*shape, len(shape))`` or ``(prod(shape), len(shape))`` if
    ``flatten``.
    """
    seqs = []
    for i, n in enumerate(shape):
        v0, v1 = (-1.0, 1.0) if ranges is None else ranges[i]
        r = (v1 - v0) / (2 * n)
        seqs.append(v0 + r + (2 * r) * np.arange(n, dtype=np.float64))
    grids = np.meshgrid(*seqs, indexing="ij")
    ret = np.stack(grids, axis=-1).astype(np.float32)
    if flatten:
        ret = ret.reshape(-1, ret.shape[-1])
    return jnp.asarray(ret, dtype=dtype)


def make_coord_demo(shape, new_shape, center):
    """Zoom-demo coordinate window: a ``new_shape`` crop of the full grid's
    cell lattice centered at ``center`` (normalized coords), shifted right/down
    if it underflows -1. Mirrors the reference demo helper.
    """
    interval = (2.0 / shape[0], 2.0 / shape[1])
    seqs = []
    for i, n in enumerate(new_shape):
        if n % 2 == 0:
            v0 = -interval[i] * (n / 2) + interval[i] / 2 + center[i]
        else:
            v0 = -interval[i] * (n // 2) + center[i]
        seq = v0 + interval[i] * np.arange(n, dtype=np.float64)
        if seq.min() < -1:
            seq = seq + (-1 - seq.min())
        seqs.append(seq)
    grids = np.meshgrid(*seqs, indexing="ij")
    ret = np.stack(grids, axis=-1).astype(np.float32).reshape(-1, len(new_shape))
    return jnp.asarray(ret)
