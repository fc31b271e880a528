"""Backward warping / warp-grid construction.

Parity targets: ``warp`` / ``warpgrid`` / ``warpgrid2`` in the reference
(``codes/models/modules/warplayer.py:9-47``). Flow tensors here are NHWC with
``flow[..., 0] = horizontal (x)`` and ``flow[..., 1] = vertical (y)`` pixel
displacements — the same channel order as the reference's ``flow[:, 0:1]`` /
``flow[:, 1:2]``.

Note the reference's two normalization conventions, reproduced exactly:
``warp`` divides flow by the *input image* dims, ``warpgrid`` by the *flow
tensor's own* dims (``warplayer.py:35-36``). Both use the align_corners=True
base lattice ``linspace(-1, 1, n)``.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from stif_tpu.ops.grid_sample import grid_sample


def _base_grid(h: int, w: int):
    """(h, w, 2) grid of linspace(-1,1) coords, channel order (x, y)."""
    gx = np.linspace(-1.0, 1.0, w, dtype=np.float64)
    gy = np.linspace(-1.0, 1.0, h, dtype=np.float64)
    g = np.stack(np.meshgrid(gx, gy, indexing="xy"), axis=-1).astype(np.float32)
    return jnp.asarray(g)


def warp_grid(flow):
    """Normalized sampling grid for backward warping.

    ``flow``: (B, H, W, 2) pixel-displacement field. Returns (B, H, W, 2) grid
    in (x, y) order: base lattice + flow normalized by the flow's own dims
    ((W-1)/2, (H-1)/2).
    """
    B, H, W, _ = flow.shape
    fn = jnp.stack(
        [flow[..., 0] / ((W - 1.0) / 2.0), flow[..., 1] / ((H - 1.0) / 2.0)],
        axis=-1,
    )
    return _base_grid(H, W)[None] + fn


def backward_warp(x, flow):
    """Backward-warp ``x`` (B, H, W, C) by ``flow`` (B, Hf, Wf, 2).

    Flow is normalized by the *input* dims; sampling is bilinear with border
    padding and align_corners=True (reference ``warp``).
    """
    B, Hf, Wf, _ = flow.shape
    fn = jnp.stack(
        [
            flow[..., 0] / ((x.shape[2] - 1.0) / 2.0),
            flow[..., 1] / ((x.shape[1] - 1.0) / 2.0),
        ],
        axis=-1,
    )
    g = _base_grid(Hf, Wf)[None] + fn
    return grid_sample(x, g, mode="bilinear", padding_mode="border",
                       align_corners=True)


def warp_grid_coords(coords, flow, h: int, w: int):
    """Add a flow to an explicit flat coordinate list (reference ``warpgrid2``).

    ``coords``: (B, Q, 2) in (y, x) order (LIIF convention);
    ``flow``: (B, Q, 2) pixel displacements in (x, y) order.
    Returns clamped (B, Q, 2) grid in (y, x) order.
    """
    fn = jnp.stack(
        [flow[..., 0] / ((w - 1.0) / 2.0), flow[..., 1] / ((h - 1.0) / 2.0)],
        axis=-1,
    )
    g = coords + fn[..., ::-1]
    return jnp.clip(g, -1 + 1e-6, 1 - 1e-6)
