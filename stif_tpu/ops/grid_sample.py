"""``grid_sample`` with exact PyTorch semantics, channels-last.

Parity target: ``torch.nn.functional.grid_sample`` as used throughout the
reference decoder (``codes/models/modules/Sakuya_arch_test.py:382-457``,
``warplayer.py:23``): modes ``nearest``/``bilinear``, padding
``zeros``/``border``, both ``align_corners`` conventions.

Differences from torch: the input is NHWC (TPU-native layout) instead of NCHW,
and the output is ``(B, Hg, Wg, C)``. The grid keeps torch's channel order:
``grid[..., 0] = x`` (width axis), ``grid[..., 1] = y`` (height axis), in
[-1, 1].

Implementation: coordinates are unnormalized, corner indices computed on the
VPU, and the four bilinear corner reads become a single batched gather over the
flattened spatial axis — XLA lowers this to an efficient dynamic-gather and
fuses the surrounding arithmetic.
"""

from __future__ import annotations

import jax.numpy as jnp


def _unnormalize(coord, size, align_corners):
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def _gather_hw(x_flat, idx):
    """x_flat: (B, H*W, C); idx: (B, Q) int32 -> (B, Q, C)."""
    return jnp.take_along_axis(x_flat, idx[..., None], axis=1)


def grid_sample(x, grid, mode: str = "bilinear", padding_mode: str = "zeros",
                align_corners: bool = False, impl: str = "auto",
                source_dtype=None):
    """Sample ``x`` (B, H, W, C) at ``grid`` (B, Hg, Wg, 2) or (B, Q, 2).

    Returns (B, Hg, Wg, C) (or (B, Q, C) for a flat grid).

    ``impl``: 'corners' = four corner-row gathers; 'patch' = one fused 2x2xC
    patch gather per query (~2.4x faster on TPU, identical fp32 math);
    'auto' = patch for bilinear, corners otherwise.

    ``source_dtype``: optional reduced-precision gather source (e.g.
    ``jnp.bfloat16`` halves gather bytes on the bandwidth-bound TPU gather;
    interpolation stays fp32). Default keeps the source dtype (bit-parity
    with ``torch.nn.functional.grid_sample``).
    """
    if mode not in ("bilinear", "nearest"):
        raise ValueError(f"unsupported mode: {mode}")
    if padding_mode not in ("zeros", "border"):
        raise ValueError(f"unsupported padding_mode: {padding_mode}")

    B, H, W, C = x.shape
    flat_grid = grid.ndim == 3
    if flat_grid:
        grid = grid[:, :, None, :]  # (B, Q, 1, 2)
    Hg, Wg = grid.shape[1], grid.shape[2]
    Q = Hg * Wg

    gx = grid[..., 0].reshape(B, Q)
    gy = grid[..., 1].reshape(B, Q)
    ix = _unnormalize(gx.astype(jnp.float32), W, align_corners)
    iy = _unnormalize(gy.astype(jnp.float32), H, align_corners)

    if padding_mode == "border":
        ix = jnp.clip(ix, 0.0, W - 1)
        iy = jnp.clip(iy, 0.0, H - 1)

    x_flat = x.reshape(B, H * W, C)

    if mode == "bilinear" and impl in ("auto", "patch"):
        from stif_tpu.ops.gather_utils import bilinear_gather

        src = x.astype(source_dtype or jnp.float32)
        out = bilinear_gather(src, iy, ix, padding_mode)
        out = out.reshape(B, Hg, Wg, C).astype(x.dtype)
        if flat_grid:
            out = out[:, :, 0, :]
        return out

    if mode == "nearest":
        # torch rounds with nearbyint (round-half-to-even), same as jnp.round.
        ixn = jnp.round(ix).astype(jnp.int32)
        iyn = jnp.round(iy).astype(jnp.int32)
        valid = (ixn >= 0) & (ixn < W) & (iyn >= 0) & (iyn < H)
        idx = jnp.clip(iyn, 0, H - 1) * W + jnp.clip(ixn, 0, W - 1)
        out = _gather_hw(x_flat, idx)
        if padding_mode == "zeros":
            out = jnp.where(valid[..., None], out, 0.0)
    else:
        x0 = jnp.floor(ix)
        y0 = jnp.floor(iy)
        lx = ix - x0
        ly = iy - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        x1i = x0i + 1
        y1i = y0i + 1

        # Per-corner validity (zeros padding contributes 0 outside).
        vx0 = (x0i >= 0) & (x0i < W)
        vx1 = (x1i >= 0) & (x1i < W)
        vy0 = (y0i >= 0) & (y0i < H)
        vy1 = (y1i >= 0) & (y1i < H)

        x0c = jnp.clip(x0i, 0, W - 1)
        x1c = jnp.clip(x1i, 0, W - 1)
        y0c = jnp.clip(y0i, 0, H - 1)
        y1c = jnp.clip(y1i, 0, H - 1)

        # One fused gather for all four corners: (B, 4Q) -> (B, 4Q, C).
        idx = jnp.concatenate(
            [y0c * W + x0c, y0c * W + x1c, y1c * W + x0c, y1c * W + x1c], axis=1
        )
        v = _gather_hw(x_flat, idx)
        v00, v01, v10, v11 = jnp.split(v, 4, axis=1)

        w00 = (1.0 - ly) * (1.0 - lx)
        w01 = (1.0 - ly) * lx
        w10 = ly * (1.0 - lx)
        w11 = ly * lx
        if padding_mode == "zeros":
            w00 = jnp.where(vy0 & vx0, w00, 0.0)
            w01 = jnp.where(vy0 & vx1, w01, 0.0)
            w10 = jnp.where(vy1 & vx0, w10, 0.0)
            w11 = jnp.where(vy1 & vx1, w11, 0.0)
        out = (
            v00 * w00[..., None]
            + v01 * w01[..., None]
            + v10 * w10[..., None]
            + v11 * w11[..., None]
        )

    out = out.reshape(B, Hg, Wg, C)
    if flat_grid:
        out = out[:, :, 0, :]
    return out
