"""TPU-efficient bilinear patch gathering.

TPU gathers are per-index bound: one gather fetching a contiguous 2x2xC patch
per query is ~2.4x faster than four separate corner-row gathers of the same
total volume (measured on v5e). The trick for exact semantics: the patch
start is clamped to [0, dim-2] (so the slice is always in-bounds) and each
bilinear corner's weight is *folded* onto the in-patch cell it actually
landed on — out-of-bounds corners carry zero weight, so clamping never
changes the value. This reproduces the reference's zero-padded bilinear
(``dcn_v2_im2col_cuda.cu:25-54``) and torch ``grid_sample`` corner handling
bit-for-bit in fp32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def patch_weights(iy, ix, H: int, W: int, padding_mode: str = "zeros"):
    """Per-query 2x2 in-patch weights and clamped starts.

    iy, ix: float sample positions (any shape S).
    Returns (sy, sx) int32 starts of shape S and w (S + (2, 2)) weights.
    """
    if padding_mode == "border":
        iy = jnp.clip(iy, 0.0, H - 1)
        ix = jnp.clip(ix, 0.0, W - 1)
    y0 = jnp.floor(iy)
    x0 = jnp.floor(ix)
    ly = iy - y0
    lx = ix - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    y1i = y0i + 1
    x1i = x0i + 1

    if padding_mode == "zeros":
        vy0 = (y0i >= 0) & (y0i < H)
        vy1 = (y1i >= 0) & (y1i < H)
        vx0 = (x0i >= 0) & (x0i < W)
        vx1 = (x1i >= 0) & (x1i < W)
    else:  # border: coords pre-clipped; y1 may be H with zero weight
        one = jnp.ones_like(y0i, dtype=bool)
        vy0, vx0 = one, one
        vy1 = y1i < H
        vx1 = x1i < W

    wy0 = jnp.where(vy0, 1.0 - ly, 0.0)
    wy1 = jnp.where(vy1, ly, 0.0)
    wx0 = jnp.where(vx0, 1.0 - lx, 0.0)
    wx1 = jnp.where(vx1, lx, 0.0)

    # max(..., 0) guards degenerate H==1 / W==1 sources (clip hi < lo would
    # produce start -1); the patch gather pads such sources to 2 pixels
    sy = jnp.clip(y0i, 0, max(H - 2, 0))
    sx = jnp.clip(x0i, 0, max(W - 2, 0))
    # in-patch row/col of each corner (0 or 1), after clamping the start
    py0 = jnp.clip(y0i - sy, 0, 1)
    py1 = jnp.clip(y1i - sy, 0, 1)
    px0 = jnp.clip(x0i - sx, 0, 1)
    px1 = jnp.clip(x1i - sx, 0, 1)

    # fold corner weights onto in-patch cells
    def fold(py, px, w):
        # returns contribution to each of the 4 patch cells
        return jnp.stack(
            [
                jnp.stack([w * (py == 0) * (px == 0),
                           w * (py == 0) * (px == 1)], axis=-1),
                jnp.stack([w * (py == 1) * (px == 0),
                           w * (py == 1) * (px == 1)], axis=-1),
            ],
            axis=-2,
        )

    w = (
        fold(py0, px0, wy0 * wx0)
        + fold(py0, px1, wy0 * wx1)
        + fold(py1, px0, wy1 * wx0)
        + fold(py1, px1, wy1 * wx1)
    )
    return sy, sx, w


# Sources up to this many pixels get the dense one-hot-matmul backward; the
# TPU's scatter-add (the gather transpose) runs at ~0.7M indices/s — ~30-50x
# slower than the forward gather — while a (Q, HW) one-hot contraction on the
# MXU is bandwidth-bound and ~100x faster at LR feature-map sizes.
ONEHOT_BWD_MAX_HW = 36864
_ONEHOT_CHUNK = 16384


# Gather layout: 'flat' pre-materializes each 2x2xC patch as ONE contiguous
# 4C row and gathers with 1-D starts — 1.4x faster than the multi-dim
# (1,2,2,C) slice on v5e, 1.9x combined with sub-gather splitting
# (GATHER_BENCH_r03.json, uncontended chip: 199 vs 103 Midx/s at the
# encoder's 1.1M-index shape; the TPU gather cost is ~per-contiguous-run,
# and a 2x2 slice is four runs). 'direct' keeps the original formulation
# (identical fp32 values; kept for A/B).
_GATHER_LAYOUT = "flat"


def set_gather_layout(layout: str):
    global _GATHER_LAYOUT
    assert layout in ("flat", "direct")
    _GATHER_LAYOUT = layout


def _patch_rows(x):
    """(B, H, W, C) -> (B, H*W, 4C): row (y, x) holds the 2x2 patch at
    (y, x) contiguously [p00 p01 p10 p11]. Out-of-range cells (last row/col)
    are zero-padded — never read, since patch starts are clamped to
    [0, dim-2] (patch_weights)."""
    B, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    rows = jnp.concatenate([
        xp[:, :H, :W], xp[:, :H, 1:W + 1],
        xp[:, 1:H + 1, :W], xp[:, 1:H + 1, 1:W + 1],
    ], axis=-1)
    return rows.reshape(B, H * W, 4 * C)


# Above this many indices one gather call is split into ~equal sequential
# sub-gathers: measured 199 vs 145 Midx/s (split-8 vs monolithic) at the
# encoder's 1.1M-index shape on v5e (GATHER_BENCH_r03.json) — the gather
# unit pipelines better on smaller result buffers. 1105920/8 exactly, so
# the benchmarked shape gets the benchmarked 8-way/138k-idx split
# (ceil at any larger target would produce an unmeasured 6/7-way split).
_GATHER_SPLIT_TARGET = 138240


def _gather_rows(rows, ridx):
    """rows: (B, R, D); ridx: (B, Q) int32 -> (B, Q, D)."""
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(2,),
        collapsed_slice_dims=(1,),
        start_index_map=(1,),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )

    def g(r):
        return jax.lax.gather(rows, r[..., None], dn,
                              slice_sizes=(1, 1, rows.shape[-1]),
                              mode="clip")

    B, Q = ridx.shape
    n_idx = B * Q
    if n_idx > _GATHER_SPLIT_TARGET:
        s = min(-(-n_idx // _GATHER_SPLIT_TARGET), 8)
        # even split only (static shapes); fall back to monolithic otherwise
        while s > 1 and Q % s:
            s -= 1
        if s > 1:
            return jnp.concatenate(
                [g(c) for c in jnp.split(ridx, s, axis=1)], axis=1)
    return g(ridx)


def _raw_gather_patches(x, sy, sx):
    """Returns the patches FLAT: (B, Q, 4C), each row [p00 p01 p10 p11].

    The flat shape is load-bearing: reshaping to (B, Q, 2, 2, C) forces a
    materialized relayout whose (2, C) minor dims tile-pad on TPU — measured
    2x on the decoder stage-C shape (GATHER_BENCH_r03.json decoder_c vs
    decoder_c_flat). Consumers fold corner weights via lane-aligned slices
    (``bilinear_gather``)."""
    B, H, W, C = x.shape
    Q = sy.shape[1]
    if _GATHER_LAYOUT == "flat":
        return _gather_rows(_patch_rows(x), sy * W + sx)
    starts = jnp.stack([sy, sx], axis=-1)  # (B, Q, 2)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(2, 3, 4),
        collapsed_slice_dims=(),
        start_index_map=(1, 2),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    out = jax.lax.gather(x, starts, dn, slice_sizes=(1, 2, 2, C),
                         mode="clip")
    return out.reshape(B, Q, 4 * C)


def _onehot_patch_transpose(ct, sy, sx, H, W):
    """Dense transpose of the 2x2 patch gather: dx = sum_cells Onehot^T @ ct.

    ct: (B, Q, 4, C) cell-major view of the flat rows; returns dx
    (B, H, W, C). Chunked over Q to bound the one-hot buffer.
    """
    B, Q, _, C = ct.shape
    HW = H * W
    pix = jnp.arange(HW, dtype=jnp.int32)
    # stack the 4 cells along the row axis
    rows, upds = [], []
    for i in range(2):
        for j in range(2):
            rows.append((sy + i) * W + (sx + j))  # (B, Q)
            upds.append(ct[:, :, 2 * i + j])      # (B, Q, C)
    idx = jnp.concatenate(rows, axis=1)           # (B, 4Q)
    upd = jnp.concatenate(upds, axis=1)           # (B, 4Q, C)
    R = idx.shape[1]
    n_chunks = max(1, -(-R // _ONEHOT_CHUNK))
    if n_chunks * _ONEHOT_CHUNK != R:
        pad = n_chunks * _ONEHOT_CHUNK - R
        # padded rows contribute zero updates (index 0 is harmless)
        idx = jnp.pad(idx, ((0, 0), (0, pad)))
        upd = jnp.pad(upd, ((0, 0), (0, pad), (0, 0)))
    idx = idx.reshape(B, n_chunks, _ONEHOT_CHUNK).transpose(1, 0, 2)
    upd = upd.reshape(B, n_chunks, _ONEHOT_CHUNK, C).transpose(1, 0, 2, 3)

    def body(dx, inputs):
        idx_c, upd_c = inputs
        onehot = (idx_c[..., None] == pix).astype(jnp.float32)
        return dx + jnp.einsum("brp,brc->bpc", onehot, upd_c,
                               preferred_element_type=jnp.float32), None

    dx, _ = jax.lax.scan(body, jnp.zeros((B, HW, C), jnp.float32),
                         (idx, upd))
    return dx.reshape(B, H, W, C)


@jax.custom_vjp
def gather_patches_2x2(x, sy, sx):
    """x: (B, H, W, C); sy, sx: (B, Q) int32 in-range starts.
    Returns the patches FLAT (B, Q, 4C) — [p00 p01 p10 p11] per row — via
    one batched patch gather (see ``_raw_gather_patches`` on why flat).

    Custom VJP: the x-cotangent uses a dense one-hot MXU contraction for
    LR-sized sources instead of XLA's serial scatter-add."""
    return _raw_gather_patches(x, sy, sx)


def _gp_fwd(x, sy, sx):
    # save x only for its shape/dtype (no copy; it is alive upstream anyway)
    return _raw_gather_patches(x, sy, sx), (x, sy, sx)


def _gp_bwd(res, ct):
    x, sy, sx = res
    B, H, W, C = x.shape
    dtype = x.dtype
    Q = sy.shape[1]
    ct = ct.reshape(B, Q, 4, C)  # cell-major view of the flat rows
    if H * W <= ONEHOT_BWD_MAX_HW:
        dx = _onehot_patch_transpose(ct.astype(jnp.float32), sy, sx, H, W)
        return dx.astype(dtype), None, None
    # fallback: the standard scatter-add transpose
    starts = jnp.stack([sy, sx], axis=-1)
    dn = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(2, 3, 4),
        inserted_window_dims=(),
        scatter_dims_to_operand_dims=(1, 2),
        operand_batching_dims=(0,),
        scatter_indices_batching_dims=(0,),
    )
    dx = jax.lax.scatter_add(
        jnp.zeros((B, H, W, C), dtype), starts,
        ct.reshape(B, -1, 2, 2, C).astype(dtype), dn, mode="clip",
    )
    return dx, None, None


gather_patches_2x2.defvjp(_gp_fwd, _gp_bwd)


def bilinear_gather(x, iy, ix, padding_mode: str = "zeros"):
    """Bilinear sample of x (B, H, W, C) at float positions iy, ix (B, Q)
    in pixel units. Returns (B, Q, C)."""
    B, H, W, C = x.shape
    sy, sx, w = patch_weights(iy, ix, H, W, padding_mode)
    if H < 2 or W < 2:
        # degenerate sources: pad to 2 pixels so the 2x2 patch slice fits.
        # Corner weights beyond the REAL bounds are already zero (computed
        # above with the unpadded H, W), so the padded values never leak.
        x = jnp.pad(x, ((0, 0), (0, max(0, 2 - H)), (0, max(0, 2 - W)),
                        (0, 0)))
    pf = gather_patches_2x2(x, sy, sx).astype(jnp.float32)  # (B, Q, 4C)
    # interpolate in fp32 regardless of the (possibly reduced-precision)
    # gather source dtype — only the HBM-bound gather itself is narrow.
    # Corner weights fold via lane-aligned slices of the flat row (a 4-D
    # (2, 2, C)-minor einsum would materialize a tile-padded relayout).
    C = pf.shape[-1] // 4
    wf = w.astype(jnp.float32).reshape(*w.shape[:-2], 4)
    return sum(pf[..., c * C:(c + 1) * C] * wf[..., c:c + 1]
               for c in range(4))
