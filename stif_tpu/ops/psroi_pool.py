"""Deformable position-sensitive ROI pooling.

Parity target: ``dcn_v2_psroi_pooling_cuda_forward``
(``codes/models/modules/DCNv2/src/cuda/dcn_v2_psroi_pooling_cuda.cu:58-146``).
This op ships with the reference's DCNv2 extension; **it is dead code for the
STIF model family** (only exercised by ``DCNv2/test.py`` — SURVEY.md §2.1),
implemented here for exact component coverage.

Semantics: each (roi, out_channel, ph, pw) output bin averages
``sample_per_part^2`` bilinear samples inside the bin; bin positions are
shifted by learned per-part (x, y) offsets scaled by ``trans_std``; the
sampled channel is position-sensitive: ``c = (ctop*G + gh)*G + gw``. Samples
whose center falls outside [-0.5, dim-0.5] are excluded from the average
(masked mean here — no data-dependent control flow under jit).
"""

from __future__ import annotations

import jax.numpy as jnp

from stif_tpu.ops.grid_sample import _gather_hw  # row gather helper


def deform_psroi_pool(
    x,                      # (B, H, W, C) feature map
    rois,                   # (R, 5): (batch_idx, x1, y1, x2, y2) in image px
    trans=None,             # (R, num_classes, 2, part, part) offsets or None
    spatial_scale: float = 1.0,
    pooled_size: int = 7,
    output_dim: int = None,
    group_size: int = 1,
    part_size: int = None,
    sample_per_part: int = 4,
    trans_std: float = 0.0,
):
    """Returns (out (R, P, P, output_dim), count (R, P, P, output_dim))."""
    B, H, W, C = x.shape
    P = pooled_size
    output_dim = output_dim or C // (group_size * group_size)
    part_size = part_size or P
    R = rois.shape[0]
    G = group_size
    no_trans = trans is None
    num_classes = 1 if no_trans else trans.shape[1]
    channels_each_class = output_dim // num_classes

    f32 = jnp.float32
    rois = rois.astype(f32)
    batch_idx = rois[:, 0].astype(jnp.int32)
    x1 = jnp.round(rois[:, 1]) * spatial_scale - 0.5
    y1 = jnp.round(rois[:, 2]) * spatial_scale - 0.5
    x2 = (jnp.round(rois[:, 3]) + 1.0) * spatial_scale - 0.5
    y2 = (jnp.round(rois[:, 4]) + 1.0) * spatial_scale - 0.5
    roi_w = jnp.maximum(x2 - x1, 0.1)
    roi_h = jnp.maximum(y2 - y1, 0.1)
    bin_w = roi_w / P   # (R,)
    bin_h = roi_h / P
    sub_w = bin_w / sample_per_part
    sub_h = bin_h / sample_per_part

    ph = jnp.arange(P, dtype=f32)
    pw = jnp.arange(P, dtype=f32)
    # per (R, ph, pw) bin starts
    hstart = y1[:, None, None] + ph[None, :, None] * bin_h[:, None, None]
    wstart = x1[:, None, None] + pw[None, None, :] * bin_w[:, None, None]

    part_h = jnp.floor(ph / P * part_size).astype(jnp.int32)  # (P,)
    part_w = jnp.floor(pw / P * part_size).astype(jnp.int32)
    gh = jnp.clip(jnp.floor(ph * G / P).astype(jnp.int32), 0, G - 1)
    gw = jnp.clip(jnp.floor(pw * G / P).astype(jnp.int32), 0, G - 1)

    ctop = jnp.arange(output_dim, dtype=jnp.int32)
    class_id = ctop // channels_each_class  # (O,)

    if no_trans:
        tx = jnp.zeros((R, output_dim, P, P), f32)
        ty = jnp.zeros((R, output_dim, P, P), f32)
    else:
        tr = trans.astype(f32)  # (R, classes, 2, part, part)
        tx = tr[:, class_id, 0][:, :, part_h][:, :, :, part_w] * trans_std
        ty = tr[:, class_id, 1][:, :, part_h][:, :, :, part_w] * trans_std

    # sample positions: (R, O, P, P, s, s)
    s = sample_per_part
    iw = jnp.arange(s, dtype=f32)
    ws = (wstart[:, None, :, :, None, None]
          + tx[..., None, None] * roi_w[:, None, None, None, None, None]
          + iw[None, None, None, None, None, :] * sub_w[:, None, None, None, None, None])
    hs = (hstart[:, None, :, :, None, None]
          + ty[..., None, None] * roi_h[:, None, None, None, None, None]
          + iw[None, None, None, None, :, None] * sub_h[:, None, None, None, None, None])

    valid = ((ws >= -0.5) & (ws <= W - 0.5) & (hs >= -0.5) & (hs <= H - 0.5))
    wc = jnp.clip(ws, 0.0, W - 1.0)
    hc = jnp.clip(hs, 0.0, H - 1.0)

    # position-sensitive channel per (O, ph, pw)
    chan = (ctop[:, None, None] * G + gh[None, :, None]) * G + gw[None, None, :]

    # bilinear_interp uses floor/ceil (not floor/floor+1): at integer
    # positions x1 == x2 and the 4 weights still sum to 1.
    x1i = jnp.floor(wc).astype(jnp.int32)
    x2i = jnp.ceil(wc).astype(jnp.int32)
    y1i = jnp.floor(hc).astype(jnp.int32)
    y2i = jnp.ceil(hc).astype(jnp.int32)
    dx = wc - x1i
    dy = hc - y1i

    x_roi = x[batch_idx]  # (R, H, W, C)
    x_flat = x_roi.reshape(R, H * W, C)

    def sample(yi, xi):
        idx = yi * W + xi  # (R, O, P, P, s, s)
        flat = idx.reshape(R, -1)
        v = _gather_hw(x_flat, flat)  # (R, n, C)
        v = v.reshape(idx.shape + (C,))
        # select the position-sensitive channel
        csel = jnp.broadcast_to(
            chan[None, :, :, :, None, None], idx.shape
        )
        return jnp.take_along_axis(v, csel[..., None], axis=-1)[..., 0]

    v11 = sample(y1i, x1i)
    v12 = sample(y2i, x1i)
    v21 = sample(y1i, x2i)
    v22 = sample(y2i, x2i)
    val = ((1 - dx) * (1 - dy) * v11 + (1 - dx) * dy * v12
           + dx * (1 - dy) * v21 + dx * dy * v22)

    val = jnp.where(valid, val, 0.0)
    cnt = valid.sum(axis=(-1, -2)).astype(f32)         # (R, O, P, P)
    total = val.sum(axis=(-1, -2))
    out = jnp.where(cnt > 0, total / jnp.maximum(cnt, 1), 0.0)
    # layout: (R, P, P, O) channels-last
    return out.transpose(0, 2, 3, 1), cnt.transpose(0, 2, 3, 1)
