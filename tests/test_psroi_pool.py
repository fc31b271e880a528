"""Deformable PSROI pooling vs a naive python oracle of the CUDA kernel."""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from stif_tpu.ops.psroi_pool import deform_psroi_pool


def naive_psroi(x, rois, trans, spatial_scale, P, output_dim, G, part_size,
                s, trans_std):
    """Direct python port of the kernel semantics (loop form)."""
    B, C, H, W = x.shape
    R = rois.shape[0]
    no_trans = trans is None
    num_classes = 1 if no_trans else trans.shape[1]
    cec = output_dim // num_classes
    out = np.zeros((R, output_dim, P, P), np.float64)
    cnt = np.zeros((R, output_dim, P, P), np.float64)

    def bilin(data, xx, yy):
        x1, x2 = math.floor(xx), math.ceil(xx)
        y1, y2 = math.floor(yy), math.ceil(yy)
        dx, dy = xx - x1, yy - y1
        return ((1 - dx) * (1 - dy) * data[y1, x1]
                + (1 - dx) * dy * data[y2, x1]
                + dx * (1 - dy) * data[y1, x2]
                + dx * dy * data[y2, x2])

    for n in range(R):
        b = int(rois[n, 0])
        x1 = round(rois[n, 1]) * spatial_scale - 0.5
        y1 = round(rois[n, 2]) * spatial_scale - 0.5
        x2 = (round(rois[n, 3]) + 1) * spatial_scale - 0.5
        y2 = (round(rois[n, 4]) + 1) * spatial_scale - 0.5
        rw, rh = max(x2 - x1, 0.1), max(y2 - y1, 0.1)
        bw, bh = rw / P, rh / P
        sw, sh = bw / s, bh / s
        for ct in range(output_dim):
            cls = ct // cec
            for ph in range(P):
                for pw in range(P):
                    part_h = math.floor(ph / P * part_size)
                    part_w = math.floor(pw / P * part_size)
                    if no_trans:
                        tx = ty = 0.0
                    else:
                        tx = trans[n, cls, 0, part_h, part_w] * trans_std
                        ty = trans[n, cls, 1, part_h, part_w] * trans_std
                    ws = pw * bw + x1 + tx * rw
                    hs = ph * bh + y1 + ty * rh
                    gw = min(max(int(pw * G / P), 0), G - 1)
                    gh = min(max(int(ph * G / P), 0), G - 1)
                    c = (ct * G + gh) * G + gw
                    total, k = 0.0, 0
                    for ih in range(s):
                        for iw in range(s):
                            w_ = ws + iw * sw
                            h_ = hs + ih * sh
                            if w_ < -0.5 or w_ > W - 0.5 or h_ < -0.5 or h_ > H - 0.5:
                                continue
                            w_ = min(max(w_, 0.0), W - 1.0)
                            h_ = min(max(h_, 0.0), H - 1.0)
                            total += bilin(x[b, c], w_, h_)
                            k += 1
                    out[n, ct, ph, pw] = total / k if k else 0.0
                    cnt[n, ct, ph, pw] = k
    return out, cnt


@pytest.mark.parametrize("with_trans", [False, True])
def test_matches_naive(rng, with_trans):
    B, C, H, W = 2, 16, 12, 14
    G, P, output_dim, s = 2, 4, 4, 3
    x = rng.standard_normal((B, C, H, W)).astype(np.float32)
    rois = np.array([
        [0, 1, 1, 8, 9],
        [1, 0, 2, 13, 11],
        [0, 3, 3, 5, 5],
    ], np.float32)
    trans = (rng.standard_normal((3, 1, 2, P, P)).astype(np.float32)
             if with_trans else None)
    want, wcnt = naive_psroi(x, rois, trans, 1.0, P, output_dim, G, P, s,
                             0.1 if with_trans else 0.0)
    got, gcnt = deform_psroi_pool(
        jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(rois),
        None if trans is None else jnp.asarray(trans),
        spatial_scale=1.0, pooled_size=P, output_dim=output_dim,
        group_size=G, sample_per_part=s,
        trans_std=0.1 if with_trans else 0.0,
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-4
    )
    np.testing.assert_array_equal(
        np.asarray(gcnt).transpose(0, 3, 1, 2), wcnt
    )
