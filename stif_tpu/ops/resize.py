"""Image resampling ops.

Two resamplers with exact parity targets:

- ``imresize``: MATLAB-convention bicubic with antialiasing and symmetric edge
  padding. Parity target: ``imresize_np`` in the reference data pipeline
  (``codes/data/util.py:240-371``) — this resampler *defines* the LR
  degradation model, so it must match bit-for-bit-ish (fp32 accumulation).
- ``resize_bilinear``: ``torch.nn.functional.interpolate(mode='bilinear',
  align_corners=False)`` parity, used by the PCD pyramid offset/feature
  upsampling (``codes/models/modules/Sakuya_arch_test.py:86-125``) and the
  ``decoding_test`` HR input upsample (``:513-514``).

TPU-first design: both resamplers are *separable dense matmuls*. All weight /
index math depends only on static shapes, so it runs in NumPy at trace time and
bakes into two constant matrices ``M_h (outH, inH)`` and ``M_w (outW, inW)``
(boundary handling folded in). The resample is then two MXU matmuls —
no gathers, no dynamic shapes.
"""

from __future__ import annotations

import math
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

# Resample matrices define the degradation model / pyramid interpolation —
# accumulate in fp32 even on the MXU (HIGHEST = 6-pass bf16 on TPU).
_PREC = jax.lax.Precision.HIGHEST


def _cubic(x):
    """Keys cubic kernel, a = -0.5 (MATLAB's 'cubic')."""
    ax = np.abs(x)
    ax2 = ax * ax
    ax3 = ax2 * ax
    return (1.5 * ax3 - 2.5 * ax2 + 1.0) * (ax <= 1) + (
        -0.5 * ax3 + 2.5 * ax2 - 4.0 * ax + 2.0
    ) * ((ax > 1) & (ax <= 2))


@lru_cache(maxsize=256)
def _matlab_resize_matrix(in_length: int, out_length: int, scale: float,
                          antialiasing: bool) -> np.ndarray:
    """Dense (out_length, in_length) MATLAB-bicubic resample matrix with
    symmetric boundary handling folded into the matrix."""
    kernel_width = 4.0
    if scale < 1 and antialiasing:
        kernel_width = kernel_width / scale

    x = np.arange(1, out_length + 1, dtype=np.float64)
    u = x / scale + 0.5 * (1 - 1 / scale)
    left = np.floor(u - kernel_width / 2)
    P = int(math.ceil(kernel_width)) + 2

    indices = left[:, None] + np.arange(P, dtype=np.float64)[None, :]
    dist = u[:, None] - indices
    if scale < 1 and antialiasing:
        weights = scale * _cubic(dist * scale)
    else:
        weights = _cubic(dist)
    weights = weights / weights.sum(axis=1, keepdims=True)

    # Trim all-zero first/last tap columns (MATLAB convention).
    zero_cols = (weights == 0).sum(axis=0)
    if not math.isclose(zero_cols[0], 0, rel_tol=1e-6):
        indices = indices[:, 1:P - 1]
        weights = weights[:, 1:P - 1]
    if not math.isclose(zero_cols[-1], 0, rel_tol=1e-6):
        indices = indices[:, 0:P - 2]
        weights = weights[:, 0:P - 2]

    sym_len_s = int(-indices.min() + 1)
    indices0 = (indices + sym_len_s - 1).astype(np.int64)  # 0-based padded idx

    # Fold symmetric padding into source indices:
    #   padded p < s            -> source s-1-p           (front mirror)
    #   s <= p < s+in           -> source p-s
    #   p >= s+in               -> source in-1-(p-s-in)   (back mirror)
    M = np.zeros((out_length, in_length), dtype=np.float64)
    s = sym_len_s
    for i in range(out_length):
        for k in range(indices0.shape[1]):
            p = indices0[i, k]
            if p < s:
                src = s - 1 - p
            elif p < s + in_length:
                src = p - s
            else:
                src = in_length - 1 - (p - s - in_length)
            M[i, src] += weights[i, k]
    return M.astype(np.float32)


def imresize(img, scale: float, antialiasing: bool = True):
    """MATLAB-convention bicubic resize of ``img`` (..., H, W, C) by ``scale``.

    Output spatial dims are ``ceil(in * scale)``. fp32 throughout.
    """
    img = jnp.asarray(img, dtype=jnp.float32)
    in_h, in_w = img.shape[-3], img.shape[-2]
    out_h, out_w = math.ceil(in_h * scale), math.ceil(in_w * scale)
    M_h = jnp.asarray(_matlab_resize_matrix(in_h, out_h, scale, antialiasing))
    M_w = jnp.asarray(_matlab_resize_matrix(in_w, out_w, scale, antialiasing))
    out = jnp.einsum("oh,...hwc->...owc", M_h, img, precision=_PREC)
    out = jnp.einsum("ow,...hwc->...hoc", M_w, out, precision=_PREC)
    return out


def imresize_to(img, out_hw, antialiasing: bool = True):
    """MATLAB-convention bicubic resize of ``img`` (..., H, W, C) to an
    explicit ``(out_h, out_w)`` — per-dim scales, so non-uniform and
    non-integer output sizes are exact (``imresize`` takes one scale for
    both dims). fp32 throughout; jittable for static output sizes."""
    img = jnp.asarray(img, dtype=jnp.float32)
    in_h, in_w = img.shape[-3], img.shape[-2]
    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    M_h = jnp.asarray(_matlab_resize_matrix(in_h, out_h, out_h / in_h,
                                            antialiasing))
    M_w = jnp.asarray(_matlab_resize_matrix(in_w, out_w, out_w / in_w,
                                            antialiasing))
    out = jnp.einsum("oh,...hwc->...owc", M_h, img, precision=_PREC)
    out = jnp.einsum("ow,...hwc->...hoc", M_w, out, precision=_PREC)
    return out


def imresize_np(img: np.ndarray, scale: float,
                antialiasing: bool = True) -> np.ndarray:
    """Host-side (pure NumPy) MATLAB bicubic — same matrices as ``imresize``.

    For the data pipeline and eval harnesses: these run on CPU threads while
    the accelerator is busy, and must never trigger an XLA compile (on the
    tunneled TPU a first-shape compile costs minutes). Named after the
    reference's ``imresize_np`` (``codes/data/util.py:302-371``)."""
    img = np.asarray(img, dtype=np.float32)
    in_h, in_w = img.shape[-3], img.shape[-2]
    out_h, out_w = math.ceil(in_h * scale), math.ceil(in_w * scale)
    M_h = _matlab_resize_matrix(in_h, out_h, scale, antialiasing)
    M_w = _matlab_resize_matrix(in_w, out_w, scale, antialiasing)
    out = np.einsum("oh,...hwc->...owc", M_h, img)
    out = np.einsum("ow,...hwc->...hoc", M_w, out)
    return out.astype(np.float32)


@lru_cache(maxsize=256)
def _bilinear_resize_matrix(in_length: int, out_length: int,
                            align_corners: bool) -> np.ndarray:
    """Dense (out_length, in_length) torch-interpolate bilinear matrix."""
    M = np.zeros((out_length, in_length), dtype=np.float64)
    if align_corners:
        if out_length == 1:
            src = np.zeros(out_length)
        else:
            src = np.arange(out_length) * (in_length - 1) / (out_length - 1)
    else:
        scale = in_length / out_length
        src = (np.arange(out_length) + 0.5) * scale - 0.5
    # torch clamps the source index below at 0; above, i1 clamps to in-1.
    src = np.maximum(src, 0.0)
    i0 = np.floor(src).astype(np.int64)
    i0 = np.minimum(i0, in_length - 1)
    i1 = np.minimum(i0 + 1, in_length - 1)
    frac = src - i0
    for o in range(out_length):
        M[o, i0[o]] += 1.0 - frac[o]
        M[o, i1[o]] += frac[o]
    return M.astype(np.float32)


def resize_bilinear(x, size=None, scale_factor=None, align_corners: bool = False):
    """torch ``F.interpolate(mode='bilinear')`` parity for NHWC ``x``.

    ``size`` is (out_h, out_w); or pass ``scale_factor`` (out = floor(in*sf)).
    """
    in_h, in_w = x.shape[-3], x.shape[-2]
    if size is None:
        if scale_factor is None:
            raise ValueError("need size or scale_factor")
        size = (int(math.floor(in_h * scale_factor)),
                int(math.floor(in_w * scale_factor)))
    out_h, out_w = size
    M_h = jnp.asarray(_bilinear_resize_matrix(in_h, out_h, align_corners))
    M_w = jnp.asarray(_bilinear_resize_matrix(in_w, out_w, align_corners))
    dtype = x.dtype
    out = jnp.einsum("oh,...hwc->...owc", M_h, x.astype(jnp.float32), precision=_PREC)
    out = jnp.einsum("ow,...hwc->...hoc", M_w, out, precision=_PREC)
    return out.astype(dtype)
