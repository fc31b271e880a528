"""Evaluation metrics and color conversions, MATLAB conventions.

Parity targets: ``calculate_psnr`` / ``ssim`` / ``calculate_ssim``
(``codes/utils/util.py:140-196``) and the color conversions of
``codes/data/util.py:157-238`` — the exact protocol used by the reference's
Vid4/Adobe eval harnesses (Y-channel PSNR/SSIM).
"""

from __future__ import annotations

import math

import numpy as np


def calculate_psnr(img1: np.ndarray, img2: np.ndarray) -> float:
    """PSNR on [0, 255] images (any shape)."""
    img1 = img1.astype(np.float64)
    img2 = img2.astype(np.float64)
    mse = np.mean((img1 - img2) ** 2)
    if mse == 0:
        return float("inf")
    return 20 * math.log10(255.0 / math.sqrt(mse))


def _ssim_single(img1: np.ndarray, img2: np.ndarray) -> float:
    """SSIM of two 2-D [0,255] images: 11x11 gaussian window (sigma 1.5),
    valid convolution, MATLAB constants."""
    C1 = (0.01 * 255) ** 2
    C2 = (0.03 * 255) ** 2
    img1 = img1.astype(np.float64)
    img2 = img2.astype(np.float64)

    # 11x11 gaussian kernel, sigma=1.5 (cv2.getGaussianKernel equivalent)
    r = np.arange(11) - 5
    g = np.exp(-(r ** 2) / (2 * 1.5 ** 2))
    g /= g.sum()
    window = np.outer(g, g)

    def filt(x):
        # 'valid' 2-D correlation with the separable gaussian
        from numpy.lib.stride_tricks import sliding_window_view

        v = sliding_window_view(x, (11, 11))
        return np.einsum("ijkl,kl->ij", v, window)

    mu1 = filt(img1)
    mu2 = filt(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    sigma1_sq = filt(img1 ** 2) - mu1_sq
    sigma2_sq = filt(img2 ** 2) - mu2_sq
    sigma12 = filt(img1 * img2) - mu1_mu2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)
    )
    return float(ssim_map.mean())


def calculate_ssim(img1: np.ndarray, img2: np.ndarray) -> float:
    """SSIM on [0,255] images; 2-D or HxWxC (channel-averaged), like the
    reference ``calculate_ssim`` (``utils/util.py:176-196``)."""
    if img1.shape != img2.shape:
        raise ValueError("input images must have the same dimensions")
    if img1.ndim == 2:
        return _ssim_single(img1, img2)
    if img1.ndim == 3:
        if img1.shape[2] == 3:
            return float(np.mean([
                _ssim_single(img1[..., c], img2[..., c]) for c in range(3)
            ]))
        if img1.shape[2] == 1:
            return _ssim_single(img1[..., 0], img2[..., 0])
    raise ValueError("wrong input image dimensions")


# ------------------------------------------------------------------- color

_YCBCR_W = np.array(
    [[65.481, -37.797, 112.0],
     [128.553, -74.203, -93.786],
     [24.966, 112.0, -18.214]]
)
_YCBCR_B = np.array([16.0, 128.0, 128.0])


def rgb2ycbcr(img: np.ndarray, only_y: bool = True) -> np.ndarray:
    """MATLAB rgb2ycbcr. Input HxWx3 RGB, [0,1] float or [0,255] uint8;
    output same range/dtype convention as the reference."""
    in_type = img.dtype
    img = img.astype(np.float64)
    if in_type != np.uint8:
        img *= 255.0
    if only_y:
        out = img @ np.array([65.481, 128.553, 24.966]) / 255.0 + 16.0
    else:
        out = img @ (_YCBCR_W / 255.0) + _YCBCR_B
    if in_type == np.uint8:
        out = out.round()
    else:
        out /= 255.0
    return out.astype(in_type)


def bgr2ycbcr(img: np.ndarray, only_y: bool = True) -> np.ndarray:
    """Same as rgb2ycbcr but for BGR channel order (the cv2 convention the
    reference's eval harness uses, ``data/util.py:190-222``)."""
    return rgb2ycbcr(img[..., ::-1], only_y=only_y)


def ycbcr2rgb(img: np.ndarray) -> np.ndarray:
    """MATLAB ycbcr2rgb (float [0,1] or uint8)."""
    in_type = img.dtype
    img = img.astype(np.float64)
    if in_type != np.uint8:
        img *= 255.0
    inv = np.linalg.inv(_YCBCR_W / 255.0)
    out = (img - _YCBCR_B) @ inv
    if in_type == np.uint8:
        out = out.round().clip(0, 255)
    else:
        out = out / 255.0
    return out.astype(in_type)


def modcrop(img: np.ndarray, scale: int) -> np.ndarray:
    """Crop H, W to multiples of scale (``data/util.py:225-238``)."""
    if img.ndim == 2:
        h, w = img.shape
        return img[: h - h % scale, : w - w % scale]
    h, w = img.shape[:2]
    return img[: h - h % scale, : w - w % scale, ...]


def tensor2img(t, min_max=(0, 1)) -> np.ndarray:
    """[0,1] float array (H, W, C) -> uint8 image (``utils/util.py:105-129``)."""
    t = np.asarray(t, dtype=np.float64)
    t = (t - min_max[0]) / (min_max[1] - min_max[0])
    t = np.clip(t, 0, 1)
    return (t * 255.0).round().astype(np.uint8)
