"""PSNR/SSIM and color conversion parity with the reference formulas."""

import numpy as np
import pytest

from stif_tpu.utils.metrics import (
    bgr2ycbcr,
    calculate_psnr,
    calculate_ssim,
    modcrop,
    rgb2ycbcr,
    tensor2img,
    ycbcr2rgb,
)


def reference_ssim(img1, img2):
    """Reference ssim (utils/util.py:154-174) via cv2."""
    import cv2

    C1 = (0.01 * 255) ** 2
    C2 = (0.03 * 255) ** 2
    img1 = img1.astype(np.float64)
    img2 = img2.astype(np.float64)
    kernel = cv2.getGaussianKernel(11, 1.5)
    window = np.outer(kernel, kernel.transpose())
    mu1 = cv2.filter2D(img1, -1, window)[5:-5, 5:-5]
    mu2 = cv2.filter2D(img2, -1, window)[5:-5, 5:-5]
    mu1_sq = mu1 ** 2
    mu2_sq = mu2 ** 2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = cv2.filter2D(img1 ** 2, -1, window)[5:-5, 5:-5] - mu1_sq
    sigma2_sq = cv2.filter2D(img2 ** 2, -1, window)[5:-5, 5:-5] - mu2_sq
    sigma12 = cv2.filter2D(img1 * img2, -1, window)[5:-5, 5:-5] - mu1_mu2
    m = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)
    )
    return m.mean()


class TestMetrics:
    def test_psnr(self, rng):
        a = rng.random((32, 32)) * 255
        b = a + rng.standard_normal((32, 32)) * 5
        mse = np.mean((a - b) ** 2)
        want = 20 * np.log10(255 / np.sqrt(mse))
        assert abs(calculate_psnr(a, b) - want) < 1e-9

    def test_ssim_matches_reference_cv2(self, rng):
        a = (rng.random((40, 40)) * 255).astype(np.float64)
        b = np.clip(a + rng.standard_normal((40, 40)) * 10, 0, 255)
        want = reference_ssim(a, b)
        got = calculate_ssim(a, b)
        assert abs(got - want) < 1e-6

    def test_ssim_color_average(self, rng):
        a = (rng.random((40, 40, 3)) * 255).astype(np.float64)
        b = np.clip(a + rng.standard_normal((40, 40, 3)) * 10, 0, 255)
        want = np.mean([reference_ssim(a[..., c], b[..., c]) for c in range(3)])
        assert abs(calculate_ssim(a, b) - want) < 1e-6


class TestColor:
    def test_rgb2ycbcr_float(self, rng):
        img = rng.random((8, 8, 3)).astype(np.float32)
        y = rgb2ycbcr(img, only_y=True)
        want = (img * 255.0 @ np.array([65.481, 128.553, 24.966]) / 255.0
                + 16.0) / 255.0
        np.testing.assert_allclose(y, want, atol=1e-5)

    def test_bgr_is_flipped_rgb(self, rng):
        img = rng.random((8, 8, 3)).astype(np.float32)
        np.testing.assert_allclose(
            bgr2ycbcr(img), rgb2ycbcr(img[..., ::-1]), atol=1e-7
        )

    def test_ycbcr_roundtrip(self, rng):
        img = (rng.random((8, 8, 3)) * 0.8 + 0.1).astype(np.float64)
        back = ycbcr2rgb(rgb2ycbcr(img, only_y=False))
        np.testing.assert_allclose(back, img, atol=1e-6)

    def test_modcrop_tensor2img(self, rng):
        img = rng.random((17, 19, 3))
        assert modcrop(img, 4).shape == (16, 16, 3)
        u8 = tensor2img(img)
        assert u8.dtype == np.uint8 and u8.shape == img.shape
