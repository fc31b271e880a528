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


class TestTorchConventionSSIM:
    """Parity for the second SSIM family (``codes/myutils.py:47-187``):
    replicate-padded windowed SSIM, volumetric ``ssim_matlab``, ``msssim`` —
    checked against independent torch implementations of the semantics."""

    @staticmethod
    def _torch_ssim(a, b, val_range=None, full=False):
        import torch
        import torch.nn.functional as F

        x = torch.from_numpy(np.moveaxis(a, -1, 0)[None]).double()
        y = torch.from_numpy(np.moveaxis(b, -1, 0)[None]).double()
        if val_range is None:
            mx = 255.0 if x.max() > 128 else 1.0
            mn = -1.0 if x.min() < -0.5 else 0.0
            val_range = mx - mn
        C = x.shape[1]
        n = min(11, x.shape[2], x.shape[3])
        g = torch.exp(-((torch.arange(n, dtype=torch.float64) - n // 2) ** 2)
                      / (2 * 1.5 ** 2))
        g = g / g.sum()
        w = (g[:, None] @ g[None, :]).expand(C, 1, n, n).contiguous()

        def filt(z):
            return F.conv2d(F.pad(z, (5, 5, 5, 5), mode="replicate"), w,
                            groups=C)

        mu1, mu2 = filt(x), filt(y)
        s1 = filt(x * x) - mu1 ** 2
        s2 = filt(y * y) - mu2 ** 2
        s12 = filt(x * y) - mu1 * mu2
        C1, C2 = (0.01 * val_range) ** 2, (0.03 * val_range) ** 2
        v1, v2 = 2 * s12 + C2, s1 + s2 + C2
        cs = (v1 / v2).mean().item()
        out = (((2 * mu1 * mu2 + C1) * v1)
               / ((mu1 ** 2 + mu2 ** 2 + C1) * v2)).mean().item()
        return (out, cs) if full else out

    @staticmethod
    def _torch_ssim_matlab(a, b, val_range=1.0):
        import torch
        import torch.nn.functional as F

        x = torch.from_numpy(np.moveaxis(a, -1, 0)[None, None]).double()
        y = torch.from_numpy(np.moveaxis(b, -1, 0)[None, None]).double()
        n = min(11, x.shape[3], x.shape[4])
        g = torch.exp(-((torch.arange(n, dtype=torch.float64) - n // 2) ** 2)
                      / (2 * 1.5 ** 2))
        g = g / g.sum()
        w = (g[:, None, None] * g[None, :, None] * g[None, None, :])[None, None]

        def filt(z):
            return F.conv3d(F.pad(z, (5,) * 6, mode="replicate"), w)

        mu1, mu2 = filt(x), filt(y)
        s1 = filt(x * x) - mu1 ** 2
        s2 = filt(y * y) - mu2 ** 2
        s12 = filt(x * y) - mu1 * mu2
        C1, C2 = (0.01 * val_range) ** 2, (0.03 * val_range) ** 2
        v1, v2 = 2 * s12 + C2, s1 + s2 + C2
        return (((2 * mu1 * mu2 + C1) * v1)
                / ((mu1 ** 2 + mu2 ** 2 + C1) * v2)).mean().item()

    def test_ssim_torch_parity(self, rng):
        from stif_tpu.utils.metrics import ssim_torch

        a = rng.random((24, 30, 3))
        b = np.clip(a + rng.standard_normal((24, 30, 3)) * 0.1, 0, 1)
        got, got_cs = ssim_torch(a, b, full=True)
        want, want_cs = self._torch_ssim(a, b, full=True)
        assert abs(got - want) < 1e-10
        assert abs(got_cs - want_cs) < 1e-10

    def test_ssim_torch_255_range(self, rng):
        from stif_tpu.utils.metrics import ssim_torch

        a = rng.random((20, 20, 3)) * 255
        b = np.clip(a + rng.standard_normal((20, 20, 3)) * 12, 0, 255)
        assert abs(ssim_torch(a, b) - self._torch_ssim(a, b)) < 1e-10

    def test_ssim_matlab_parity(self, rng):
        from stif_tpu.utils.metrics import ssim_matlab

        a = rng.random((24, 30, 3))
        b = np.clip(a + rng.standard_normal((24, 30, 3)) * 0.1, 0, 1)
        assert abs(ssim_matlab(a, b) - self._torch_ssim_matlab(a, b)) < 1e-10

    def test_msssim_parity(self, rng):
        from stif_tpu.utils.metrics import msssim

        # needs >= 11px after 4 halvings for the window not to shrink
        a = rng.random((200, 180, 3))
        b = np.clip(a + rng.standard_normal((200, 180, 3)) * 0.05, 0, 1)
        import torch
        import torch.nn.functional as F

        weights = np.array([0.0448, 0.2856, 0.3001, 0.2363, 0.1333])
        x, y = a, b
        mssim, mcs = [], []
        for _ in range(5):
            s, cs = self._torch_ssim(x, y, full=True)
            mssim.append(s)
            mcs.append(cs)
            xt = torch.from_numpy(np.moveaxis(x, -1, 0)[None])
            yt = torch.from_numpy(np.moveaxis(y, -1, 0)[None])
            x = np.moveaxis(F.avg_pool2d(xt, (2, 2))[0].numpy(), 0, -1)
            y = np.moveaxis(F.avg_pool2d(yt, (2, 2))[0].numpy(), 0, -1)
        pow1 = np.array(mcs) ** weights
        pow2 = np.array(mssim) ** weights
        want = float(np.prod(pow1[:-1] * pow2[-1]))
        assert abs(msssim(a, b) - want) < 1e-7


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
