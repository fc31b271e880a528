"""Training losses.

Parity targets: ``CharbonnierLoss`` (sum-reduced sqrt(d^2 + eps), eps=1e-6) and
the Gaussian/Laplacian-pyramid ``LapLoss``
(``codes/models/modules/loss.py:7-77``), plus the l1/l2/cb/lp selection of
``VideoSRBaseModel`` (``codes/models/VideoSR_base_model.py:43-53``).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp


def charbonnier_loss(x, y, eps: float = 1e-6):
    """Sum-reduced Charbonnier: sum(sqrt((x-y)^2 + eps))."""
    d = x - y
    return jnp.sum(jnp.sqrt(d * d + eps))


@lru_cache(maxsize=8)
def _gauss_kernel(size: int = 5, sigma: float = 2.0) -> np.ndarray:
    """(size, size) kernel reproducing the reference's construction —
    including its exp(...)**2 quirk (loss.py:23), which effectively halves the
    variance."""
    grid = np.mgrid[0:size, 0:size].T.astype(np.float32)
    g = np.exp((grid - size // 2) ** 2 / (-2 * sigma ** 2)) ** 2
    kernel = np.sum(g, axis=2)
    kernel /= kernel.sum()
    return kernel.astype(np.float32)


def _conv_gauss(img, kernel):
    """Depthwise 5x5 gaussian blur with replicate padding. img: NHWC."""
    k = kernel.shape[0]
    p = k // 2
    C = img.shape[-1]
    img_p = jnp.pad(img, ((0, 0), (p, p), (p, p), (0, 0)), mode="edge")
    w = jnp.asarray(kernel)[:, :, None, None] * jnp.eye(C)[None, None]
    dn = jax.lax.conv_dimension_numbers(img_p.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        img_p, w.astype(img.dtype), (1, 1), "VALID", dimension_numbers=dn,
        feature_group_count=1,
    )


def _avg_pool2(img):
    return jax.lax.reduce_window(
        img, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) / 4.0


def lap_loss(x, y, max_levels: int = 5, k_size: int = 5, sigma: float = 2.0):
    """Laplacian pyramid L1 loss (mean-reduced per level, summed)."""
    kernel = _gauss_kernel(k_size, sigma)

    def pyramid(img):
        pyr = []
        cur = img
        for _ in range(max_levels):
            filt = _conv_gauss(cur, kernel)
            pyr.append(cur - filt)
            cur = _avg_pool2(filt)
        pyr.append(cur)
        return pyr

    px, py_ = pyramid(x), pyramid(y)
    return sum(jnp.mean(jnp.abs(a - b)) for a, b in zip(px, py_))


def make_pixel_criterion(name: str):
    """'l1' | 'l2' | 'cb' | 'lp' -> loss fn (sum/mean semantics per torch)."""
    if name == "l1":
        return lambda x, y: jnp.mean(jnp.abs(x - y))
    if name == "l2":
        return lambda x, y: jnp.mean((x - y) ** 2)
    if name == "cb":
        return charbonnier_loss
    if name == "lp":
        return lap_loss
    raise ValueError(f"unknown pixel criterion '{name}'")
