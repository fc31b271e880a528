from stif_tpu.utils.metrics import (
    calculate_psnr,
    calculate_ssim,
    bgr2ycbcr,
    rgb2ycbcr,
    ycbcr2rgb,
)
from stif_tpu.utils.config import parse_options, NoneDict

__all__ = [
    "calculate_psnr",
    "calculate_ssim",
    "bgr2ycbcr",
    "rgb2ycbcr",
    "ycbcr2rgb",
    "parse_options",
    "NoneDict",
]
