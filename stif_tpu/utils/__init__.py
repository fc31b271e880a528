from stif_tpu.utils.metrics import (
    calculate_psnr,
    calculate_ssim,
    ssim_torch,
    ssim_matlab,
    msssim,
    bgr2ycbcr,
    rgb2ycbcr,
    ycbcr2rgb,
)
from stif_tpu.utils.config import parse_options, NoneDict
from stif_tpu.utils.misc import AverageMeter, ProgressBar

__all__ = [
    "calculate_psnr",
    "calculate_ssim",
    "ssim_torch",
    "ssim_matlab",
    "msssim",
    "bgr2ycbcr",
    "rgb2ycbcr",
    "ycbcr2rgb",
    "parse_options",
    "NoneDict",
    "AverageMeter",
    "ProgressBar",
]
