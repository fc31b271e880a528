"""Batch evaluation harnesses.

Parity target: the ``test_metric_*`` family (``codes/myutils.py:368-1575``),
primarily ``test_metric_full`` (``:463-558``) — the Vid4 x4 space-time SR
protocol named in BASELINE.md: every-2nd-frame LR input, query times
t in {0.5, 0}, Y-channel MATLAB-convention PSNR/SSIM — and the Adobe-style x8
temporal protocol with per-time-index breakdown (``test_metric_adobe``,
``:727-939``), plus the latency report of ``test_metric_time`` (``:1428-1575``).

Unlike the reference, dataset locations are arguments, not hardcoded paths.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import numpy as np

from stif_tpu.data.native import host_imresize
from stif_tpu.utils.metrics import bgr2ycbcr, calculate_psnr, calculate_ssim


@dataclass
class EvalResult:
    psnr: Dict[str, float] = field(default_factory=dict)
    ssim: Dict[str, float] = field(default_factory=dict)
    per_time_psnr: List[float] = field(default_factory=list)
    avg_time_s: float = 0.0

    @property
    def mean_psnr(self) -> float:
        return float(np.mean(list(self.psnr.values()))) if self.psnr else 0.0

    @property
    def mean_ssim(self) -> float:
        return float(np.mean(list(self.ssim.values()))) if self.ssim else 0.0


def _load_frames(folder: str) -> np.ndarray:
    """Read a folder of frames -> (T, H, W, 3) float32 RGB in [0,1]."""
    import cv2

    names = sorted(
        n for n in os.listdir(folder)
        if n.lower().endswith((".png", ".jpg", ".jpeg", ".bmp"))
    )
    imgs = []
    for n in names:
        img = cv2.imread(os.path.join(folder, n), cv2.IMREAD_UNCHANGED)
        img = img.astype(np.float32) / 255.0
        imgs.append(img[..., [2, 1, 0]])  # BGR -> RGB
    return np.stack(imgs)


def eval_space_time_sr(pipeline, gt_root: str,
                       folders: Optional[Sequence[str]] = None,
                       times=(0.5, 0.0), y_channel: bool = True,
                       downscale: float = 0.25) -> EvalResult:
    """Vid4-style protocol: GT folders of HR frames; LR input = MATLAB-bicubic
    downscale of every 2nd frame; evaluate the model's frames at the given
    query times against GT (t=0.5 -> skipped odd frames, t=0 -> even frames).
    """
    folders = folders or sorted(
        d for d in os.listdir(gt_root)
        if os.path.isdir(os.path.join(gt_root, d))
    )
    res = EvalResult()
    t_total, n_calls = 0.0, 0
    for name in folders:
        gt = _load_frames(os.path.join(gt_root, name))  # (T, H, W, 3)
        # crop GT so LR dims are clean multiples
        m = int(round(1 / downscale))
        H = gt.shape[1] - gt.shape[1] % (m * 2)
        W = gt.shape[2] - gt.shape[2] % (m * 2)
        gt = gt[:, :H, :W]
        lr = host_imresize(gt, downscale)  # (T, h, w, 3)
        inputs = lr[::2]

        psnrs, ssims = [], []
        for i in range(inputs.shape[0] - 1):
            t0 = time.perf_counter()
            out = pipeline.render_window(inputs[i : i + 2], list(times))
            t_total += time.perf_counter() - t0
            n_calls += 1
            for ti, t in enumerate(times):
                gt_idx = 2 * i if t == 0.0 else int(round(2 * i + 2 * t))
                if gt_idx >= gt.shape[0]:
                    continue
                pred = np.clip(out[ti], 0, 1)
                ref = gt[gt_idx]
                if y_channel:
                    pred_m = bgr2ycbcr(pred[..., ::-1].astype(np.float32))
                    ref_m = bgr2ycbcr(ref[..., ::-1].astype(np.float32))
                else:
                    pred_m, ref_m = pred, ref
                psnrs.append(calculate_psnr(pred_m * 255, ref_m * 255))
                ssims.append(calculate_ssim(pred_m * 255, ref_m * 255))
        res.psnr[name] = float(np.mean(psnrs))
        res.ssim[name] = float(np.mean(ssims))
    res.avg_time_s = t_total / max(n_calls, 1)
    return res


def eval_temporal_x8(pipeline, gt_root: str,
                     folders: Optional[Sequence[str]] = None,
                     y_channel: bool = True,
                     downscale: float = 0.25) -> EvalResult:
    """Adobe/GoPro-style x8 temporal protocol (``test_metric_adobe``):
    input frames (i, i+8) downscaled; evaluate all 8 intermediate times with
    a per-time-index PSNR breakdown."""
    folders = folders or sorted(
        d for d in os.listdir(gt_root)
        if os.path.isdir(os.path.join(gt_root, d))
    )
    res = EvalResult()
    times = [i / 8 for i in range(8)]
    per_time = [[] for _ in range(8)]
    for name in folders:
        gt = _load_frames(os.path.join(gt_root, name))
        m = int(round(1 / downscale))
        H = gt.shape[1] - gt.shape[1] % m
        W = gt.shape[2] - gt.shape[2] % m
        gt = gt[:, :H, :W]
        lr = host_imresize(gt, downscale)
        psnrs, ssims = [], []
        for i in range(0, gt.shape[0] - 8, 8):
            out = pipeline.render_window(
                np.stack([lr[i], lr[i + 8]]), times
            )
            for ti in range(8):
                pred = np.clip(out[ti], 0, 1)
                ref = gt[i + ti]
                if y_channel:
                    pred = bgr2ycbcr(pred[..., ::-1].astype(np.float32))
                    ref = bgr2ycbcr(ref[..., ::-1].astype(np.float32))
                p = calculate_psnr(pred * 255, ref * 255)
                psnrs.append(p)
                per_time[ti].append(p)
                ssims.append(calculate_ssim(pred * 255, ref * 255))
        res.psnr[name] = float(np.mean(psnrs))
        res.ssim[name] = float(np.mean(ssims))
    res.per_time_psnr = [float(np.mean(p)) if p else 0.0 for p in per_time]
    return res
