#!/usr/bin/env python
"""Compute the dev-split bicubic t=0 bar for the round-5 adoption gate.

The keep-best ``score`` (t0+t0.5 Y-PSNR on the seed-880k dev split) is not
the mandate; the mandate is plain-decode t0 > bicubic. This tool renders
(or reuses) the same dev scenes the in-training Validator probes
(``stif_tpu.train.validation.Validator`` defaults) and records the bicubic
x4 t=0 Y-PSNR bar once, so ``tools/round5_finish.sh`` can gate adoption on
the mandate itself. Pure host-side (no TPU): MATLAB-bicubic down+up via
the native frame ops.

Writes ``runs/val_data/BICUBIC_BAR.json``.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    from stif_tpu.data.native import host_imresize
    from stif_tpu.data.synthetic import render_eval_folders
    from stif_tpu.runtime.eval import _load_frames
    from stif_tpu.utils.metrics import bgr2ycbcr, calculate_psnr

    root = render_eval_folders("runs/val_data", n_scenes=3, n_frames=12,
                               size=(144, 192), seed0=880_000)
    vals = []
    for d in sorted(os.listdir(root)):
        folder = os.path.join(root, d)
        if not os.path.isdir(folder):
            continue
        gt = _load_frames(folder)
        # the x4 space-time protocol feeds every 2nd frame at 1/4 scale;
        # t=0 reconstructions are compared to the even GT frames
        for i in range(0, gt.shape[0] - 1, 2):
            up = host_imresize(host_imresize(gt[i], 0.25), 4.0)
            p = bgr2ycbcr(np.clip(up, 0, 1)[..., ::-1].astype(np.float32))
            r = bgr2ycbcr(gt[i][..., ::-1].astype(np.float32))
            vals.append(calculate_psnr(p * 255, r * 255))
    rec = {"t0_psnr_y": round(float(np.mean(vals)), 4),
           "n_frames": len(vals),
           "protocol": "dev split seed 880k, x4 bicubic down+up, Y-PSNR"}
    out = os.path.join(root, "BICUBIC_BAR.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=2)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
