#!/usr/bin/env python
"""Golden-path inference driver (reference ``codes/custom_video_test.py``,
README "Testing") — with real CLI flags instead of hardcoded paths.

Reads a directory of frame folders, applies the x2 MATLAB-bicubic LR
degradation, renders 8 intermediate frames per adjacent pair at x4 spatial
scale, and writes HR / bicubic-baseline / LR outputs.

Usage:
  python scripts/test_video.py --input video_sequences/ --output output/ \
      [--checkpoint latest_G.pth | --params orbax_dir] [--times 8] [--scale 4]
"""

import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", default="output")
    ap.add_argument("--checkpoint", default=None, help=".pth weights")
    ap.add_argument("--params", default=None, help="orbax params dir")
    ap.add_argument("--times", type=int, default=8)
    ap.add_argument("--scale", type=int, default=4)
    ap.add_argument("--folders", nargs="*", default=None)
    ap.add_argument("--no-degrade", action="store_true",
                    help="inputs are already LR; skip the x2 downscale")
    args = ap.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp

    from stif_tpu.models import LunaTokis
    from stif_tpu.ops.resize import imresize
    from stif_tpu.runtime import InferencePipeline
    from stif_tpu.utils.metrics import tensor2img

    model = LunaTokis()
    # init on CPU (fast), then load weights
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = jax.jit(lambda: model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 2, 16, 16, 3)),
            jnp.zeros((2,)), method=model.full_init))()
    if args.checkpoint:
        from stif_tpu.convert import load_pth_checkpoint
        params = load_pth_checkpoint(args.checkpoint, params)
    elif args.params:
        from stif_tpu.train.checkpoints import load_params
        params = load_params(args.params, params)
    else:
        print("WARNING: no weights given — running with random init")

    pipe = InferencePipeline(model, params, scale=args.scale)

    folders = args.folders or sorted(
        d for d in os.listdir(args.input)
        if osp.isdir(osp.join(args.input, d))
    )
    times = [i / args.times for i in range(args.times)]
    for folder in folders:
        fdir = osp.join(args.input, folder)
        names = sorted(os.listdir(fdir))
        out_hr = osp.join(args.output, folder, "HR")
        out_bic = osp.join(args.output, folder, "bicubic")
        out_lr = osp.join(args.output, folder, "LR")
        for d in (out_hr, out_bic, out_lr):
            os.makedirs(d, exist_ok=True)

        idx = 0
        for i in range(len(names) - 1):
            imgs = []
            for name in (names[i], names[i + 1]):
                img = cv2.imread(osp.join(fdir, name), cv2.IMREAD_UNCHANGED)
                img = img.astype(np.float32) / 255.0
                if not args.no_degrade:
                    img = np.asarray(imresize(img, 0.5))
                imgs.append(img[..., [2, 1, 0]])  # BGR -> RGB
            frames = np.stack(imgs)
            cv2.imwrite(osp.join(out_lr, names[i]),
                        tensor2img(frames[0][..., ::-1]))
            out = pipe.render_window(frames, times)
            h, w = frames.shape[1:3]
            for ti in range(out.shape[0]):
                cv2.imwrite(osp.join(out_hr, f"{idx}.jpg"),
                            tensor2img(out[ti][..., ::-1]))
                bic = cv2.resize(tensor2img(frames[0][..., ::-1]),
                                 (w * args.scale, h * args.scale),
                                 interpolation=cv2.INTER_CUBIC)
                cv2.imwrite(osp.join(out_bic, f"{idx}.jpg"), bic)
                idx += 1
            print(f"{folder}: pair {i} -> {out.shape[0]} frames")


if __name__ == "__main__":
    main()
