#!/usr/bin/env python
"""Build Vimeo-style LMDB environments from septuplet image folders.

Produces GT/LQ ``data.mdb`` files with the reference's schema — key
``{a}_{b}_{frame}`` mapping to a raw uint8 HWC BGR blob at a fixed size
(``/root/reference/codes/data/Vimeo7_dataset.py:171,185`` read with
``data/util.py::_read_img_lmdb``) — using the dependency-free writer in
``stif_tpu.data.lmdb_io`` (no ``lmdb`` package required).

Usage:
  python tools/make_vimeo_lmdb.py --root <folders> --out <env_dir> [--frames 7]
"""

import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True,
                    help="septuplet tree: root/<a>/<b>/im{1..N}.png")
    ap.add_argument("--out", required=True, help="output env directory")
    ap.add_argument("--frames", type=int, default=7)
    args = ap.parse_args()

    import cv2

    from stif_tpu.data.lmdb_io import write_lmdb

    def items():
        shape = None
        for a in sorted(os.listdir(args.root)):
            pa = osp.join(args.root, a)
            if not osp.isdir(pa):
                continue
            for b in sorted(os.listdir(pa)):
                pb = osp.join(pa, b)
                if not osp.isdir(pb):
                    continue
                for i in range(1, args.frames + 1):
                    img = cv2.imread(osp.join(pb, f"im{i}.png"),
                                     cv2.IMREAD_COLOR)
                    if img is None:
                        raise FileNotFoundError(osp.join(pb, f"im{i}.png"))
                    if shape is None:
                        shape = img.shape
                        print(f"blob shape (H, W, C) = {shape}")
                    elif img.shape != shape:
                        raise ValueError(
                            f"{pb}/im{i}.png: {img.shape} != {shape}; "
                            "lmdb blobs must share one size")
                    yield f"{a}_{b}_{i}".encode(), img.tobytes()

    # sort=False streams pages to disk in O(page) memory — required at
    # Vimeo-90K scale (hundreds of GB of raw blobs); the folder walk above
    # yields keys in sorted order already (verified by the writer).
    stats = write_lmdb(args.out, items(), sort=False)
    print(f"wrote {args.out}: {stats}")


if __name__ == "__main__":
    main()
