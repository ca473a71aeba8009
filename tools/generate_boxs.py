#!/usr/bin/env python
"""Per-frame person bounding boxes (``*_rect.txt`` contract).

Parity with reference ``tools/generate_boxs.py`` (92 LoC), which runs a
mobilenet openpose to box the subject before PIFuHD normal inference.
That external model isn't shipped; foreground masks carry the same
information, so we box from the mask when available (``--masks``) and
fall back to the full frame. Output format matches the reference/PIFuHD
contract: one ``<frame>_rect.txt`` per image with ``x y w h``.
"""

from __future__ import annotations

import argparse
import glob
import os.path as osp

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--imgs", required=True)
    ap.add_argument("--masks", default=None)
    ap.add_argument("--margin", type=float, default=0.1)
    args = ap.parse_args(argv)
    assert cv2 is not None, "opencv required"

    imgs = sorted(glob.glob(osp.join(args.imgs, "*.png")) +
                  glob.glob(osp.join(args.imgs, "*.jpg")))
    for ip in imgs:
        img = cv2.imread(ip)
        h, w = img.shape[:2]
        rect = [0, 0, w, h]
        if args.masks:
            stem = osp.splitext(osp.basename(ip))[0]
            for cand in (f"{stem}.png", f"{stem}.jpg"):
                mp = osp.join(args.masks, cand)
                if osp.isfile(mp):
                    m = cv2.imread(mp, cv2.IMREAD_GRAYSCALE)
                    ys, xs = np.where(m > 0)
                    if len(xs):
                        mw = (xs.max() - xs.min()) * args.margin
                        mh = (ys.max() - ys.min()) * args.margin
                        x0 = max(int(xs.min() - mw), 0)
                        y0 = max(int(ys.min() - mh), 0)
                        rect = [x0, y0,
                                min(int(xs.max() + mw), w) - x0,
                                min(int(ys.max() + mh), h) - y0]
                    break
        out = ip.rsplit(".", 1)[0] + "_rect.txt"
        with open(out, "w") as f:
            f.write(" ".join(str(int(v)) for v in rect))
        print(out, rect)


if __name__ == "__main__":
    main()
