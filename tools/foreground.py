#!/usr/bin/env python
"""Highlight a parsing-label group against a dimmed background.

Parity with reference ``tools/foreground.py`` (a figure-making utility
with hardcoded paths); generalized: pick a frame, a parsing group, and
an alpha ramp — writes one image per alpha.

Usage:
  python tools/foreground.py --img scene/imgs/000050.png \
      --parsing scene/parsing_SCH_ATR/mask_parsing_000050.npy \
      --labels 4 7 --out fg/
"""

from __future__ import annotations

import argparse
import os
import os.path as osp

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", required=True)
    ap.add_argument("--parsing", required=True)
    ap.add_argument("--labels", type=int, nargs="+", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args(argv)
    assert cv2 is not None, "opencv required"

    img = cv2.imread(args.img).astype(np.float64) / 255.0
    parsing = np.load(args.parsing)
    fg = np.zeros(parsing.shape, bool)
    for lbl in args.labels:
        fg |= parsing == lbl
    fg = fg[..., None].astype(np.float64)
    os.makedirs(args.out, exist_ok=True)
    for ratio in range(1, 10):
        alpha = ratio / 10.0
        out = fg * img + (1 - fg) * (img * alpha + (1 - alpha))
        cv2.imwrite(osp.join(args.out, f"{alpha:.4f}.png"),
                    (out * 255).astype(np.uint8))
    print(f"[foreground] wrote 9 alpha levels to {args.out}")


if __name__ == "__main__":
    main()
