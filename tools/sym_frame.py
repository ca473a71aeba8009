#!/usr/bin/env python
"""Remap feature-line annotation filenames to a different frame rate.

Parity with reference ``tools/sym_frame.py``: annotations drawn on an
N-fps export are renamed to the scene's 30-fps frame ids
(target = round(source * fps/30)).

Usage: python tools/sym_frame.py --input-path <scene> --frame 25
"""

from __future__ import annotations

import argparse
import glob
import os
import os.path as osp
import shutil


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input-path", required=True)
    ap.add_argument("--frame", type=float, default=25)
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args(argv)
    frame_diff = args.frame / 30.0
    assert frame_diff <= 1.0

    fl_dir = osp.join(args.input_path, "featurelines")
    moves = []
    for f in sorted(glob.glob(osp.join(fl_dir, "*.json"))):
        cur = float(osp.splitext(osp.basename(f))[0])
        target = osp.join(fl_dir, f"{int(cur * frame_diff):06d}.json")
        moves.append((f, target))
    for src, dst in moves:
        print(f"{src} -> {dst}")
        if not args.dry_run:
            shutil.move(src, dst)


if __name__ == "__main__":
    main()
