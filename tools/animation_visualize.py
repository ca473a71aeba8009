#!/usr/bin/env python
"""Encode exported render/animation frames into a video — working
replacement for the reference's ``tools/animation_visualize.py`` (which
shells out to a site-local ``encodepngffmpeg`` helper and contains a
placeholder line; the intent — colors/ pngs → results/animation mp4 —
is reproduced here with cv2's VideoWriter, no external encoder needed).

Usage:
  python tools/animation_visualize.py --path <rec-root>/infer
  python tools/animation_visualize.py --frames <dir-of-pngs> --out a.mp4
"""

from __future__ import annotations

import argparse
import glob
import os
import os.path as osp


def encode(frames_dir: str, out_path: str, fps: int = 30) -> int:
    import cv2

    frames = sorted(glob.glob(osp.join(frames_dir, "*.png"))) or \
        sorted(glob.glob(osp.join(frames_dir, "*.jpg")))
    if not frames:
        return 0
    first = cv2.imread(frames[0])
    h, w = first.shape[:2]
    os.makedirs(osp.dirname(osp.abspath(out_path)), exist_ok=True)
    vw = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*"mp4v"),
                         fps, (w, h))
    n = 0
    for fp in frames:
        img = cv2.imread(fp)
        if img is None:
            continue
        if img.shape[:2] != (h, w):
            img = cv2.resize(img, (w, h))
        vw.write(img)
        n += 1
    vw.release()
    return n


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--path", default=None,
                    help="inference output root: encodes its colors/ and "
                         "render/ subdirs into results/*.mp4")
    ap.add_argument("--frames", default=None, help="a single frame dir")
    ap.add_argument("--out", default=None, help="output mp4 (with --frames)")
    ap.add_argument("--fps", type=int, default=30)
    args = ap.parse_args(argv)

    if args.frames:
        n = encode(args.frames, args.out or "animation.mp4", args.fps)
        print(f"[animation_visualize] {n} frames -> "
              f"{args.out or 'animation.mp4'}")
        return
    if not args.path:
        ap.error("one of --path / --frames is required")
    result = osp.join(args.path, "results")
    os.makedirs(result, exist_ok=True)
    for sub in ("colors", "render", "meshs_png"):
        d = osp.join(args.path, sub)
        if osp.isdir(d):
            n = encode(d, osp.join(result, f"{sub}.mp4"), args.fps)
            print(f"[animation_visualize] {sub}: {n} frames")


if __name__ == "__main__":
    main()
