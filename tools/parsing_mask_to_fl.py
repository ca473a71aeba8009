#!/usr/bin/env python
"""2D feature-line extraction from garment parsing masks — reference
``tools/parsing_mask_to_fl.py`` parity (PolyMask): per frame, extract the
garment-region boundary polygons from the ATR parsing mask, cut the
shortest contour path between landmark pairs per curve type, and write
labelme-style ``mask2fl/<frame>.json`` annotations.

The reference drives this with openpose landmarks; here landmarks default
to projected SMPL joints (shoulders/hips/wrists) from smpl_rec.npz, with
the same JSON output contract."""

from __future__ import annotations

import argparse
import glob
import json
import os
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))


def garment_boundary_polygons(parsing: np.ndarray, labels) -> list:
    """Boundary contours (cv2) of the union of the given parsing labels."""
    import cv2

    mask = np.isin(parsing, list(labels)).astype(np.uint8)
    contours, _ = cv2.findContours(mask, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_NONE)
    return [c[:, 0, :] for c in contours if len(c) >= 16]  # (P, 2) xy


def shortest_contour_path(contour: np.ndarray, p0, p1) -> np.ndarray:
    """The shorter of the two arcs between the contour points nearest to
    the landmarks p0, p1 (the reference's curve cut)."""
    d0 = np.linalg.norm(contour - np.asarray(p0)[None], axis=1)
    d1 = np.linalg.norm(contour - np.asarray(p1)[None], axis=1)
    i0, i1 = int(d0.argmin()), int(d1.argmin())
    if i0 > i1:
        i0, i1 = i1, i0
    arc_a = contour[i0 : i1 + 1]
    arc_b = np.concatenate([contour[i1:], contour[: i0 + 1]], 0)
    return arc_a if len(arc_a) <= len(arc_b) else arc_b


def neck_landmarks(joints2d):
    return joints2d[16], joints2d[17]  # shoulders


def hem_landmarks(joints2d):
    return joints2d[1], joints2d[2]  # hips


def extract_frame(parsing, joints2d, curves):
    from recmv_tpu.config.constants import ATR_PARSING

    shapes = []
    upper = garment_boundary_polygons(parsing, ATR_PARSING["upper"])
    if not upper:
        return shapes
    contour = max(upper, key=len)
    for name in curves:
        if name == "neck":
            p0, p1 = neck_landmarks(joints2d)
        elif name in ("bottom_curve", "upper_bottom"):
            p0, p1 = hem_landmarks(joints2d)
        else:
            continue
        arc = shortest_contour_path(contour, p0, p1)
        if len(arc) >= 8:
            shapes.append({"label": name, "shape_type": "linestrip",
                           "points": arc.astype(float).tolist()})
    return shapes


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--curves", nargs="*", default=["neck", "bottom_curve"])
    ap.add_argument("--platform", default="cpu")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    import recmv_tpu  # noqa: F401
    from recmv_tpu.models import camera as cam_mod
    from recmv_tpu.models.smpl import get_smpl, smpl_forward

    root = args.data_root
    out_dir = osp.join(root, "mask2fl")
    os.makedirs(out_dir, exist_ok=True)
    rec = np.load(osp.join(root, "smpl_rec.npz"))
    cam_npz = np.load(osp.join(root, "camera.npz"))
    camera = cam_mod.make_camera(
        {"focal_length": np.asarray([cam_npz["fx"], cam_npz["fy"]]),
         "princeple_points": np.asarray([cam_npz["cx"], cam_npz["cy"]]),
         "cam2world_coord_quat": cam_npz["quat"],
         "world2cam_coord_trans": cam_npz["T"]},
        _image_size(root))
    model = get_smpl(str(rec["gender"]) if "gender" in rec else "neutral")
    poses = np.asarray(rec["poses"], np.float32).reshape(-1, 24, 3)
    trans = np.asarray(rec["trans"], np.float32).reshape(-1, 3)

    parsing_paths = sorted(
        glob.glob(osp.join(root, "parsing_SCH_ATR", "[0-9]*.npy")),
        key=lambda p: int(osp.basename(p).split(".")[0]))
    n = 0
    for p in parsing_paths:
        fid = int(osp.basename(p).split(".")[0])
        parsing = np.load(p)
        _, joints, _ = smpl_forward(model, jnp.zeros(10), jnp.asarray(poses[fid])[None])
        j3 = np.asarray(joints[0]) + trans[fid]
        j2 = np.asarray(cam_mod.project(camera, jnp.asarray(j3)))
        shapes = extract_frame(parsing, j2, args.curves)
        if shapes:
            with open(osp.join(out_dir, f"{fid}.json"), "w") as f:
                json.dump({"shapes": shapes}, f)
            n += 1
    print(f"[parsing_mask_to_fl] wrote {n} annotations to {out_dir}")


def _image_size(root):
    import cv2

    masks = glob.glob(osp.join(root, "masks", "*.png"))
    h, w = cv2.imread(masks[0]).shape[:2]
    return (w, h)


if __name__ == "__main__":
    main()
