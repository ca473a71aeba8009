#!/usr/bin/env python
"""Overlay exported per-frame meshes on the scene frames.

Parity with reference ``tools/visualize.py`` / ``animation_visualize.py``
(qualitative result videos): renders each ``meshs/NNNN_*.obj`` with the
scene camera and alpha-blends the shaded silhouette over the gt frame.

Usage:
  python tools/visualize.py --data-root <scene> \
      --mesh-dir <scene>/result/infer/meshs --out vis/
"""

from __future__ import annotations

import argparse
import glob
import os
import os.path as osp
import sys

import numpy as np

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--mesh-dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--alpha", type=float, default=0.6)
    ap.add_argument("--platform", default="cpu")
    args = ap.parse_args(argv)
    assert cv2 is not None, "opencv required"

    import jax

    jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    import recmv_tpu  # noqa: F401
    from recmv_tpu.models import camera as cam_mod
    from recmv_tpu.ops.math3d import compute_fnorms
    from recmv_tpu.ops.rasterizer import rasterize_mesh, screen_with_cam_z
    from recmv_tpu.utils.io import load_obj

    campar = dict(np.load(osp.join(args.data_root, "camera.npz")))
    imgs = sorted(glob.glob(osp.join(args.data_root, "imgs", "*")))
    H, W = cv2.imread(imgs[0]).shape[:2]
    cam = cam_mod.make_camera(
        {"focal_length": np.asarray([campar["fx"], campar["fy"]]),
         "princeple_points": np.asarray([campar["cx"], campar["cy"]]),
         "cam2world_coord_quat": campar["quat"],
         "world2cam_coord_trans": campar["T"]}, (W, H))

    os.makedirs(args.out, exist_ok=True)
    by_frame = {}
    for p in sorted(glob.glob(osp.join(args.mesh_dir, "*.obj"))):
        fid = int(osp.basename(p).split("_")[0])
        by_frame.setdefault(fid, []).append(p)

    for fid, paths in sorted(by_frame.items()):
        frame_img = None
        for ip in imgs:
            if int("".join(c for c in osp.splitext(osp.basename(ip))[0]
                           if c.isdigit()) or -1) == fid:
                frame_img = cv2.imread(ip)
                break
        if frame_img is None:
            frame_img = np.full((H, W, 3), 255, np.uint8)
        over = frame_img.astype(np.float64)
        for p in paths:
            v, f = load_obj(p)
            vj = jnp.asarray(np.asarray(v, np.float32))
            fj = jnp.asarray(np.asarray(f), jnp.int32)
            frag = rasterize_mesh(screen_with_cam_z(cam, vj), fj, (H, W),
                                  tile=32, cap=512)
            p2f = np.asarray(frag.pix_to_face[..., 0])
            hit = p2f >= 0
            fn = np.asarray(compute_fnorms(vj, fj))
            lam = np.abs(fn @ np.asarray(cam.R)[:, 2])
            shade = (np.asarray([120, 170, 230]) *
                     (0.3 + 0.7 * lam[p2f[hit], None]))
            over[hit] = (args.alpha * shade[:, ::-1]
                         + (1 - args.alpha) * over[hit])
        cv2.imwrite(osp.join(args.out, f"{fid:04d}.png"),
                    over.astype(np.uint8))
    print(f"[visualize] wrote {len(by_frame)} overlays to {args.out}")


if __name__ == "__main__":
    main()
