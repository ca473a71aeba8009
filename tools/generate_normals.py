#!/usr/bin/env python
"""Per-frame normal maps for the ``normals/`` scene folder.

Parity with reference ``tools/generate_normals.py`` (169 LoC), which is
a driver meant to be copied INTO the external PIFuHD repo to infer
front normal maps. PIFuHD isn't available in this environment, so this
tool renders the normals of the LBS-posed SMPL body from ``smpl_rec.npz``
+ ``camera.npz`` with our rasterizer instead — a geometric stand-in with
the same output layout/encoding ((n+1)/2 PNGs). Body normals lack
cloth-wrinkle detail; for production quality swap in PIFuHD outputs —
the dataset reader accepts either.
"""

from __future__ import annotations

import argparse
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
    ap.add_argument("--platform", default=None,
                    choices=["cpu", "tpu", "axon"])
    ap.add_argument("--smpl-dir", default=None)
    args = ap.parse_args(argv)
    assert cv2 is not None, "opencv required"

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    import recmv_tpu  # noqa: F401
    from recmv_tpu.models import camera as cam_mod
    from recmv_tpu.models.skinner import initial_lbs_skinner, skinner_apply
    from recmv_tpu.models.smpl import get_smpl
    from recmv_tpu.ops.math3d import compute_fnorms
    from recmv_tpu.ops.rasterizer import rasterize_mesh, screen_with_cam_z

    rec = np.load(osp.join(args.data_root, "smpl_rec.npz"))
    campar = dict(np.load(osp.join(args.data_root, "camera.npz")))
    gender = str(rec.get("gender", "neutral"))
    model = get_smpl(gender, args.smpl_dir)
    from recmv_tpu.core.builder import apose_from_type

    sk, body_vs, body_fs = initial_lbs_skinner(
        model, jnp.asarray(rec["shape"].reshape(-1)[:10]),
        apose_from_type(0), (49, 81, 25))

    # image size from an existing frame
    imgs = sorted(os.listdir(osp.join(args.data_root, "imgs")))
    H, W = cv2.imread(osp.join(args.data_root, "imgs", imgs[0])).shape[:2]
    cam = cam_mod.make_camera(
        {"focal_length": np.asarray([campar["fx"], campar["fy"]]),
         "princeple_points": np.asarray([campar["cx"], campar["cy"]]),
         "cam2world_coord_quat": campar["quat"],
         "world2cam_coord_trans": campar["T"]}, (W, H))

    out_dir = osp.join(args.data_root, "normals")
    os.makedirs(out_dir, exist_ok=True)
    poses = rec["poses"].reshape(-1, 24, 3)
    trans = rec["trans"].reshape(-1, 3)
    fs = jnp.asarray(np.asarray(body_fs), jnp.int32)
    for fid in range(len(poses)):
        posed = skinner_apply(sk, jnp.asarray(body_vs)[None],
                              jnp.asarray(poses[fid])[None],
                              jnp.asarray(trans[fid])[None])[0]
        scr = screen_with_cam_z(cam, posed)
        frag = rasterize_mesh(scr, fs, (H, W), tile=32, cap=1024)
        p2f = np.asarray(frag.pix_to_face[..., 0])
        fn = np.asarray(compute_fnorms(posed, fs))
        fn_cam = fn @ np.asarray(cam.R)
        nimg = np.zeros((H, W, 3), np.float32)
        hit = p2f >= 0
        nimg[hit] = fn_cam[p2f[hit]]
        nimg[..., 2] *= -1
        stem = osp.splitext(imgs[fid])[0] if fid < len(imgs) else str(fid)
        cv2.imwrite(osp.join(out_dir, f"{stem}.png"),
                    ((nimg[:, :, ::-1] + 1) / 2 * 255).astype(np.uint8))
        if fid % 25 == 0:
            print(f"[normals] {fid}/{len(poses)}", flush=True)
    print(f"[normals] wrote {len(poses)} maps to {out_dir}")


if __name__ == "__main__":
    main()
