#!/usr/bin/env python
"""Side-by-side turntable renders of mesh sequences from N methods.

Parity with reference ``tools/comparison_results.py`` (144 LoC: renders
competitor meshes with pytorch3d for the paper's qualitative figures).
Takes any number of ``name=dir`` pairs of per-frame obj folders and
writes one horizontal strip per frame.

Usage:
  python tools/comparison_results.py --out cmp/ \
      ours=scene/result/infer/meshs ref=/path/to/ref_meshes
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


def render_mesh(verts, faces, image=512, yaw=0.0):
    import jax.numpy as jnp

    from recmv_tpu.models import camera as cam_mod
    from recmv_tpu.ops.math3d import compute_fnorms
    from recmv_tpu.ops.rasterizer import rasterize_mesh, screen_with_cam_z

    center = verts.mean(0)
    quat = np.asarray([np.cos((yaw + np.pi) / 2), 0.0,
                       np.sin((yaw + np.pi) / 2), 0.0], np.float32)
    cam = cam_mod.Camera(
        focal=jnp.asarray([image * 1.2, image * 1.2]),
        principal=jnp.asarray([image / 2.0, image / 2.0]),
        quat=jnp.asarray(quat), trans=jnp.asarray([0.0, 0.0, 2.5], jnp.float32),
        image_size=(image, image))
    sh = jnp.asarray(verts - center)
    fj = jnp.asarray(faces, jnp.int32)
    frag = rasterize_mesh(screen_with_cam_z(cam, sh), fj, (image, image),
                          tile=32, cap=256)
    p2f = np.asarray(frag.pix_to_face[..., 0])
    fn = np.asarray(compute_fnorms(sh, fj))
    lam = np.abs(fn @ np.asarray(cam.R)[:, 2])
    img = np.full((image, image, 3), 255, np.uint8)
    hit = p2f >= 0
    img[hit] = (np.asarray([[200, 190, 170]]) *
                (0.3 + 0.7 * lam[p2f[hit], None])).astype(np.uint8)
    return img


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--image", type=int, default=512)
    ap.add_argument("--yaw", type=float, default=0.0)
    ap.add_argument("methods", nargs="+", help="name=mesh_dir pairs")
    args = ap.parse_args(argv)
    assert cv2 is not None, "opencv required"

    import jax

    jax.config.update("jax_platforms", "cpu")
    from recmv_tpu.utils.io import load_obj

    os.makedirs(args.out, exist_ok=True)
    methods = [m.split("=", 1) for m in args.methods]
    seqs = {n: sorted(glob.glob(osp.join(d, "*.obj"))) for n, d in methods}
    n_frames = min(len(v) for v in seqs.values())
    for i in range(n_frames):
        tiles = []
        for name, files in seqs.items():
            v, f = load_obj(files[i])
            tile = render_mesh(np.asarray(v, np.float32), np.asarray(f),
                               args.image, args.yaw)
            cv2.putText(tile, name, (8, 24), cv2.FONT_HERSHEY_SIMPLEX, 0.7,
                        (30, 30, 30), 2)
            tiles.append(tile)
        strip = np.concatenate(tiles, axis=1)
        cv2.imwrite(osp.join(args.out, f"{i:04d}.png"), strip[:, :, ::-1])
    print(f"[cmp] wrote {n_frames} strips x {len(methods)} methods to {args.out}")


if __name__ == "__main__":
    main()
