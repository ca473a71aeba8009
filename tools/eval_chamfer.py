#!/usr/bin/env python
"""Chamfer evaluation of extracted garment meshes against ground truth —
the reference's quantitative eval role (``tools/fitting_garment_meshes.py``
+ paper Chamfer tables): for synthetic scenes, compare per-frame exported
meshes (meshs/NNNN_<garment>.obj) to the generator's gt_meshes/NNNN.npz."""

from __future__ import annotations

import argparse
import glob
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--mesh-dir", required=True, help="exported meshs/ dir")
    ap.add_argument("--platform", default="cpu")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    import recmv_tpu  # noqa: F401
    from recmv_tpu.ops.knn import chamfer_distance
    from recmv_tpu.utils.io import load_obj

    gt_paths = sorted(glob.glob(osp.join(args.data_root, "gt_meshes", "*.npz")))
    assert gt_paths, "no gt_meshes — Chamfer eval needs a synthetic scene"
    dists = []
    for gp in gt_paths:
        fid = int(osp.basename(gp).split(".")[0])
        cands = glob.glob(osp.join(args.mesh_dir, f"{fid:04d}_*.obj"))
        if not cands:
            continue
        gt = np.load(gp)["verts"]
        pred = np.concatenate([load_obj(c)[0] for c in cands], 0)
        d = float(chamfer_distance(jnp.asarray(pred), jnp.asarray(gt)))
        dists.append(d)
        print(f"frame {fid}: chamfer-L2 {d:.6f}")
    assert dists, "no matching exported meshes"
    print(f"mean chamfer-L2 over {len(dists)} frames: {np.mean(dists):.6f}")
    return float(np.mean(dists))


if __name__ == "__main__":
    main()
