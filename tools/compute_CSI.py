#!/usr/bin/env python
"""Temporal Curve Stability Index — reference ``tools/compute_CSI.py``
parity: CSI = mean over frames of the per-vertex second temporal
difference magnitude ‖(v_t − v_{t−1}) − (v_{t+1} − v_t)‖, averaged over
vertices, over an extracted mesh sequence (meshs/*.obj)."""

from __future__ import annotations

import argparse
import glob
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))


def compute_csi(mesh_dir: str) -> float:
    from recmv_tpu.utils.io import load_obj

    paths = sorted(glob.glob(osp.join(mesh_dir, "*.obj")))
    assert len(paths) >= 3, f"need ≥3 meshes under {mesh_dir}"
    dis, valid = 0.0, 0
    prev2, prev1 = load_obj(paths[0])[0], load_obj(paths[1])[0]
    for p in paths[2:]:
        cur = load_obj(p)[0]
        if prev2.shape != prev1.shape or prev1.shape != cur.shape:
            prev2, prev1 = prev1, cur
            continue
        ba = prev1 - prev2
        cb = cur - prev1
        dis += np.sqrt(((ba - cb) ** 2).sum(-1)).sum() / ba.shape[0]
        valid += 1
        prev2, prev1 = prev1, cur
    return dis / max(valid, 1)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("mesh_dir", help="directory of per-frame .obj meshes")
    args = ap.parse_args()
    print(f"CSI({args.mesh_dir}) = {compute_csi(args.mesh_dir):.6f}")
