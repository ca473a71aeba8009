#!/usr/bin/env python
"""Fit garment templates to ground-truth garment meshes for
apples-to-apples Chamfer evaluation.

Parity with reference ``tools/fitting_garment_meshes.py`` (484 LoC):
the reference registers its DeepFashion3D templates onto the synthetic
dataset's GT garment meshes (Laplacian curve init → NRICP, epoch 250,
stiffness 50→0.1) so that the paper's Chamfer numbers compare meshes of
the same topology/open boundaries. This tool does the same with our
machinery: template → Laplacian best-match onto the GT boundary curves →
NRICP coarse → isotropic remesh → NRICP refine (core/inference.py
``register_garment``), then reports the fit Chamfer.

For our synthetic scenes the GT mesh is ``gt_meshes/0000.npz`` (frame 0
pose == the canonical A-pose, so the fit runs in canonical space) and
the GT curves are the generator's boundary rings.

Usage:
  python tools/fitting_garment_meshes.py --data-root <scene> \
      [--platform cpu] [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import sys

import numpy as np

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--out", default=None, help="output dir (default "
                    "<data-root>/gt_fits)")
    ap.add_argument("--platform", default=None,
                    choices=["cpu", "tpu", "axon"])
    ap.add_argument("--quick", action="store_true",
                    help="short NRICP schedules (CI/CPU)")
    args = ap.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    import recmv_tpu  # noqa: F401
    from recmv_tpu.core.inference import register_garment
    from recmv_tpu.data.synthetic import TORSO_Y, apose, boundary_ring
    from recmv_tpu.geometry.nricp import NricpConfig
    from recmv_tpu.models.garment import procedural_template
    from recmv_tpu.models.skinner import initial_lbs_skinner
    from recmv_tpu.models.smpl import synthetic_body_model
    from recmv_tpu.ops.knn import chamfer_distance
    from recmv_tpu.utils.io import save_obj

    out_dir = args.out or osp.join(args.data_root, "gt_fits")
    os.makedirs(out_dir, exist_ok=True)

    gt_path = osp.join(args.data_root, "gt_meshes", "0.npz")
    if not osp.isfile(gt_path):
        gt_path = osp.join(args.data_root, "gt_meshes", "0000.npz")
    gt = np.load(gt_path)
    gt_v, gt_f = gt["verts"].astype(np.float32), gt["faces"].astype(np.int64)

    # canonical body + template (the synthetic scene's generator body)
    body = synthetic_body_model()
    sk, body_vs, body_fs = initial_lbs_skinner(
        body, jnp.zeros(10), apose(), resolution=(17, 25, 9))
    joints = np.asarray(sk.Js)
    template = procedural_template("tube", np.asarray(body_vs),
                                   np.asarray(body_fs), joints)

    curves = {
        "neck": boundary_ring(TORSO_Y[1] - 0.01),
        "bottom_curve": boundary_ring(TORSO_Y[0] + 0.01),
    }

    if args.quick:
        cfg = NricpConfig(epochs=25, inner_iter=10, first_inner_iter=30,
                          stiffness_weight=(50.0, 5.0, 0.8),
                          milestones=(8, 16), laplacian_weight=(250.0,) * 3,
                          threshold=0.3, lr=1e-3)
        rcfg = NricpConfig(epochs=10, inner_iter=10, first_inner_iter=10,
                           stiffness_weight=(0.8, 0.2), milestones=(5,),
                           laplacian_weight=(250.0,) * 2, threshold=0.5,
                           lr=5e-4)
    else:
        # reference fitting schedule (fitting_garment_meshes.py: epoch 250,
        # stiffness 50→0.1 at milestones 50..200)
        cfg = NricpConfig(epochs=250, inner_iter=10, first_inner_iter=60,
                          stiffness_weight=(50.0, 20.0, 5.0, 2.0, 0.8, 0.5,
                                            0.35, 0.2, 0.1),
                          milestones=(50, 80, 100, 110, 120, 130, 140, 200),
                          laplacian_weight=(250.0,) * 9, threshold=0.3,
                          lr=1e-3)
        rcfg = None

    rv, rf, labels = register_garment(
        template, gt_v, gt_f, curves,
        save_path=osp.join(out_dir, "registry_gt_tube.obj"),
        nricp_cfg=cfg, refine_cfg=rcfg, remesh=True)

    d = float(chamfer_distance(jnp.asarray(rv), jnp.asarray(gt_v)))
    result = {"garment": "tube", "fit_chamfer_l2": d,
              "n_verts": int(len(rv)), "n_gt_verts": int(len(gt_v)),
              "labels": sorted(labels)}
    with open(osp.join(out_dir, "fit_report.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
