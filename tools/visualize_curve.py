#!/usr/bin/env python
"""Export the optimized canonical feature curves as tube meshes —
working replacement for the reference's ``tools/visualize_curve.py``
(an unfinished fragment of the rotate-normal tube sweep; the sweep
itself lives in ``models/curves.curve_to_tube_mesh``, reference
``engineer/utils/garment_structure.py:curve_to_mesh``).

Writes one obj per feature line (canonical space) plus, with
``--frames``, per-frame deformed tubes (what infer_fl --curves-only
exports per frame).

Usage:
  python tools/visualize_curve.py --data-root <scene> [--save-folder rec]
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import sys

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--save-folder", default="result")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--out", default=None, help="default <save>/curve_vis")
    ap.add_argument("--radius", type=float, default=0.002)
    ap.add_argument("--joints", type=int, default=6)
    ap.add_argument("--frames", type=int, nargs="*", default=None,
                    help="also export tubes deformed to these frames")
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu", "axon"])
    args = ap.parse_args(argv)

    from infer_fl import load_net

    class _A:
        pass

    la = _A()
    la.__dict__.update(vars(args))
    la.conf = None
    la.quality = "small"
    la.curves_only = True
    net, dataset, save_root = load_net(la)

    import numpy as np

    from recmv_tpu.models.curves import curve_to_tube_mesh, curves_forward
    from recmv_tpu.utils.io import save_obj

    out = args.out or osp.join(save_root, "curve_vis")
    os.makedirs(out, exist_ok=True)
    curves = np.asarray(curves_forward(net.params["curves"], net.curve_statics))
    nx = np.asarray(net.curve_statics.nx)[:, 0]
    wrote = []
    for ci, cname in enumerate(net.curve_statics.fl_names):
        tv, tf = curve_to_tube_mesh(curves[ci], nx[ci], args.radius,
                                    args.joints)
        path = osp.join(out, f"cano_{cname}.obj")
        save_obj(path, tv, tf)
        wrote.append(path)

    if args.frames:
        import jax.numpy as jnp

        for fid in args.frames:
            posed = net._deform_garment_verts(
                {"translator": net.params["translator"]}, net.scene_tree(),
                [jnp.asarray(curves.reshape(-1, 3))], jnp.asarray([fid]),
                {"sdfRatio": 1.0, "deformerRatio": 1.0, "renderRatio": 1.0},
            )[0][0]
            posed = np.asarray(posed).reshape(curves.shape)
            for ci, cname in enumerate(net.curve_statics.fl_names):
                tv, tf = curve_to_tube_mesh(posed[ci], nx[ci], args.radius,
                                            args.joints)
                path = osp.join(out, f"{fid:04d}_{cname}.obj")
                save_obj(path, tv, tf)
                wrote.append(path)
    print(f"[visualize_curve] wrote {len(wrote)} tube meshes under {out}")


if __name__ == "__main__":
    main()
