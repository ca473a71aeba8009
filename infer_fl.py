#!/usr/bin/env python
"""Garment extraction + per-frame animation from a fitted scene —
reference ``infer_fl.py`` parity: load the saved config + checkpoint,
extract MC meshes at inference resolution, register the open garment
templates (Laplacian curve alignment + NRICP), and export per-frame posed
garments, body meshes and renders."""

from __future__ import annotations

import argparse
import os.path as osp


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data-root", required=True)
    p.add_argument("--save-folder", default="result")
    p.add_argument("--conf", default=None, help="defaults to <save>/config.conf")
    p.add_argument("--ckpt", default=None, help="defaults to <save>/latest.ckpt")
    p.add_argument("--out", default=None, help="defaults to <save>/infer")
    p.add_argument("--quality", default="coarse",
                   choices=["small", "coarse", "medium", "fine", "higher"])
    p.add_argument("--frames", type=int, nargs="*", default=None)
    p.add_argument("--platform", default=None, choices=["cpu", "tpu", "axon"])
    p.add_argument("--curves-only", action="store_true",
                   help="export feature-curve tube meshes (infer_fl_curve)")
    p.add_argument("--no-images", action="store_true",
                   help="skip png renders (reference --nI)")
    p.add_argument("--no-color", action="store_true",
                   help="skip per-pixel RenderNet colors (reference --nColor)")
    p.add_argument("--smooth", dest="smooth", action="store_true", default=None,
                   help="force OneEuro pose/trans smoothing on")
    p.add_argument("--no-smooth", dest="smooth", action="store_false",
                   help="force smoothing off (default: on for subjects with "
                        "SMOOTH_TRANS ranges, like the reference's smooth_trans "
                        "gate, OptimGarmentNetwork.py:2984-2989)")
    p.add_argument("--offset-filter", action="store_true",
                   help="replace outlier frames' deformer latents with the "
                        "last stable frame's (offset_filter, "
                        "OptimGarmentNetwork.py:2519-2560)")
    return p.parse_args(argv)


def load_net(args):
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import numpy as np

    import recmv_tpu  # noqa: F401
    from recmv_tpu.config import ConfigFactory
    from recmv_tpu.config.constants import TEMPLATE_GARMENT
    from recmv_tpu.core.builder import build_opt_net, resolution_pyramids
    from recmv_tpu.data.dataset import get_dataset_and_loader

    save_root = osp.join(args.data_root, args.save_folder)
    conf_path = args.conf or osp.join(save_root, "config.conf")
    conf = ConfigFactory.parse_file(conf_path)
    garment_type = conf.get_string("train.garment_type")
    n_g = len(TEMPLATE_GARMENT[garment_type])
    conds_lens = {
        "deformer": conf.get_int("mlp_deformer.condlen") * (1 + n_g),
        "render": conf.get_int("render_net.condlen"),
    }
    dataset, _ = get_dataset_and_loader(
        args.data_root, conds_lens, 1, shuffle=False, garment_type=garment_type,
        data_type=conf.get_string("train.data_type", "people_snap"))
    net = build_opt_net(conf, dataset, save_root,
                        resolutions=resolution_pyramids(args.quality))
    ckpt = args.ckpt or osp.join(save_root, "latest.ckpt")
    if not osp.isfile(ckpt):
        ckpt = osp.join(save_root, "initial_sdf.ckpt")
    net.load_checkpoint(ckpt)
    # templates are needed for registration; rebuild them
    from recmv_tpu.models.garment import garment_templates_from_body

    net.garment_templates = garment_templates_from_body(
        net.statics.garment_names, np.asarray(net.tmp_body_vs),
        np.asarray(net.tmp_body_fs), np.asarray(net.params["skinner"].Js))
    return net, dataset, save_root


def main(argv=None):
    args = parse_args(argv)
    net, dataset, save_root = load_net(args)
    import numpy as np

    from recmv_tpu.core.inference import GarmentInference

    out = args.out or osp.join(save_root, "infer")
    inf = GarmentInference(net)
    frames = args.frames if args.frames else list(range(dataset.frame_num))
    ratio = {"sdfRatio": 1.0, "deformerRatio": 1.0, "renderRatio": 1.0}

    # pose smoothing per the SMOOTH_TRANS subject table (smooth_trans,
    # OptimGarmentNetwork.py:2567-2728, 2984-2989): on by default for
    # subjects with configured jitter ranges, forceable either way
    from recmv_tpu.config.constants import SMOOTH_TRANS
    from recmv_tpu.core.inference import smooth_scene_poses

    subject = osp.basename(args.data_root.rstrip("/"))
    ranges = [r for r in SMOOTH_TRANS.get(subject, []) if len(r) == 2]
    do_smooth = args.smooth if args.smooth is not None else bool(ranges)
    if do_smooth:
        net.sync_scene_to_dataset()
        smooth_scene_poses(dataset, ranges=ranges or None)
        net.invalidate_scene()
        print(f"[infer] smoothed poses/trans "
              f"({'ranges ' + str(ranges) if ranges else 'all frames'})")

    if args.quality == "higher":
        # 513³ inference grids (reference train.py:47-79 `higher`): seg3d
        # on device, extraction through the native host marching cubes
        print("[infer] extracting at 513³ via native host MC ...")
        net.marching_cube_update_host(ratio)

    if args.curves_only:
        inf.infer_garment_fl(np.asarray(frames), ratio, osp.join(out, "fl_meshs"))
    else:
        if args.offset_filter:
            inf.ensure_registration(ratio, out)
            inf.offset_filter(ratio)
        _, errors = inf.infer_garment(np.asarray(frames), ratio, out,
                                      images=not args.no_images,
                                      colors=not args.no_color)
        np.save(osp.join(out, "maskE.npy"), errors["maskE"])
    print(f"[infer] wrote outputs under {out}")
    return inf


if __name__ == "__main__":
    main()
