#!/usr/bin/env python
"""Per-scene training CLI — reference ``train.py`` parity (self-rotation
stage): parse the HOCON config, build dataset + network, run one-time SDF
and curve initialization, then the epoch loop with hierarchy promotions
(coarse → medium → fine), per-epoch checkpoints, and MultiStepLR.

Usage:
  python train.py --conf configs/synthetic/smoke.conf \
      --data-root /path/to/scene --save-folder result
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import sys
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="REC-MV TPU per-scene optimization")
    p.add_argument("--conf", required=True)
    p.add_argument("--data-root", required=True)
    p.add_argument("--save-folder", default="result")
    p.add_argument("--resume", default=None, help="checkpoint to resume from")
    p.add_argument("--a-pose", action="store_true", default=True)
    p.add_argument("--no-a-pose", dest="a_pose", action="store_false")
    p.add_argument("--quality", default="coarse",
                   choices=["tiny", "small", "coarse", "medium", "fine", "higher"],
                   help="marching-cube pyramid size")
    p.add_argument("--init-epochs", type=int, default=None,
                   help="override SDF init epochs (reference initial_iters)")
    p.add_argument("--max-steps", type=int, default=None,
                   help="cap optimization steps (smoke tests)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--save-debug", action="store_true",
                   help="write debug overlays (projected curves, mask "
                        "comparisons, mesh turntables) at remesh cadence "
                        "(reference save_debug/visualize_curve_mesh)")
    p.add_argument("--wandb", action="store_true",
                   help="log scalars/images to wandb in addition to the "
                        "always-on local JSONL/PNG backend")
    p.add_argument("--no-vis", action="store_true",
                   help="disable the step-level visualizer entirely")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu", "axon"],
                   help="force a JAX platform (the axon plugin ignores "
                        "JAX_PLATFORMS, so use this flag)")
    p.add_argument("--cache-dir", default="/tmp/recmv_jax_cache",
                   help="persistent XLA compilation cache ('' disables)")
    p.add_argument("--exec-cache", default="/tmp/recmv_exec_cache",
                   help="serialized-executable cache dir ('' disables): "
                        "phase/extract executables reload across processes "
                        "even where XLA's own cache keys are unstable")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.cache_dir:
        os.makedirs(args.cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", args.cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if args.exec_cache:
        os.environ.setdefault("RECMV_EXEC_CACHE", args.exec_cache)

    import recmv_tpu  # noqa: F401  (sets matmul precision)
    from recmv_tpu.config import ConfigFactory, dump_config
    from recmv_tpu.core.builder import build_opt_net, resolution_pyramids
    from recmv_tpu.data.dataset import get_dataset_and_loader

    conf = ConfigFactory.parse_file(args.conf)
    garment_type = conf.get_string("train.garment_type")
    data_type = conf.get_string("train.data_type", "people_snap")
    save_root = osp.join(args.data_root, args.save_folder)
    os.makedirs(save_root, exist_ok=True)
    with open(osp.join(save_root, "config.conf"), "w") as f:
        f.write(dump_config(conf))

    condlen_deform = conf.get_int("mlp_deformer.condlen")
    condlen_render = conf.get_int("render_net.condlen")
    from recmv_tpu.config.constants import TEMPLATE_GARMENT

    n_garments = len(TEMPLATE_GARMENT[garment_type])
    conds_lens = {
        "deformer": condlen_deform * (1 + n_garments),
        "render": condlen_render,
    }

    batch_size = conf.get_int("train.coarse.point_render.batch_size")
    dataset, sampler = get_dataset_and_loader(
        args.data_root, conds_lens, batch_size,
        shuffle=conf.get_bool("train.shuffle", True),
        garment_type=garment_type, data_type=data_type, a_pose=args.a_pose,
        seed=args.seed,
    )
    print(f"[train] scene {args.data_root}: {dataset.frame_num} frames "
          f"{dataset.W}x{dataset.H}, garments {TEMPLATE_GARMENT[garment_type]}")

    resolutions = resolution_pyramids(args.quality)
    skinner_res = {"tiny": (17, 25, 9), "small": (65, 113, 33)}.get(
        args.quality, (129, 225, 65))
    net = build_opt_net(conf, dataset, save_root, resolutions=resolutions,
                        skinner_res=skinner_res, seed=args.seed)

    start_epoch = 0
    ckpt_latest = osp.join(save_root, "latest.ckpt")
    init_ckpt = osp.join(save_root, "initial_sdf.ckpt")
    if args.resume and osp.isfile(args.resume):
        start_epoch = net.load_checkpoint(args.resume)
        print(f"[train] resumed from {args.resume} at epoch {start_epoch}")
    elif osp.isfile(init_ckpt):
        net.load_checkpoint(init_ckpt)
        print("[train] loaded cached SDF initialization")
    else:
        init_iters = args.init_epochs
        if init_iters is None:
            init_iters = abs(conf.get_int("train.initial_iters", -1200))
        print(f"[train] one-time initialization ({init_iters} IGR epochs)...")
        t0 = time.time()
        # DeepFashion3D-registered template assets (reference
        # smpl_clothes_template layout) when the scene ships them;
        # procedural body-slice templates otherwise
        template_dir = conf.get_string("train.template_dir", "")
        if not template_dir:
            cand = osp.join(args.data_root, "smpl_clothes_template")
            template_dir = cand if osp.isdir(cand) else None
        net.initialize_tmp_sdf(nepochs=init_iters, save_dir=save_root,
                               template_dir=template_dir)
        print(f"[train] initialization done in {time.time()-t0:.1f}s")

    if net.curve_statics is None:
        # resumed checkpoints carry curves; initialization builds them
        net.initialize_tmp_sdf(nepochs=1, save_dir=save_root, fl_iters=20)

    nepochs = conf.get_int("train.nepoch")
    milestones = conf.get_list("train.scheduler.milestones", [])
    factor = conf.get_float("train.scheduler.factor", 0.333)

    # step-level observability (reference draw_loss / wandb_visualizer):
    # scalars per step into <save_root>/logs/scalars.jsonl (+wandb with
    # --wandb); curve/mesh turntable images at remesh cadence
    visualizer = None
    if not args.no_vis:
        from recmv_tpu.utils.visualizer import get_visualizer

        visualizer = get_visualizer(
            osp.join(save_root, "logs"), project="recmv_tpu",
            name=f"{garment_type}_{osp.basename(osp.normpath(args.data_root))}",
            use_wandb=args.wandb)

    ratio = {"sdfRatio": 1.0, "deformerRatio": 0.5, "renderRatio": 1.0}
    import jax.random as jrandom

    key = jrandom.PRNGKey(args.seed)
    steps = 0
    t_start = time.time()

    # parallel AOT compile of the phase executables (overlaps the axon
    # remote-compile requests and fills the persistent cache) so step 1
    # isn't a serial compile-on-first-call chain
    try:
        warm_fids = list(range(min(net.cfg.batch_size, dataset.frame_num)))
        t0 = time.time()
        net.warm_start(dataset.get_batch(warm_fids), warm_fids, ratio, key)
        print(f"[train] warm_start compiles in {time.time()-t0:.1f}s")
    except Exception as e:    # advisory — training works without it
        print(f"[train] warm_start skipped: {e}")

    for epoch in range(start_epoch, nepochs):
        # hierarchy promotions
        for phase in ("medium", "fine"):
            se = conf.get_int(f"train.{phase}.start_epoch", -1)
            if se >= 0 and epoch == se:
                net.conf.set_loss_block(conf.get_config(f"loss_{phase}"))
                net.cfg.point_radius = conf.get_float(f"train.{phase}.point_render.radius")
                net.cfg.remesh_intersect = conf.get_int(f"train.{phase}.point_render.remesh_intersect")
                net.cfg.batch_size = conf.get_int(f"train.{phase}.point_render.batch_size")
                sampler.bs = net.cfg.batch_size
                net.isfine = phase == "fine"
                net.on_phase_change()
                net.mesh = None  # force remesh at the new resolution
                net.save_checkpoint(osp.join(save_root, f"{phase}_promote.ckpt"), epoch)
                print(f"[train] enabled {phase} hierarchy")

        lr_scale = factor ** sum(1 for m in milestones if epoch >= int(m))
        net.set_lr_scale(lr_scale)

        for fids in sampler:
            batch = dataset.get_batch(fids)
            ratio["deformerRatio"] = net.opt_times / 2500.0 + 0.5
            key, sub = jrandom.split(key)
            t0 = time.time()
            loss, info = net.train_step(batch, fids, ratio, sub)
            steps += 1
            if visualizer is not None:
                scalars = {k: v for k, v in info.items()
                           if isinstance(v, (int, float))}
                scalars["loss"] = float(loss)
                scalars["lr_scale"] = lr_scale
                visualizer.add_scalars(scalars, steps)
            remeshed = info.get("t_remesh", 0.0) > 0.5
            if args.save_debug and remeshed:
                from recmv_tpu.utils.debug_vis import save_debug, turntable_curve_mesh

                dbg = osp.join(save_root, "debug")
                save_debug(net, batch, fids, ratio, dbg, step=steps,
                           visualizer=visualizer)
                turntable_curve_mesh(net, ratio, dbg, step=steps,
                                     visualizer=visualizer)
            elif visualizer is not None and remeshed and steps > 1:
                from recmv_tpu.utils.debug_vis import turntable_curve_mesh

                turntable_curve_mesh(net, ratio, osp.join(save_root, "logs"),
                                     step=steps, visualizer=visualizer,
                                     save_meshes=False)
            msg = " ".join(f"{k}={v:.4f}" for k, v in sorted(info.items())
                           if isinstance(v, float))
            print(f"[{garment_type}] ep{epoch} step{steps} loss={loss:.5f} "
                  f"({time.time()-t0:.1f}s) {msg}")
            nans = [k for k, v in info.items()
                    if isinstance(v, float) and not np.isfinite(v)]
            if nans:
                print(f"[train] WARNING non-finite terms: {nans}")
            if args.max_steps and steps >= args.max_steps:
                net.save_checkpoint(ckpt_latest, epoch)
                print(f"[train] reached max steps; total {time.time()-t_start:.1f}s")
                return net
        net.save_checkpoint(ckpt_latest, epoch)
    print(f"[train] done in {time.time()-t_start:.1f}s")
    return net


if __name__ == "__main__":
    main()
