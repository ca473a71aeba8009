#!/usr/bin/env python
"""Large-pose training stage — reference ``train_large_pose.py`` parity:
resume from the self-rotation (A-pose) checkpoint, freeze all SDF
parameters and disable the curve losses, and optimize only the
deformation field / per-frame latents / poses over the full motion range
(reference forces resume from a-pose.pth with start_epoch=60)."""

from __future__ import annotations

import argparse
import os.path as osp
import time


def main(argv=None):
    import train as train_mod

    p = argparse.ArgumentParser(description="REC-MV TPU large-pose stage")
    p.add_argument("--conf", required=True)
    p.add_argument("--data-root", required=True)
    p.add_argument("--save-folder", default="result")
    p.add_argument("--resume", default=None,
                   help="defaults to <save>/latest.ckpt (the a-pose fit)")
    p.add_argument("--quality", default="coarse",
                   choices=["tiny", "small", "coarse", "medium", "fine", "higher"])
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--start-epoch", type=int, default=60)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", default=None, choices=["cpu", "tpu", "axon"])
    args = p.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import numpy as np
    import jax.random as jrandom

    import recmv_tpu  # noqa: F401
    from recmv_tpu.config import ConfigFactory
    from recmv_tpu.config.constants import TEMPLATE_GARMENT
    from recmv_tpu.core.builder import build_opt_net, resolution_pyramids
    from recmv_tpu.data.dataset import get_dataset_and_loader

    conf = ConfigFactory.parse_file(args.conf)
    garment_type = conf.get_string("train.garment_type")
    save_root = osp.join(args.data_root, args.save_folder)
    n_g = len(TEMPLATE_GARMENT[garment_type])
    conds_lens = {
        "deformer": conf.get_int("mlp_deformer.condlen") * (1 + n_g),
        "render": conf.get_int("render_net.condlen"),
    }
    dataset, sampler = get_dataset_and_loader(
        args.data_root, conds_lens,
        conf.get_int("train.coarse.point_render.batch_size"),
        garment_type=garment_type,
        data_type=conf.get_string("train.data_type", "large_pose"),
        a_pose=False, seed=args.seed)

    skinner_res = {"tiny": (17, 25, 9), "small": (65, 113, 33)}.get(
        args.quality, (129, 225, 65))
    net = build_opt_net(conf, dataset, save_root,
                        resolutions=resolution_pyramids(args.quality),
                        skinner_res=skinner_res, seed=args.seed)
    net.large_pose = True
    net._init_global_opt()  # re-derive trainable mask with SDFs frozen

    ckpt = args.resume or osp.join(save_root, "latest.ckpt")
    assert osp.isfile(ckpt), f"large-pose stage requires the a-pose fit: {ckpt}"
    net.load_checkpoint(ckpt)
    net._init_global_opt()

    key = jrandom.PRNGKey(args.seed)
    ratio = {"sdfRatio": 1.0, "deformerRatio": 1.0, "renderRatio": 1.0}
    steps = 0
    t0 = time.time()
    nepochs = conf.get_int("train.nepoch")
    for epoch in range(args.start_epoch, nepochs):
        for fids in sampler:
            batch = dataset.get_batch(fids)
            key, sub = jrandom.split(key)
            loss, info = net.train_step(batch, fids, ratio, sub)
            steps += 1
            print(f"[large-pose] ep{epoch} step{steps} loss={loss:.5f}")
            if args.max_steps and steps >= args.max_steps:
                net.save_checkpoint(osp.join(save_root, "large_pose.ckpt"), epoch)
                return net
        net.save_checkpoint(osp.join(save_root, "large_pose.ckpt"), epoch)
    print(f"[large-pose] done in {time.time()-t0:.1f}s")
    return net


if __name__ == "__main__":
    main()
