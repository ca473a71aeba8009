#!/usr/bin/env python
"""Large-pose stage benchmark (BASELINE config #4).

Runs the REAL large-pose train_step (frozen SDFs, zeroed curve branch —
reference ``train_large_pose.py`` / OptimGarmentNetwork_Large_Pose) at
production scale on a synthetic large-pose scene: an 8-frame 1080p
sequence whose first half carries feature-line annotations (the A-pose
sub-range) and whose TCMR pkl provides poses/betas for the large-motion
remainder. Stage 1 (a-pose fit, a few steps for a valid checkpoint) is
cached; the timed region is the large-pose stage on the large-motion
frames.

Writes ``bench_largepose.json`` (embedded by ``bench.py``).

Usage:
  python tools/bench_largepose.py --platform axon --steps 6
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import sys
import time

import numpy as np

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)


def _make_large_pose_scene(scene, image, frames, annotated):
    """Synthetic scene + large-pose side data (partial fl jsons + TCMR)."""
    import joblib
    import jax.numpy as jnp

    from recmv_tpu.data.synthetic import ensure_scene
    from recmv_tpu.models import camera as cam_mod
    from recmv_tpu.models.smpl import get_smpl, smpl_forward

    fresh = not osp.isfile(osp.join(scene, "scene_meta.json"))
    ensure_scene(scene, n_frames=frames, image_size=image,
                 skinner_res=(49, 81, 25), raster_cap=2048)
    pkl = osp.join(scene, "synthetic-tube_tcmr_output.pkl")
    if not fresh and osp.isfile(pkl):
        return
    for fid in range(annotated, frames):
        p = osp.join(scene, "featurelines", f"{fid}.json")
        if osp.isfile(p):
            os.remove(p)
    data = np.load(osp.join(scene, "smpl_rec.npz"), allow_pickle=True)
    poses = data["poses"].reshape(frames, 24, 3).astype(np.float32)
    trans = data["trans"].reshape(frames, 3).astype(np.float32)
    model = get_smpl("synthetic")
    _, joints, _ = smpl_forward(model, jnp.zeros(10), jnp.asarray(poses))
    cam = np.load(osp.join(scene, "camera.npz"))
    camera = cam_mod.make_camera({
        "focal_length": np.asarray([cam["fx"], cam["fy"]]),
        "princeple_points": np.asarray([cam["cx"], cam["cy"]]),
        "cam2world_coord_quat": cam["quat"],
        "world2cam_coord_trans": cam["T"]}, (image, image))
    scr = np.asarray(cam_mod.transform_points_screen(
        camera, joints + jnp.asarray(trans)[:, None, :]))[..., :2]
    gt_j = np.concatenate([scr, np.ones(scr.shape[:-1] + (1,), np.float32)], -1)
    joblib.dump({1: {"frame_ids": np.arange(frames), "gt_joints2d": gt_j,
                     "pose": poses.reshape(frames, 72),
                     "betas": np.zeros((frames, 10), np.float32)}}, pkl)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu", "axon"])
    ap.add_argument("--image", type=int, default=1080)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--annotated", type=int, default=4)
    ap.add_argument("--quality", default="fine")
    ap.add_argument("--sample-pix", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--init-epochs", type=int, default=40)
    ap.add_argument("--scene", default="/tmp/recmv_lp_bench_scene")
    ap.add_argument("--out", default=osp.join(REPO, "bench_largepose.json"))
    ap.add_argument("--cache-dir", default="/tmp/recmv_jax_cache")
    ap.add_argument("--exec-cache", default="/tmp/recmv_exec_cache")
    args = ap.parse_args(argv)
    if args.exec_cache:
        os.environ.setdefault("RECMV_EXEC_CACHE", args.exec_cache)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.cache_dir:
        os.makedirs(args.cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", args.cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import recmv_tpu  # noqa: F401
    from recmv_tpu.config import ConfigFactory
    from recmv_tpu.core.builder import build_opt_net, resolution_pyramids
    from recmv_tpu.core.network import TrainConfig
    from recmv_tpu.data.dataset import LargePoseDataset

    dev = jax.devices()[0]
    scene = f"{args.scene}_{args.image}_{args.frames}"
    t0 = time.time()
    _make_large_pose_scene(scene, args.image, args.frames, args.annotated)
    if time.time() - t0 > 5:
        print(f"[bench-lp] scene in {time.time()-t0:.1f}s", flush=True)

    conf = ConfigFactory.parse_file(
        osp.join(REPO, "configs", "synthetic", "smoke.conf"))
    dataset = LargePoseDataset(scene, {"deformer": 256, "render": 256},
                               garment_type="synthetic-tube", a_pose=False)
    assert dataset.start_idx == args.annotated
    resolutions = resolution_pyramids(args.quality)
    Wg, Hg, Dg = resolutions[-1]
    cfg = TrainConfig(
        sample_pix=args.sample_pix, point_radius=0.0041,
        remesh_intersect=120, batch_size=args.batch,
        image_size=(args.image, args.image),
        mask_render_downscale=2 if args.image >= 720 else 1,
    )
    max_face = max(Wg * Hg, Wg * Dg, Hg * Dg)
    cfg.mc_capacity_v = 1 << int(np.ceil(np.log2(8 * max_face)))
    cfg.mc_capacity_f = 2 * cfg.mc_capacity_v

    t0 = time.time()
    net = build_opt_net(conf, dataset, osp.join(scene, "result"),
                        resolutions=resolutions,
                        skinner_res=(129, 225, 65), train_cfg=cfg)
    t_build = time.time() - t0
    # stage 1 stand-in: IGR init gives a valid SDF/curve state to freeze
    init_ckpt = osp.join(scene, "result", "bench_init.ckpt")
    t0 = time.time()
    if osp.isfile(init_ckpt):
        net.load_checkpoint(init_ckpt)
    else:
        net.initialize_tmp_sdf(nepochs=args.init_epochs, save_dir=None,
                               fl_iters=10)
        net.save_checkpoint(init_ckpt, 0)
    t_init = time.time() - t0
    print(f"[bench-lp] build {t_build:.1f}s init {t_init:.1f}s", flush=True)

    # large-pose stage: frozen SDFs, zeroed curve branch
    net.large_pose = True
    net._init_global_opt()

    ratio = {"sdfRatio": 1.0, "deformerRatio": 1.0, "renderRatio": 1.0}
    key = jax.random.PRNGKey(0)
    fids = list(range(args.batch))
    batch = dataset.get_batch(fids)

    t0 = time.time()
    try:
        net.warm_start(batch, fids, ratio, key)
    except Exception as e:
        print(f"[bench-lp] warm_start skipped: {e}", flush=True)
    warm_start_s = time.time() - t0
    print(f"[bench-lp] warm_start {warm_start_s:.1f}s", flush=True)

    t0 = time.time()
    loss, info = net.train_step(batch, fids, ratio, key)
    first_step = time.time() - t0
    print(f"[bench-lp] first step {first_step:.1f}s loss={loss:.4f}", flush=True)

    import jax.random as jr

    per_step, finite = [], True
    sdf0 = jax.tree_util.tree_map(np.asarray, net.params["garment_sdfs"])
    for s in range(args.steps):
        key, sub = jr.split(key)
        fl = [(s + k) % dataset.frame_num for k in range(args.batch)]
        b = dataset.get_batch(fl)
        t0 = time.time()
        loss, info = net.train_step(b, fl, ratio, sub)
        per_step.append(round(time.time() - t0, 3))
        finite &= bool(np.isfinite(loss))
        print(f"[bench-lp] step {s}: {per_step[-1]:.2f}s loss={loss:.4f}",
              flush=True)
    # frozen-SDF invariant: the large-pose stage must not move SDF params
    sdf1 = jax.tree_util.tree_map(np.asarray, net.params["garment_sdfs"])
    deltas = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(a - b).max()), sdf0, sdf1)
    sdf_moved = max(jax.tree_util.tree_leaves(deltas) or [0.0])

    out = {
        "config": {"image": args.image, "frames": args.frames,
                   "annotated": args.annotated, "batch": args.batch,
                   "pyramid": list(resolutions[-1]), "quality": args.quality,
                   "steps": args.steps},
        "device": str(dev), "platform": dev.platform,
        "large_motion_frames": dataset.frame_num,
        "start_idx": dataset.start_idx,
        "warm_start_s": round(warm_start_s, 1),
        "first_step_s": round(first_step, 2),
        "sec_per_step": round(float(np.mean(per_step)), 3),
        "per_step_s": per_step,
        "all_finite": finite,
        "sdf_max_abs_delta": sdf_moved,
        "measured_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
