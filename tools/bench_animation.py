#!/usr/bin/env python
"""Novel-pose animation extraction benchmark (BASELINE config #5:
``infer_fl_animation`` extraction at the 513³ ``higher`` grid).

Times the two halves of the animation pipeline on the cached production
bench scene (/tmp/recmv_bench_scene_1080_4 + its IGR init):

1. **513³ extraction**: seg3d-on-device + native host marching cubes
   (``net.marching_cube_update_host`` — the path ``infer_fl.py
   --quality higher`` takes, reference train.py:47-79 grid tables).
2. **Animation drive**: registration (Laplacian curve alignment + NRICP,
   once) then per-frame posing of the registered garment over a
   synthetic novel-pose motion (``infer_garment_animation`` parity,
   reference OptimGarmentNetwork.py:2729-2860) — reported as frames/s.

Writes ``bench_animation.json`` (embedded by ``bench.py``).

Usage:
  python tools/bench_animation.py --platform axon --motion-frames 32
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


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu", "axon"])
    ap.add_argument("--image", type=int, default=1080)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--quality", default="higher",
                    help="extraction pyramid (higher = 513^3)")
    ap.add_argument("--motion-frames", type=int, default=32)
    ap.add_argument("--init-epochs", type=int, default=40)
    ap.add_argument("--scene", default="/tmp/recmv_bench_scene")
    ap.add_argument("--out", default=osp.join(REPO, "bench_animation.json"))
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
    from recmv_tpu.core.inference import GarmentInference
    from recmv_tpu.core.network import TrainConfig
    from recmv_tpu.data.dataset import get_dataset_and_loader
    from recmv_tpu.data.synthetic import ensure_scene

    dev = jax.devices()[0]
    scene = f"{args.scene}_{args.image}_{args.frames}"
    ensure_scene(scene, n_frames=args.frames, image_size=args.image,
                 skinner_res=(49, 81, 25), raster_cap=2048)

    conf = ConfigFactory.parse_file(
        osp.join(REPO, "configs", "synthetic", "smoke.conf"))
    dataset, _ = get_dataset_and_loader(
        scene, {"deformer": 256, "render": 256}, 1, shuffle=False,
        garment_type="synthetic-tube", data_type="synthe")
    resolutions = resolution_pyramids(args.quality)
    Wg, Hg, Dg = resolutions[-1]
    cfg = TrainConfig(sample_pix=2048, point_radius=0.0041,
                      remesh_intersect=120, batch_size=1,
                      image_size=(args.image, args.image))
    # device MC caps stay at the fine-grid sizing; the 513^3 extraction
    # itself routes through the native host MC (unbounded)
    max_face = max(Wg * Hg, Wg * Dg, Hg * Dg)
    cfg.mc_capacity_v = min(1 << 17, 1 << int(np.ceil(np.log2(8 * max_face))))
    cfg.mc_capacity_f = 2 * cfg.mc_capacity_v

    t0 = time.time()
    net = build_opt_net(conf, dataset, osp.join(scene, "result"),
                        resolutions=resolutions,
                        skinner_res=(129, 225, 65), train_cfg=cfg)
    t_build = time.time() - t0
    init_ckpt = osp.join(scene, "result", "bench_init.ckpt")
    t0 = time.time()
    if osp.isfile(init_ckpt):
        net.load_checkpoint(init_ckpt)
    else:
        net.initialize_tmp_sdf(nepochs=args.init_epochs, save_dir=None,
                               fl_iters=10)
        net.save_checkpoint(init_ckpt, 0)
    t_init = time.time() - t0
    print(f"[bench-anim] build {t_build:.1f}s init {t_init:.1f}s", flush=True)

    ratio = {"sdfRatio": 1.0, "deformerRatio": 1.0, "renderRatio": 1.0}

    # -- 513^3 extraction (cold incl. seg3d compile, then warm) --------
    t0 = time.time()
    net.marching_cube_update_host(ratio)
    extract_cold_s = time.time() - t0
    nv = [int(n) for n in np.asarray(net.mesh.garment_n)]
    t0 = time.time()
    net.marching_cube_update_host(ratio)
    extract_warm_s = time.time() - t0
    grid = resolutions[-1]
    print(f"[bench-anim] extract {grid}: cold {extract_cold_s:.1f}s "
          f"warm {extract_warm_s:.1f}s nv={nv}", flush=True)

    # -- registration + animation drive --------------------------------
    out_dir = osp.join(scene, "result", "bench_anim")
    inf = GarmentInference(net)
    t0 = time.time()
    inf.ensure_registration(ratio, out_dir)
    register_s = time.time() - t0
    reg_nv = {g: int(len(v)) for g, (v, _) in inf.registered.items()}

    # synthetic novel motion: lerp between the scene's yaw poses with a
    # side-sway so every frame is a pose the fit never saw
    base = dataset.params.poses.reshape(-1, 24, 3)
    T = args.motion_frames
    tt = np.linspace(0, 1, T, dtype=np.float32)[:, None, None]
    poses = base[0] * (1 - tt) + base[-1] * tt
    poses[:, 1, 2] += 0.2 * np.sin(np.linspace(0, 2 * np.pi, T, dtype=np.float32))
    trans = np.tile(dataset.params.trans.mean(0), (T, 1))

    t0 = time.time()
    inf.infer_garment_animation(poses.reshape(T, 72), trans, ratio, out_dir)
    anim_s = time.time() - t0
    n_objs = len([f for f in os.listdir(out_dir) if f.endswith(".obj")])
    print(f"[bench-anim] {T} frames in {anim_s:.1f}s "
          f"({T / anim_s:.2f} frames/s), {n_objs} objs", flush=True)

    out = {
        "config": {"image": args.image, "frames": args.frames,
                   "quality": args.quality, "grid": list(grid),
                   "motion_frames": T},
        "device": str(dev), "platform": dev.platform,
        "extract_cold_s": round(extract_cold_s, 2),
        "extract_warm_s": round(extract_warm_s, 2),
        "extract_verts": nv,
        "register_s": round(register_s, 2),
        "registered_verts": reg_nv,
        "animation_s": round(anim_s, 2),
        "animation_frames_per_s": round(T / anim_s, 3),
        "measured_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
