#!/usr/bin/env python
"""PeopleSnapshot preprocessing — reference
``preprocess/people_snapshot_process.py`` parity: unpack the public
PeopleSnapshot release (masks.hdf5, reconstructed_poses.hdf5, camera.pkl,
video frames) into the scene layout the framework consumes
(imgs/, masks/, smpl_rec.npz, camera.npz)."""

from __future__ import annotations

import argparse
import os
import os.path as osp
import pickle

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--snapshot-root", required=True,
                    help="PeopleSnapshot subject dir (contains masks.hdf5 ...)")
    ap.add_argument("--out", required=True, help="output scene dir")
    ap.add_argument("--gender", default="female")
    ap.add_argument("--sid", type=int, default=0,
                    help="start frame offset (A-pose female releases drop "
                         "warm-up frames — tools/people_aposefemale_process.py "
                         "parity)")
    args = ap.parse_args(argv)

    import glob

    import cv2
    import h5py

    os.makedirs(osp.join(args.out, "imgs"), exist_ok=True)
    os.makedirs(osp.join(args.out, "masks"), exist_ok=True)
    sid = args.sid

    # frames: either a video file or an imgs dir in the release
    video = None
    for cand in os.listdir(args.snapshot_root):
        if cand.endswith((".mp4", ".avi")):
            video = osp.join(args.snapshot_root, cand)
    if video:
        cap = cv2.VideoCapture(video)
        fid = 0
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            if fid >= sid:
                cv2.imwrite(osp.join(args.out, "imgs", f"{fid - sid}.png"),
                            frame)
            fid += 1
        cap.release()
        n_frames = fid - sid
    else:
        frames = (sorted(glob.glob(osp.join(args.snapshot_root, "imgs", "*.jpg")))
                  or sorted(glob.glob(osp.join(args.snapshot_root, "imgs", "*.png"))))
        if not frames:
            raise FileNotFoundError("no video or imgs/ found in snapshot root")
        for i, src in enumerate(frames[sid:]):
            cv2.imwrite(osp.join(args.out, "imgs", f"{i}.png"),
                        cv2.imread(src))
        n_frames = len(frames) - sid

    with h5py.File(osp.join(args.snapshot_root, "masks.hdf5"), "r") as f:
        masks = np.asarray(f["masks"])[sid:]
    for i in range(min(len(masks), n_frames)):
        cv2.imwrite(osp.join(args.out, "masks", f"{i}.png"),
                    (masks[i] > 0).astype(np.uint8) * 255)

    with h5py.File(osp.join(args.snapshot_root, "reconstructed_poses.hdf5"), "r") as f:
        poses = np.asarray(f["pose"]).reshape(-1, 24, 3)[sid:]
        trans = np.asarray(f["trans"]).reshape(-1, 3)[sid:]
        betas = np.asarray(f["betas"]).reshape(-1)[:10]
    np.savez(osp.join(args.out, "smpl_rec.npz"), poses=poses[:n_frames],
             trans=trans[:n_frames], shape=betas, gender=args.gender)

    with open(osp.join(args.snapshot_root, "camera.pkl"), "rb") as f:
        cam = pickle.load(f, encoding="latin1")
    if "camera_f" in cam:       # PeopleSnapshot pkl layout
        fx, fy = np.asarray(cam["camera_f"], np.float64)
        cx, cy = np.asarray(cam["camera_c"], np.float64)
    else:
        K = np.asarray(cam["camera_k"]) if "camera_k" in cam else np.asarray(cam["K"])
        fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    # the snapshot cameras carry no rotation; the dataset convention is a
    # 180° roll about z (reference people_snapshot_process quat
    # [cos(π/2), 0, 0, sin(π/2)])
    np.savez(osp.join(args.out, "camera.npz"),
             fx=np.float32(fx), fy=np.float32(fy),
             cx=np.float32(cx), cy=np.float32(cy),
             quat=np.asarray([0, 0, 0, 1], np.float32),
             T=np.asarray(cam.get("camera_t", [0, 0, 2.5]), np.float32))
    print(f"[people_snapshot_process] wrote {n_frames} frames to {args.out}")


if __name__ == "__main__":
    main()
