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
    args = ap.parse_args(argv)

    import cv2
    import h5py

    os.makedirs(osp.join(args.out, "imgs"), exist_ok=True)
    os.makedirs(osp.join(args.out, "masks"), exist_ok=True)

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
            cv2.imwrite(osp.join(args.out, "imgs", f"{fid}.png"), frame)
            fid += 1
        cap.release()
        n_frames = fid
    else:
        raise FileNotFoundError("no video found in snapshot root")

    with h5py.File(osp.join(args.snapshot_root, "masks.hdf5"), "r") as f:
        masks = np.asarray(f["masks"])
    for i in range(min(len(masks), n_frames)):
        cv2.imwrite(osp.join(args.out, "masks", f"{i}.png"),
                    (masks[i] > 0).astype(np.uint8) * 255)

    with h5py.File(osp.join(args.snapshot_root, "reconstructed_poses.hdf5"), "r") as f:
        poses = np.asarray(f["pose"]).reshape(-1, 24, 3)
        trans = np.asarray(f["trans"]).reshape(-1, 3)
        betas = np.asarray(f["betas"]).reshape(-1)[:10]
    np.savez(osp.join(args.out, "smpl_rec.npz"), poses=poses[:n_frames],
             trans=trans[:n_frames], shape=betas, gender=args.gender)

    with open(osp.join(args.snapshot_root, "camera.pkl"), "rb") as f:
        cam = pickle.load(f, encoding="latin1")
    K = np.asarray(cam["camera_k"]) if "camera_k" in cam else np.asarray(cam["K"])
    np.savez(osp.join(args.out, "camera.npz"),
             fx=np.float32(K[0, 0]), fy=np.float32(K[1, 1]),
             cx=np.float32(K[0, 2]), cy=np.float32(K[1, 2]),
             quat=np.asarray([0, 0, 1, 0], np.float32),
             T=np.asarray(cam.get("camera_t", [0, 0, 2.5]), np.float32))
    print(f"[people_snapshot_process] wrote {n_frames} frames to {args.out}")


if __name__ == "__main__":
    main()
