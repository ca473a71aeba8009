#!/usr/bin/env python
"""Novel-pose garment animation — reference ``infer_fl_animation.py``
parity: drive the registered garments with a SNUG-style motion sequence
using averaged latent codes."""

from __future__ import annotations

import argparse
import os.path as osp


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data-root", required=True)
    p.add_argument("--save-folder", default="result")
    p.add_argument("--motion", required=True, help="npz with pose (T,72) [+trans, shape]")
    p.add_argument("--out", default=None)
    p.add_argument("--platform", default=None, choices=["cpu", "tpu", "axon"])
    p.add_argument("--quality", default="coarse",
                   choices=["small", "coarse", "medium", "fine", "higher"])
    args = p.parse_args(argv)

    import numpy as np

    from infer_fl import load_net
    from recmv_tpu.core.inference import GarmentInference
    from recmv_tpu.data.dataset import SnugAnimationDataset

    class _A:
        pass

    la = _A()
    la.__dict__.update(vars(args))
    la.conf = None
    la.ckpt = None
    la.frames = None
    la.curves_only = False
    net, dataset, save_root = load_net(la)

    motion = SnugAnimationDataset(args.motion, shape=dataset.params.shape)
    mean_trans = dataset.params.trans.mean(0, keepdims=True)
    trans = motion.trans + mean_trans  # reference: mean scene translation
    out = args.out or osp.join(save_root, "animation")
    inf = GarmentInference(net)
    ratio = {"sdfRatio": 1.0, "deformerRatio": 1.0, "renderRatio": 1.0}
    inf.infer_garment_animation(motion.poses, trans, ratio, out)
    print(f"[animate] wrote {motion.frame_num} frames under {out}")


if __name__ == "__main__":
    main()
