#!/usr/bin/env python
"""KNN-propagate ATR parsing labels into matting masks — reference
``preprocess/mask2parsing_mask.py`` parity: for every frame, label each
foreground-mask pixel with its nearest nonzero parsing label and cache
``mask_parsing_<frame>.npy`` (consumed by the dataset)."""

from __future__ import annotations

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--garment-type", required=True)
    args = ap.parse_args(argv)

    from recmv_tpu.data.dataset import SceneDataset

    ds = SceneDataset(args.data_root, {}, garment_type=args.garment_type)
    for i in range(ds.frame_num):
        out = ds.parsing_mask(i)
        print(f"[{i+1}/{ds.frame_num}] {out}")


if __name__ == "__main__":
    main()
