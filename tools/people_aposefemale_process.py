#!/usr/bin/env python
"""A-pose female PeopleSnapshot preprocessing — reference
``tools/people_aposefemale_process.py`` parity: same hdf5/pkl unpack as
the main preprocess script but starting at a ``--sid`` frame offset (the
A-pose female releases prepend warm-up frames that must be dropped) and
defaulting to gender=female.

Delegates to ``preprocess/people_snapshot_process.py`` — the layouts are
identical (reference: the apose tool is a copy of the snapshot one with
the sid offset applied to imgs/masks/poses)."""

from __future__ import annotations

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True,
                    help="A-pose subject dir (imgs/, masks.hdf5, "
                         "reconstructed_poses.hdf5, camera.pkl)")
    ap.add_argument("--save-root", required=True, help="output scene dir")
    ap.add_argument("--sid", type=int, default=0, help="start frame index")
    args = ap.parse_args(argv)

    from preprocess.people_snapshot_process import main as process

    process(["--snapshot-root", args.root, "--out", args.save_root,
             "--gender", "female", "--sid", str(args.sid)])


if __name__ == "__main__":
    main()
