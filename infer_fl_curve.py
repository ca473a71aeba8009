#!/usr/bin/env python
"""Per-frame feature-curve tube meshes — reference ``infer_fl_curve.py``
parity (delegates to infer_fl.py --curves-only)."""

import sys

from infer_fl import main, parse_args

if __name__ == "__main__":
    main(sys.argv[1:] + ["--curves-only"])
