#!/usr/bin/env python
"""Summarize a jax.profiler xplane trace into a per-op time table.

Feeds the raw ``*.xplane.pb`` capture from ``bench_fullstep.py
--trace-dir`` through tensorboard-plugin-profile's converters and
prints the top self-time HLO ops — the ground-truth breakdown for
deciding which kernels to optimize (VERDICT r2 weak #2/#6: the phase
walls don't say WHICH ops inside the fused step executable burn the
time).

Usage:
  python tools/trace_report.py /tmp/recmv_trace [--top 40]
"""

from __future__ import annotations

import argparse
import glob
import json
import os.path as osp
import sys


def find_xplanes(root):
    hits = sorted(glob.glob(osp.join(root, "**", "*.xplane.pb"),
                            recursive=True))
    if not hits:
        sys.exit(f"no *.xplane.pb under {root}")
    return hits


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--tool", default="framework_op_stats",
                    help="plugin tool: framework_op_stats | op_profile | "
                         "kernel_stats | overview_page")
    ap.add_argument("--json-out", default="")
    args = ap.parse_args(argv)

    from tensorboard_plugin_profile.convert import raw_to_tool_data

    paths = find_xplanes(args.trace_dir)
    # plugin 2.13 names xplane-based tools with a '^' suffix; older/newer
    # accept the bare name — try both.
    # only fall back to tensorflow_stats when the user asked for the
    # default tool; a explicitly requested tool must not silently yield a
    # different tool's table
    candidates = [args.tool, args.tool + "^"]
    if args.tool == "framework_op_stats":
        candidates += ["tensorflow_stats", "tensorflow_stats^"]
    data = None
    used_tool = None
    last_err = None
    for tool in candidates:
        try:
            out = raw_to_tool_data.xspace_to_tool_data(paths, tool, {})
            got = out[0] if isinstance(out, tuple) else out
            if got:  # empty output counts as failure
                data, used_tool = got, tool
                break
        except Exception as e:  # noqa: BLE001 — tool probing
            last_err = e
    if not data:
        sys.exit(f"converter produced no data for {candidates}: {last_err}")
    if used_tool.rstrip("^") != args.tool:
        print(f"[trace_report] note: '{args.tool}' failed; showing "
              f"'{used_tool}' instead", file=sys.stderr)

    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    if args.json_out:
        with open(args.json_out, "w") as fh:
            fh.write(data if isinstance(data, str) else json.dumps(data))
        print(f"wrote {args.json_out}")

    # tensorflow_stats/framework_op_stats come back as gviz DataTable
    # JSON — render the interesting columns.
    try:
        tables = json.loads(data)
    except Exception:
        print(data[:4000])
        return
    if isinstance(tables, dict):
        tables = [tables]
    for tbl in tables:
        cols = [c.get("label", c.get("id", "?")) for c in tbl.get("cols", [])]
        rows = tbl.get("rows", [])
        if not rows:
            continue
        want = [i for i, c in enumerate(cols)
                if any(k in c.lower() for k in
                       ("type", "operation", "occurrence", "total self",
                        "avg. self", "self time", "rank", "flop", "memory bw",
                        "bound"))]
        if not want:
            want = list(range(min(8, len(cols))))
        print(" | ".join(cols[i] for i in want))
        for r in rows[: args.top]:
            # gviz rows may omit trailing cells
            cs = r.get("c", [])
            cells = [str(cs[i].get("v", "")
                         if i < len(cs) and cs[i] else "") for i in want]
            print(" | ".join(cells))
        print("-" * 72)


if __name__ == "__main__":
    main()
