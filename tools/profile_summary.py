#!/usr/bin/env python
"""Summarise a jax.profiler trace (xplane.pb) into per-HLO-op device time.

Companion to `dpdfnet-tpu bench --profile DIR`: finds the newest
``*.xplane.pb`` under DIR and prints the top device-time consumers using
xprof's hlo_stats converter — the command-line stand-in for the
tensorboard profile UI (not available in this environment).

Usage:
  python tools/profile_summary.py /tmp/prof [--top 40] [--by category]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def find_xplane(root: str) -> str:
    paths = glob.glob(os.path.join(root, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        raise SystemExit(f"no *.xplane.pb under {root}")
    return max(paths, key=os.path.getmtime)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("profile_dir")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--by", choices=["op", "category"], default="op")
    ap.add_argument("--tool", default="hlo_stats")
    args = ap.parse_args()

    from xprof.convert import raw_to_tool_data as rtd

    path = find_xplane(args.profile_dir)
    print(f"# {path}", file=sys.stderr)
    data, _ = rtd.xspace_to_tool_data([path], args.tool, {})
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    try:
        obj = json.loads(data)
    except Exception:
        print(data[:4000])
        return 0

    # hlo_stats: a gviz-style table {cols: [...], rows: [{c: [{v: ...}]}]}
    cols = [c.get("label") or c.get("id") for c in obj.get("cols", [])]
    rows = [[cell.get("v") if isinstance(cell, dict) else cell
             for cell in r["c"]] for r in obj.get("rows", [])]
    if not rows:
        print(json.dumps(obj)[:4000])
        return 0

    def col(*frags):
        for frag in frags:
            for i, c in enumerate(cols):
                if c and frag.lower() in str(c).lower():
                    return i
        return None

    i_name = col("HLO op name", "op name")
    if i_name is None:
        i_name = 0
    i_cat = col("category")
    # prefer total-time-us, then fall back through time-ish columns
    i_time = col("total time (us)", "total time", "avg. time", "self",
                 "occurrences")
    if i_time is not None and "total" not in str(cols[i_time]).lower():
        print(f"WARNING: no total-time column; aggregating {cols[i_time]!r} "
              "— sums of averages/counts are NOT device time",
              file=sys.stderr)
    if i_time is None:
        print(f"no usable time column in {cols}", file=sys.stderr)
        print(json.dumps(obj)[:4000])
        return 1

    if args.by == "category" and i_cat is None:
        print("WARNING: no category column in this table — grouping by op "
              "name instead", file=sys.stderr)
        args.by = "op"
    key_i = i_cat if (args.by == "category" and i_cat is not None) else i_name
    agg = {}
    for r in rows:
        try:
            t = float(r[i_time] or 0.0)
        except (TypeError, ValueError):
            continue
        k = str(r[key_i])[:110]
        agg[k] = agg.get(k, 0.0) + t
    total = sum(agg.values()) or 1.0
    print(f"{'us_total':>12}  {'%':>6}  {args.by}   (time col: {cols[i_time]!r})")
    for k, v in sorted(agg.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"{v:12.1f}  {100 * v / total:6.2f}  {k}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
