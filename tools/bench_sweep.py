#!/usr/bin/env python
"""Sweep offline-bench configurations (batch, segment length, precision).

Each point compiles a fresh XLA program (~minutes on the remote-compile
relay), so keep sweeps short.  Usage:

  python tools/bench_sweep.py --model dpdfnet8_48khz_hr \
      --points b32:s128 b64:s128 b32:s256 [--precision default|turbo]

Prints one JSON line per point.  The measurement itself is
``runtime.bench.run_bench`` — the SAME harness as ``python bench.py``
(tier resolution, checksum sync, median timing), so sweep numbers are
directly comparable to committed bench numbers.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="dpdfnet8_48khz_hr")
    ap.add_argument("--points", nargs="+", default=["b32:s128"])
    ap.add_argument("--precision", default="default",
                    help="matmul precision, or a quality-tier name "
                         "(highest/high/fast/turbo)")
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    from dpdfnet_tpu.runtime.bench import run_bench

    for point in args.points:
        B = seg = None
        for tok in point.split(":"):
            if tok.startswith("b"):
                B = int(tok[1:])
            elif tok.startswith("s"):
                seg = int(tok[1:])
        assert B and seg, point
        result = json.loads(run_bench(
            model=args.model, batch=B, seconds=args.seconds, reps=args.reps,
            random_weights=True, precision=args.precision, seg_frames=seg))
        print(json.dumps({
            "point": point, "model": args.model,
            "precision": args.precision,
            "xrt": result["value"],
        }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
