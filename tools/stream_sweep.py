#!/usr/bin/env python
"""Sweep streaming/serving bench configurations (streams, mode, cadence).

Companion to tools/bench_sweep.py for the streaming path.  Each point
compiles a fresh XLA program (~minutes on the remote-compile relay), so
keep sweeps short and run them serialized (any concurrent python on a
1-CPU host corrupts wall-clock timings).

Usage:
  python tools/stream_sweep.py --model dpdfnet8_48khz_hr \
      --points exact:s64:fast exact:s128:turbo thr:s256:h4:turbo \
               exact:s128:turbo:tm0

Point grammar: <mode>:s<streams>[:h<hops_per_call>]:<tier>[:tm0|:tm1]
  mode  = exact | thr (throughput)
  tm0/tm1 = force DPDFNET_TPU_INTRA_TM off/on for this point (default:
            leave the env as-is; knobs are read at trace time)

Prints one JSON line per point (the run_stream_bench result + point tag).
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
    ap.add_argument("--points", nargs="+", required=True)
    ap.add_argument("--seconds", type=float, default=2.0)
    args = ap.parse_args()

    from dpdfnet_tpu.runtime.bench import run_stream_bench

    for point in args.points:
        mode = "exact"
        streams = 64
        hops = 0
        tier = "fast"
        tm = None
        for tok in point.split(":"):
            if tok in ("exact", "thr", "throughput"):
                mode = "throughput" if tok != "exact" else "exact"
            elif tok.startswith("s") and tok[1:].isdigit():
                streams = int(tok[1:])
            elif tok.startswith("h") and tok[1:].isdigit():
                hops = int(tok[1:])
            elif tok in ("tm0", "tm1"):
                tm = tok[-1]
            else:
                tier = tok
        if tm is not None:
            os.environ["DPDFNET_TPU_INTRA_TM"] = tm
        else:
            os.environ.pop("DPDFNET_TPU_INTRA_TM", None)
        result = json.loads(run_stream_bench(
            model=args.model, streams=streams, seconds=args.seconds,
            precision=tier, mode=mode, hops_per_call=hops))
        result["point"] = point
        print(json.dumps(result), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
