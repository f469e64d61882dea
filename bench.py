#!/usr/bin/env python
"""Driver benchmark entry point.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Measures batched offline enhancement throughput (xRT per chip) for the
flagship dpdfnet8_48khz_hr configuration with random weights (checkpoints
are not downloadable in the bench environment; throughput is
weight-value-independent).  Baseline = the 500x real-time per chip target
from BASELINE.md.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dpdfnet_tpu.runtime.bench import run_bench  # noqa: E402


def main() -> int:
    model = os.environ.get("BENCH_MODEL", "dpdfnet8_48khz_hr")
    # b256 x 10 s is the measured throughput sweet spot on one v5e
    # (1530 xRT vs 1325 b128 / 1211 b320 (HBM pressure); reproducible
    # to +-0.1%).  Larger segments (256 frames) OOM HBM at this batch.
    batch = int(os.environ.get("BENCH_BATCH", "256"))
    seconds = float(os.environ.get("BENCH_SECONDS", "10"))
    reps = int(os.environ.get("BENCH_REPS", "5"))
    precision = os.environ.get("BENCH_PRECISION", "default")
    print(run_bench(model=model, batch=batch, seconds=seconds, reps=reps,
                    random_weights=True, precision=precision))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
