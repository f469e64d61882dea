#!/usr/bin/env python
"""Serving example: many concurrent real-time streams on one chip.

Simulates N live 10 ms-chunk connections driving a MultiStreamEnhancer pool
and reports steady-state hop latency vs. the real-time budget.

    python examples/serving_pool.py --streams 16 --seconds 2
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="dpdfnet2")
    ap.add_argument("--streams", type=int, default=16)
    ap.add_argument("--seconds", type=float, default=2.0)
    ap.add_argument("--random-weights", action="store_true", default=True)
    ap.add_argument("--mode", default="exact",
                    choices=["exact", "throughput"],
                    help="'exact' = bit-invariant per-frame program; "
                         "'throughput' = time-vectorised (pair with "
                         "--hops-per-call > 1 for peak streams/chip)")
    ap.add_argument("--hops-per-call", type=int, default=1, metavar="H",
                    help="hops of audio buffered per process_many call "
                         "(adds H x 10 ms latency; the throughput mode's "
                         "capacity lever)")
    args = ap.parse_args()

    from dpdfnet_tpu.config import get_config
    from dpdfnet_tpu.models.params import init_params
    from dpdfnet_tpu.runtime.engine import Engine
    from dpdfnet_tpu.serving import MultiStreamEnhancer

    cfg = get_config(args.model)
    engine = Engine(cfg, init_params(cfg, seed=0))
    pool = MultiStreamEnhancer(capacity=args.streams, engine=engine,
                               mode=args.mode)
    sids = [pool.open() for _ in range(args.streams)]

    sr, hop = cfg.sample_rate, cfg.hop
    h = max(1, args.hops_per_call)
    rng = np.random.default_rng(0)
    n_hops = int(args.seconds * sr / hop) // h
    budget_ms = 1000.0 * hop * h / sr

    lat = []
    for k in range(n_hops):
        chunks = {sid: (0.1 * rng.normal(size=hop * h)).astype(np.float32)
                  for sid in sids}
        t0 = time.perf_counter()
        outs = pool.process_many(chunks)
        lat.append((time.perf_counter() - t0) * 1e3)
    for sid in sids:
        pool.flush(sid)
        pool.close(sid)
    lat = np.asarray(lat[2:])                        # skip warmup hops
    print(f"{args.streams} streams: hop latency p50 {np.median(lat):.2f} ms "
          f"p99 {np.quantile(lat, 0.99):.2f} ms (budget {budget_ms:.1f} ms)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
