#!/usr/bin/env python
"""Capture a jax profiler trace of the streaming program (exact or
throughput mode) and summarise it with tools/profile_summary.py.

Companion to `dpdfnet-tpu bench --profile` (which traces the offline
path): this traces the serving-side per-hop program whose fixed work
bounds exact-mode capacity.

Usage:
  python tools/stream_profile.py [--model dpdfnet8_48khz_hr]
      [--streams 512] [--tier turbo] [--mode exact] [--hops 64]
      [--out /tmp/prof_stream]

Then: python tools/profile_summary.py /tmp/prof_stream --by category
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="dpdfnet8_48khz_hr")
    ap.add_argument("--streams", type=int, default=512)
    ap.add_argument("--tier", default="turbo")
    ap.add_argument("--mode", default="exact", choices=["exact", "throughput"])
    ap.add_argument("--hops", type=int, default=64,
                    help="hops per dispatch in the traced program")
    ap.add_argument("--out", default="/tmp/prof_stream")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dpdfnet_tpu.config import get_config
    from dpdfnet_tpu.models.params import init_params
    from dpdfnet_tpu.runtime.engine import engine_from_quality

    cfg = get_config(args.model)
    engine = engine_from_quality(cfg, init_params(cfg, seed=0),
                                 quality=args.tier)
    st = engine.init_stream_state(batch=args.streams)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.normal(size=(args.streams, args.hops, cfg.win_len))
        .astype(np.float32) * 0.05)
    make_fn = (engine._stream_vec_fn if args.mode == "throughput"
               else engine._stream_fn)
    run = make_fn(args.streams, args.hops)
    y, st = run(engine.params, frames, st)
    float(jnp.sum(y))                                  # compile + warm
    t0 = time.perf_counter()
    y, st = run(engine.params, frames, st)
    float(jnp.sum(y))
    per_hop = (time.perf_counter() - t0) / args.hops * 1e3
    print(f"warm: {per_hop:.3f} ms/hop", file=sys.stderr)

    os.makedirs(args.out, exist_ok=True)
    with jax.profiler.trace(args.out):
        y, st = run(engine.params, frames, st)
        float(jnp.sum(y))
    print(f"trace written to {args.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
