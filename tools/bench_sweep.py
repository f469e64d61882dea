#!/usr/bin/env python
"""Sweep offline-bench configurations (batch, segment length, precision).

Each point compiles a fresh XLA program (~minutes on the remote-compile
relay), so keep sweeps short.  Usage:

  python tools/bench_sweep.py --model dpdfnet8_48khz_hr \
      --points b32:s128 b64:s128 b32:s256 [--precision default]

Prints one JSON line per point.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


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

    import jax
    import jax.numpy as jnp

    from dpdfnet_tpu.config import get_config
    from dpdfnet_tpu.models.params import init_params
    from dpdfnet_tpu.runtime.engine import QUALITY_TIERS, Engine

    ekw = {}
    if args.precision in QUALITY_TIERS:
        prec, dt = QUALITY_TIERS[args.precision]
        if dt == "bf16":
            ekw["compute_dtype"] = jnp.bfloat16
    else:
        prec = args.precision

    cfg = get_config(args.model)
    params = init_params(cfg, seed=0)
    S = int(args.seconds * cfg.sample_rate)
    rng = np.random.default_rng(0)

    for point in args.points:
        parts = dict(p[0:1].lower() for p in ())  # noqa
        B = seg = None
        for tok in point.split(":"):
            if tok.startswith("b"):
                B = int(tok[1:])
            elif tok.startswith("s"):
                seg = int(tok[1:])
        assert B and seg, point
        eng = Engine(cfg, params, precision=prec, seg_frames=seg, **ekw)
        wav = jax.device_put(jnp.asarray(
            rng.normal(size=(B, S)).astype(np.float32) * 0.05))
        alpha = jnp.asarray(np.float32(0.0))
        run = eng._offline_fn(B, S)

        def once():
            y, _ = run(eng.params, wav, alpha)
            return float(jnp.sum(y[:, :: max(1, S // 64)]))

        once()
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            once()
            times.append(time.perf_counter() - t0)
        wall = float(np.median(times))
        xrt = B * args.seconds / wall
        print(json.dumps({
            "point": point, "model": args.model,
            "precision": args.precision,
            "xrt": round(xrt, 2), "wall_s": round(wall, 4),
        }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
