#!/usr/bin/env python
"""Time the REAL dprnn_intra_block at shipped shapes in the same in-jit
rep loop as tools/intra_step_ablation.py — cross-checks the ablation
mirror against the production kernel (and the e2e profile's ~1.4 us/step).

Usage: python tools/intra_real_timing.py [--rows 43008] [--T 48] [--reps 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dpdfnet_tpu.ops import pallas_gru


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=43008)
    ap.add_argument("--T", type=int, default=48)
    ap.add_argument("--C", type=int, default=64)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--tile", type=int, default=None)
    ap.add_argument("--precision", default="default")
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    args = ap.parse_args()

    rows, T, C = args.rows, args.T, args.C
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(rows, T, C)).astype(np.float32) * 0.1,
                    dtype=dtype)
    s = 0.3 / np.sqrt(C)
    wi2 = jnp.asarray(rng.normal(size=(2 * C, 6 * C)).astype(np.float32) * s)
    wh2 = jnp.asarray(rng.normal(size=(2 * C, 6 * C)).astype(np.float32) * s)
    b2 = jnp.zeros((2, 6 * C), jnp.float32)
    wfc = jnp.asarray(rng.normal(size=(2 * C, C)).astype(np.float32) * s)
    bfc = jnp.zeros((C,), jnp.float32)
    g = jnp.ones((C,), jnp.float32)
    bln = jnp.zeros((C,), jnp.float32)

    kw = {}
    if args.tile is not None:
        kw["tile"] = args.tile

    def run(x):
        def body(i, carry):
            acc, xx = carry
            out = pallas_gru.dprnn_intra_block(
                xx, wi2, wh2, b2, wfc, bfc, g, bln,
                precision=args.precision, **kw)
            # feed a data dependence forward so reps serialize
            return (acc + out[0, 0, 0].astype(jnp.float32), out)
        acc, out = jax.lax.fori_loop(0, args.reps, body,
                                     (jnp.float32(0.0), x))
        return acc + out[0, 0, 0].astype(jnp.float32)

    fn = jax.jit(run)
    t0 = time.perf_counter()
    float(fn(x))
    print(f"compile+warm {time.perf_counter() - t0:.0f}s", flush=True)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(x))
        best = min(best, time.perf_counter() - t0)
    tile = kw.get("tile") or (512 if dtype == jnp.bfloat16 else 256)
    cells = -(-rows // tile)
    per_call = best / args.reps
    per_step = per_call / (cells * T)
    print(f"rows {rows} T {T} tile {tile} ({cells} cells) {args.dtype}: "
          f"{per_call * 1e3:.3f} ms/call  {per_step * 1e9:.0f} ns/step")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
