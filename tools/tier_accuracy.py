#!/usr/bin/env python
"""Reproducible precision-tier accuracy table (the air-gapped quality gate).

Measures each speed tier's output deviation against the 6-pass-f32
'highest' tier on speech-shaped input, for BOTH weight regimes:

  - contractive weights (spectral norm <= 0.7 per layer): representative of
    trained checkpoints, whose dynamics are stable and non-amplifying;
  - raw random weights: the adversarial worst case.

Run on the target hardware.  On CPU the matmul-precision tiers (high/fast)
collapse to f32 (~1e-7 deviations), but 'turbo' casts activations to bf16
on EVERY backend, so its CPU deviation stays ~1e-3 — only the bf16-dot
component is TPU-specific.  Results are committed to docs/performance.md.

Usage:
  python tools/tier_accuracy.py [--model dpdfnet8_48khz_hr] [--seconds 4]
      [--batch 2] [--json]
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
    ap.add_argument("--seconds", type=float, default=4.0)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--contract", type=float, default=0.7)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--platform", default=None,
                    help="Force a jax platform (e.g. cpu); default is the "
                         "environment's (TPU where available).")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from dpdfnet_tpu.quality import tier_deviation

    platform = jax.devices()[0].platform
    results = {}
    for regime, contract in (("contractive", args.contract), ("raw", None)):
        results[regime] = tier_deviation(
            args.model, seconds=args.seconds, batch=args.batch,
            seed=args.seed, contract=contract)

    if args.json:
        print(json.dumps({"model": args.model, "platform": platform,
                          "seconds": args.seconds, "batch": args.batch,
                          "contract": args.contract, "results": results}))
        return 0

    print(f"model={args.model} platform={platform} "
          f"({args.seconds}s x b{args.batch}, contract={args.contract})")
    print(f"{'tier':8} {'regime':12} {'rel_rms_dev':>12} {'max_abs_dev':>12} "
          f"{'vs_input_db':>12} {'stoi':>7} {'sisnr_db':>9}")
    for regime, tiers in results.items():
        for tier, d in tiers.items():
            if tier.startswith("_"):
                continue
            print(f"{tier:8} {regime:12} {d['rel_rms']:>12.3e} "
                  f"{d['max_abs']:>12.3e} {d['rms_vs_input_db']:>12.1f} "
                  f"{d['stoi_vs_highest']:>7.4f} "
                  f"{d['sisnr_vs_highest_db']:>9.1f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
