#!/usr/bin/env python
"""Quality validation against the reference ONNX runtime (thin wrapper).

The implementation lives in ``dpdfnet_tpu.quality`` and is also wired into
the CLI as ``dpdfnet-tpu eval --vs-onnx`` — the BASELINE.md gate
(PESQ delta <= 0.01 vs the reference on a noisy/clean corpus).  Requires an
environment with network access (or pre-fetched artifacts):

  - this framework's checkpoints (``dpdfnet-tpu download``),
  - the reference's ONNX models + the ``onnxruntime``/``pesq`` packages,
  - a corpus CSV with ``noisy_path,clean_path`` columns
    (e.g. the DPDFNet_EvalSet).

Usage:
  python tools/validate_quality.py corpus.csv --model dpdfnet8_48khz_hr \
      --onnx /path/to/dpdfnet8_48khz_hr.onnx [--out results.csv]

For the air-gapped substitute gate (precision-tier deviation on
contractive weights) see ``tools/tier_accuracy.py``.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("csv")
    ap.add_argument("--model", default="dpdfnet8_48khz_hr")
    ap.add_argument("--onnx", required=True)
    ap.add_argument("--out", default=None)
    ap.add_argument("--pesq-tolerance", type=float, default=0.01)
    args = ap.parse_args()

    from dpdfnet_tpu.quality import validate_vs_onnx

    return validate_vs_onnx(
        args.csv, args.onnx, model=args.model, out_csv=args.out,
        pesq_tolerance=args.pesq_tolerance)


if __name__ == "__main__":
    raise SystemExit(main())
