#!/usr/bin/env python
"""Quantify resampler-backend deviation (scipy polyphase vs soxr vs native).

The reference pipeline resamples with librosa, whose engine is soxr
(`/root/reference/package/src/dpdfnet/audio.py:20-27`); this framework
prefers soxr when importable and otherwise uses scipy's Kaiser polyphase
(``dpdfnet_tpu.audio.resample``).  For any input not at model rate the
choice feeds directly into the PESQ-delta quality gate, so the deviation
must be a measured number, not an assumption.

Measures, on band-limited speech-shaped signals for the two deployment
ratios (48k->16k for the 16 kHz family, 44.1k->48k for the HR family):

  - scipy vs native C++ backend (both available in this image)
  - scipy vs soxr HQ (runs only where soxr is installed — e.g. any env
    that has the reference's own deps; prints SKIPPED otherwise)

Reports relative RMS error and dB vs signal on the central region
(edge transients excluded).  Results are committed to
docs/performance.md's resampler note.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dpdfnet_tpu import audio  # noqa: E402
from dpdfnet_tpu.quality import speechlike_test_signal  # noqa: E402


def _delta(a: np.ndarray, b: np.ndarray) -> float:
    n = min(len(a), len(b))
    lo, hi = n // 8, n - n // 8          # exclude filter edge transients
    a, b = a[lo:hi].astype(np.float64), b[lo:hi].astype(np.float64)
    d = np.sqrt(np.mean((a - b) ** 2))
    s = np.sqrt(np.mean(a ** 2))
    return float(20 * np.log10(max(d, 1e-12) / max(s, 1e-12)))


def run_backend(x, sr_in, sr_out, backend):
    old = os.environ.get("DPDFNET_TPU_RESAMPLER")
    os.environ["DPDFNET_TPU_RESAMPLER"] = backend
    try:
        return audio.resample(x, sr_in, sr_out)
    finally:
        if old is None:
            os.environ.pop("DPDFNET_TPU_RESAMPLER", None)
        else:
            os.environ["DPDFNET_TPU_RESAMPLER"] = old


def main() -> int:
    for sr_in, sr_out in ((48000, 16000), (16000, 48000),
                          (44100, 48000), (48000, 44100)):
        x = speechlike_test_signal(4.0, sr_in, seed=0)[0]
        ref = run_backend(x, sr_in, sr_out, "scipy")
        print(f"{sr_in} -> {sr_out}:")
        got = run_backend(x, sr_in, sr_out, "native")
        if len(got) == len(ref):
            print(f"  native vs scipy: {_delta(ref, got):7.1f} dB")
        try:
            import soxr  # noqa: F401

            got = run_backend(x, sr_in, sr_out, "soxr")
            print(f"  soxr   vs scipy: {_delta(ref, got):7.1f} dB")
        except ImportError:
            print("  soxr   vs scipy: SKIPPED (soxr not installed)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
