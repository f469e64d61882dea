#!/usr/bin/env python
"""Bulk enhancement example: the TPU-native replacement for the
reference's thread-pool-of-sessions `enhance-dir` workflow.

Pads a directory's utterances into geometric length buckets and runs them
as device batches through one compiled program per (batch, bucket) —
see `Engine.enhance_waveforms`.  With real checkpoints available use
`--model` + `dpdfnet-tpu download`; with `--random-weights` the script
demonstrates the throughput path on synthetic weights.

    python examples/batch_enhance.py in_dir/ out_dir/ --batch-size 64
"""

import argparse
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("in_dir", type=Path)
    ap.add_argument("out_dir", type=Path)
    ap.add_argument("--model", default="dpdfnet8_48khz_hr")
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--quality", default="high",
                    choices=["highest", "high", "fast", "turbo"])
    ap.add_argument("--attn-limit-db", type=float, default=None)
    ap.add_argument("--random-weights", action="store_true",
                    help="Synthetic weights (no checkpoint download).")
    args = ap.parse_args()

    from dpdfnet_tpu.audio import ensure_sample_rate, to_mono
    from dpdfnet_tpu.audio_io import SUPPORTED_EXTENSIONS, read_audio, write_wav
    from dpdfnet_tpu.config import get_config
    from dpdfnet_tpu.runtime.engine import engine_from_quality

    cfg = get_config(args.model)
    if args.random_weights:
        from dpdfnet_tpu.models.params import init_params

        params = init_params(cfg, seed=0)
    else:
        from dpdfnet_tpu.api import _get_engine

        params = _get_engine(args.model, quality=args.quality).params
    engine = engine_from_quality(cfg, params, args.quality)

    files = sorted(p for p in args.in_dir.iterdir()
                   if p.suffix.lower() in SUPPORTED_EXTENSIONS)
    if not files:
        print(f"no audio files under {args.in_dir}", file=sys.stderr)
        return 1
    args.out_dir.mkdir(parents=True, exist_ok=True)

    # Sort by length so each device batch shares a bucket (minimises pad
    # waste); the engine re-buckets internally regardless.
    loaded = []
    for p in files:
        audio, sr = read_audio(p)
        wav = ensure_sample_rate(to_mono(audio), sr, cfg.sample_rate)
        loaded.append((p, wav))
    loaded.sort(key=lambda t: len(t[1]))

    t0 = time.perf_counter()
    total_s = 0.0
    for i in range(0, len(loaded), args.batch_size):
        chunk = loaded[i: i + args.batch_size]
        S = max(len(w) for _, w in chunk)
        batch = np.zeros((len(chunk), S), np.float32)
        lengths = []
        for j, (_, w) in enumerate(chunk):
            batch[j, : len(w)] = w
            lengths.append(len(w))
        outs = engine.enhance_waveforms(batch, args.attn_limit_db,
                                        lengths=np.asarray(lengths))
        for (p, _), out, ln in zip(chunk, np.atleast_2d(outs), lengths):
            write_wav(args.out_dir / (p.stem + ".wav"),
                      out[:ln], cfg.sample_rate)
        total_s += sum(lengths) / cfg.sample_rate
    wall = time.perf_counter() - t0
    print(f"[OK] {len(files)} files, {total_s:.1f} s audio in {wall:.2f} s "
          f"-> {total_s / wall:.0f}x real-time")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
