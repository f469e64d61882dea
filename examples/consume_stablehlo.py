#!/usr/bin/env python
"""Standalone consumer for an exported dpdfnet-tpu streaming artifact.

Demonstrates (and is CI-tested to guarantee) that a `<model>.stream.stablehlo`
artifact plus its JSON sidecar is a complete, self-describing deployment
contract — the analogue of the reference's ONNX file + embedded metadata
consumed by any onnxruntime host (`/root/reference/package/src/dpdfnet/
onnx_backend.py:52-107`).  This script deliberately imports ONLY jax and
numpy: no framework package code, no model definitions, no weights files.

Usage:
    python consume_stablehlo.py <artifact.stablehlo> <in.wav> <out.wav>

Everything needed is recovered from the artifact + sidecar:
  - the compiled streaming step  (spec [1,1,F,2], state [1,S]) -> (out, state)
  - state_size + EMA-norm init segments  -> the initial state vector
  - n_fft / hop / wnorm / sample_rate    -> framing, windowing, scaling
"""

import json
import struct
import sys
import wave
from pathlib import Path

import numpy as np


def vorbis_window(n: int) -> np.ndarray:
    # sin(pi/2 * sin^2(pi (n+0.5) / N)) — the model family's fixed window
    s = np.sin(np.pi * (np.arange(n) + 0.5) / n)
    return np.sin(0.5 * np.pi * s * s).astype(np.float32)


def initial_state(meta: dict) -> np.ndarray:
    state = np.zeros(int(meta["state_size"]), np.float32)
    offset = 0
    for key, size_key in (("erb_norm_init", "erb_norm_state_size"),
                          ("spec_norm_init", "spec_norm_state_size")):
        seg = np.array([float(v) for v in meta[key].split(",")], np.float32)
        n = int(meta[size_key])
        assert seg.shape[0] == n, (key, seg.shape, n)
        state[offset: offset + n] = seg
        offset += n
    return state


def read_wav_mono(path: str):
    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(n)
    if width == 2:
        x = np.frombuffer(raw, "<i2").astype(np.float32) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, "<i4").astype(np.float32) / float(1 << 31)
    else:
        raise ValueError(f"unsupported wav sample width: {width}")
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return x.astype(np.float32), sr


def write_wav_mono(path: str, x: np.ndarray, sr: int) -> None:
    pcm = (np.clip(x, -1.0, 1.0) * 32767.0).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


def main(argv):
    if len(argv) != 4:
        print(__doc__)
        return 2
    artifact, in_wav, out_wav = argv[1], argv[2], argv[3]

    import os

    import jax
    from jax import export as jax_export

    # Hosts that pin a default accelerator platform can redirect the
    # consumer (e.g. CONSUMER_JAX_PLATFORM=cpu for a CPU-only box).
    plat = os.environ.get("CONSUMER_JAX_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)

    meta = json.loads(Path(artifact + ".json").read_text())
    step = jax_export.deserialize(Path(artifact).read_bytes())

    win = int(meta["n_fft"])
    hop = int(meta["hop"])
    wnorm = float(meta["wnorm"])
    window = vorbis_window(win)

    audio, sr = read_wav_mono(in_wav)
    if sr != int(meta["sample_rate"]):
        raise SystemExit(
            f"input is {sr} Hz but the artifact expects "
            f"{meta['sample_rate']} Hz — resample first")

    assert win == 2 * hop, "this model family uses 50% overlap"
    state = initial_state(meta)[None]                    # [1, S]
    ola = np.zeros(hop, np.float32)
    committed = []
    # causal streaming: one window in, one hop out, state carried
    n_frames = max(0, (audio.shape[0] - win) // hop + 1)
    for t in range(n_frames):
        frame = audio[t * hop: t * hop + win] * window
        spec = np.fft.rfft(frame).astype(np.complex64)
        spec_ri = np.stack([spec.real, spec.imag], -1).astype(np.float32)
        spec_in = spec_ri[None, None] * np.float32(wnorm)
        out, state = step.call(spec_in, state)
        out = np.asarray(out)[0, 0] / wnorm              # [F, 2]
        y = np.fft.irfft(out[:, 0] + 1j * out[:, 1], n=win).astype(
            np.float32) * window
        # Vorbis COLA at 50% overlap: first hop is fully determined
        committed.append(y[:hop] + ola)
        ola = y[hop:].copy()
    enhanced = np.concatenate(committed) if committed else np.zeros(0, np.float32)
    write_wav_mono(out_wav, enhanced, sr)
    print(f"wrote {enhanced.shape[0]} samples to {out_wav} "
          f"({n_frames} frames, state {state.shape[1]} floats)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
