#!/usr/bin/env python
"""Quality validation against the reference ONNX runtime.

Runs both stacks on the same noisy corpus and scores the outputs against
clean references — the BASELINE.md gate (PESQ delta <= 0.01, plus
STOI/SI-SNR deltas).  Requires an environment with network access (or
pre-fetched artifacts):

  - this framework's checkpoints (``dpdfnet-tpu download``),
  - the reference's ONNX models + the ``onnxruntime``/``pesq`` packages,
  - a corpus CSV with ``noisy_path,clean_path`` columns
    (e.g. the DPDFNet_EvalSet).

Usage:
  python tools/validate_quality.py corpus.csv --model dpdfnet8_48khz_hr \
      --onnx /path/to/dpdfnet8_48khz_hr.onnx [--out results.csv]

Prints per-metric means for both stacks and the deltas; exits non-zero if
|PESQ delta| > 0.01.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dpdfnet_tpu import api, metrics  # noqa: E402
from dpdfnet_tpu.audio import ensure_sample_rate, to_mono  # noqa: E402
from dpdfnet_tpu.audio_io import read_audio  # noqa: E402


def enhance_reference_onnx(audio: np.ndarray, sr: int, onnx_path: str,
                           model_sr: int) -> np.ndarray:
    """Run the reference's ONNX streaming graph (their offline pipeline)."""
    import onnxruntime as ort

    from dpdfnet_tpu.audio import fit_length, make_stft_config
    from dpdfnet_tpu.ops.windows import vorbis_window

    sess = ort.InferenceSession(onnx_path, providers=["CPUExecutionProvider"])
    meta = sess.get_modelmeta().custom_metadata_map
    state = np.zeros(int(meta["state_size"]), np.float32)
    e = int(meta["erb_norm_state_size"])
    s = int(meta["spec_norm_state_size"])
    state[:e] = [float(v) for v in meta["erb_norm_init"].split(",")]
    state[e:e + s] = [float(v) for v in meta["spec_norm_init"].split(",")]

    x = ensure_sample_rate(to_mono(audio), sr, model_sr)
    cfg = make_stft_config(int(round(model_sr * 0.02)))
    xp = np.pad(x, (0, cfg.win_len))
    # center=True reflect STFT (librosa convention) via scipy
    from scipy.signal import stft as sp_stft

    pad = cfg.win_len // 2
    xr = np.pad(xp, (pad, pad), mode="reflect")
    T = (len(xr) - cfg.win_len) // cfg.hop_size + 1
    idx = np.arange(T)[:, None] * cfg.hop_size + np.arange(cfg.win_len)
    spec = np.fft.rfft(xr[idx] * cfg.window, axis=-1)
    spec_ri = np.stack([spec.real, spec.imag], -1).astype(np.float32)[None]

    in_names = [i.name for i in sess.get_inputs()]
    out_names = [o.name for o in sess.get_outputs()]
    frames = []
    for t in range(T):
        o, state = sess.run(out_names[:2], {
            in_names[0]: spec_ri[:, t: t + 1], in_names[1]: state})
        frames.append(o)
    out = np.concatenate(frames, axis=1)[0]
    comp = out[..., 0] + 1j * out[..., 1]
    yframes = np.fft.irfft(comp, n=cfg.win_len, axis=-1) * cfg.window
    total = cfg.win_len + cfg.hop_size * (T - 1)
    y = np.zeros(total)
    wss = np.zeros(total)
    for t in range(T):
        y[t * cfg.hop_size: t * cfg.hop_size + cfg.win_len] += yframes[t]
        wss[t * cfg.hop_size: t * cfg.hop_size + cfg.win_len] += cfg.window ** 2
    y = y / np.where(wss > 1e-11, wss, 1.0)
    y = y[pad: total - pad]
    y = np.concatenate([y[cfg.win_len * 2:], np.zeros(cfg.win_len * 2)])
    y = ensure_sample_rate(y.astype(np.float32), model_sr, sr)
    return fit_length(y, len(to_mono(audio)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("csv")
    ap.add_argument("--model", default="dpdfnet8_48khz_hr")
    ap.add_argument("--onnx", required=True)
    ap.add_argument("--out", default=None)
    ap.add_argument("--pesq-tolerance", type=float, default=0.01)
    args = ap.parse_args()

    import pandas as pd

    df = pd.read_csv(args.csv)
    base = os.path.dirname(os.path.abspath(args.csv))
    rows = []
    from dpdfnet_tpu.zoo import get_model_info

    model_sr = get_model_info(args.model).sample_rate
    for _, row in df.iterrows():
        noisy_p = os.path.join(base, str(row["noisy_path"]))
        clean_p = os.path.join(base, str(row["clean_path"]))
        noisy, sr = read_audio(noisy_p)
        clean = metrics.load_audio_mono_16k(clean_p)

        ours = api.enhance(noisy, sr, model=args.model)
        ref = enhance_reference_onnx(noisy, sr, args.onnx, model_sr)

        rec = {"noisy_path": row["noisy_path"]}
        for tag, out in (("tpu", ours), ("onnx", ref)):
            x = ensure_sample_rate(to_mono(out), sr, 16000)
            c_al, x_al, _ = metrics.align_by_xcorr_trim(clean, x)
            rec[f"sisnr_{tag}"] = metrics.si_snr(c_al, x_al)
            rec[f"stoi_{tag}"] = metrics.stoi(c_al, x_al, 16000)
            try:
                rec[f"pesq_{tag}"] = metrics.wb_pesq(c_al, x_al, 16000)
            except ImportError:
                rec[f"pesq_{tag}"] = float("nan")
        rows.append(rec)

    res = pd.DataFrame(rows)
    if args.out:
        res.to_csv(args.out, index=False)
    deltas = {}
    for m in ("pesq", "stoi", "sisnr"):
        deltas[m] = float((res[f"{m}_tpu"] - res[f"{m}_onnx"]).mean())
        print(f"{m}: tpu {res[f'{m}_tpu'].mean():.4f}  "
              f"onnx {res[f'{m}_onnx'].mean():.4f}  delta {deltas[m]:+.4f}")
    if not np.isnan(deltas["pesq"]) and abs(deltas["pesq"]) > args.pesq_tolerance:
        print(f"FAIL: |PESQ delta| {abs(deltas['pesq']):.4f} > "
              f"{args.pesq_tolerance}")
        return 1
    print("PASS")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
