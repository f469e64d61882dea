"""Quality validation: this framework vs the reference ONNX runtime.

The BASELINE.md gate (PESQ delta <= 0.01 vs the reference on a noisy/clean
corpus) needs real checkpoints, the reference ``.onnx`` artifacts and the
``onnxruntime``/``pesq`` packages — available in deployment environments,
not in the air-gapped build container.  This module is the wired-in path for
that gate (``dpdfnet-tpu eval --vs-onnx``); ``tier_deviation`` below is the
self-contained substitute that quantifies precision-tier accuracy without
network access.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from .audio import ensure_sample_rate, to_mono


_ONNX_SESSIONS: dict = {}


def _onnx_session(onnx_path: str):
    """Build (and cache) one CPU InferenceSession per artifact: graph load
    + optimisation costs seconds and validate_vs_onnx calls per corpus
    row (the reference builds its runtime once, onnx_backend.py)."""
    sess = _ONNX_SESSIONS.get(onnx_path)
    if sess is None:
        import onnxruntime as ort

        sess = ort.InferenceSession(
            onnx_path, providers=["CPUExecutionProvider"])
        _ONNX_SESSIONS[onnx_path] = sess
    return sess


def enhance_reference_onnx(audio: np.ndarray, sr: int, onnx_path: str,
                           model_sr: int) -> np.ndarray:
    """Run the reference's exported ONNX streaming graph through its own
    offline pipeline conventions (center=True reflect STFT, per-frame
    session calls, COLA ISTFT, 2*win_len shift —
    `/root/reference/package/src/dpdfnet/api.py:51-113`)."""
    from .audio import fit_length, make_stft_config

    sess = _onnx_session(onnx_path)
    meta = sess.get_modelmeta().custom_metadata_map
    state = np.zeros(int(meta["state_size"]), np.float32)
    e = int(meta["erb_norm_state_size"])
    s = int(meta["spec_norm_state_size"])
    state[:e] = [float(v) for v in meta["erb_norm_init"].split(",")]
    state[e:e + s] = [float(v) for v in meta["spec_norm_init"].split(",")]

    x = ensure_sample_rate(to_mono(audio), sr, model_sr)
    # frame size from the graph itself when concrete (the reference's
    # infer_win_len: F bins -> (F-1)*2 samples); 20 ms of model_sr is the
    # family default, used only when the freq axis is dynamic
    win_len = int(round(model_sr * 0.02))
    in0 = sess.get_inputs()[0].shape
    if len(in0) >= 2 and isinstance(in0[-2], int) and in0[-2] > 1:
        win_len = (int(in0[-2]) - 1) * 2
    cfg = make_stft_config(win_len)
    xp = np.pad(x, (0, cfg.win_len))
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
    win = cfg.window
    yframes = np.fft.irfft(comp, n=cfg.win_len, axis=-1) * win
    total = cfg.win_len + cfg.hop_size * (T - 1)
    y = np.zeros(total)
    wss = np.zeros(total)
    w2 = win ** 2
    for t in range(T):
        y[t * cfg.hop_size: t * cfg.hop_size + cfg.win_len] += yframes[t]
        wss[t * cfg.hop_size: t * cfg.hop_size + cfg.win_len] += w2
    y = y / np.where(wss > 1e-11, wss, 1.0)
    y = y[pad: total - pad]
    y = np.concatenate([y[cfg.win_len * 2:], np.zeros(cfg.win_len * 2)])
    y = ensure_sample_rate(y.astype(np.float32), model_sr, sr)
    return fit_length(y, len(to_mono(audio)))


def validate_vs_onnx(
    csv_path: str,
    onnx_path: str,
    *,
    model: str = "dpdfnet8_48khz_hr",
    out_csv: Optional[str] = None,
    pesq_tolerance: float = 0.01,
    quality: str = "high",
) -> int:
    """Score both stacks on a noisy/clean corpus; 0 iff |PESQ delta| <= tol.

    ``csv_path`` must have ``noisy_path,clean_path`` columns (paths relative
    to the CSV).  Writes per-file metrics to ``out_csv`` when given.
    """
    import csv as csv_mod

    from . import api, metrics
    from .audio_io import read_audio
    from .zoo import get_model_info

    model_sr = get_model_info(model).sample_rate
    base = os.path.dirname(os.path.abspath(csv_path))
    with open(csv_path, newline="") as f:
        corpus = list(csv_mod.DictReader(f))
    if not corpus:
        print("empty corpus CSV")
        return 1

    rows = []
    for row in corpus:
        noisy_p = os.path.join(base, row["noisy_path"])
        clean_p = os.path.join(base, row["clean_path"])
        noisy, sr = read_audio(noisy_p)
        clean = metrics.load_audio_mono_16k(clean_p)

        ours = api.enhance(noisy, sr, model=model, quality=quality)
        ref = enhance_reference_onnx(noisy, sr, onnx_path, model_sr)

        rec = {"noisy_path": row["noisy_path"]}
        for tag, out in (("tpu", ours), ("onnx", ref)):
            x = ensure_sample_rate(to_mono(out), sr, 16000)
            c_al, x_al, _ = metrics.align_by_xcorr_trim(clean, x)
            rec[f"sisnr_{tag}"] = metrics.si_snr(c_al, x_al)
            rec[f"stoi_{tag}"] = metrics.stoi(c_al, x_al, 16000)
            try:
                rec[f"pesq_{tag}"] = metrics.wb_pesq(c_al, x_al, 16000)
            except Exception:  # noqa: BLE001
                # missing package OR a per-clip pesq error (e.g.
                # NoUtterancesError on near-silent audio): record NaN —
                # the NaN gate below turns an all-NaN column into a loud
                # FAIL rather than aborting the whole eval mid-corpus
                rec[f"pesq_{tag}"] = float("nan")
        rows.append(rec)

    if out_csv:
        with open(out_csv, "w", newline="") as f:
            w = csv_mod.DictWriter(f, fieldnames=list(rows[0]))
            w.writeheader()
            w.writerows(rows)

    deltas = {}
    for m in ("pesq", "stoi", "sisnr"):
        # Average each metric only over rows where BOTH systems scored:
        # pesq failures are per-clip per-system (a NoUtterancesError can
        # hit one output and not the other), and averaging different clip
        # subsets would compare unlike for unlike.
        a = np.array([r[f"{m}_tpu"] for r in rows], np.float64)
        b = np.array([r[f"{m}_onnx"] for r in rows], np.float64)
        both = np.isfinite(a) & np.isfinite(b)
        if both.any():
            ours_m = float(a[both].mean())
            ref_m = float(b[both].mean())
        else:
            ours_m = ref_m = float("nan")
        deltas[m] = ours_m - ref_m
        print(f"{m}: tpu {ours_m:.4f}  onnx {ref_m:.4f}  "
              f"delta {deltas[m]:+.4f}")
    if np.isnan(deltas["pesq"]):
        # The gate IS the PESQ delta — if NO row produced a PESQ score
        # (package missing, or every clip rejected) fail loudly rather
        # than report PASS without ever measuring it.
        print("FAIL: PESQ unavailable (install the ITU 'pesq' package, or "
              "every clip was rejected by it) — the PESQ gate cannot be "
              "evaluated")
        return 1
    if abs(deltas["pesq"]) > pesq_tolerance:
        print(f"FAIL: |PESQ delta| {abs(deltas['pesq']):.4f} > "
              f"{pesq_tolerance}")
        return 1
    print("PASS")
    return 0


# --------------------------------------------------------------------------- #
# Precision-tier deviation (the air-gapped substitute gate)
# --------------------------------------------------------------------------- #

def speechlike_test_signal(seconds: float, sr: int, seed: int = 0,
                           batch: int = 1) -> np.ndarray:
    """Deterministic speech-shaped test input: a pitch-modulated harmonic
    stack (~F0 120 Hz with vibrato, -12 dB/oct rolloff) in pink-ish noise at
    ~ -25 dBFS — matches the level/spectral statistics the norms' empirical
    init tables expect far better than white noise."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    out = np.zeros((batch, t.shape[0]), np.float32)
    for b in range(batch):
        f0 = 100.0 + 40.0 * rng.random() + 8.0 * np.sin(
            2 * np.pi * (2.0 + rng.random()) * t)
        phase = 2 * np.pi * np.cumsum(f0) / sr
        sig = sum(np.sin(k * phase + rng.random() * 6.28) / k ** 1.5
                  for k in range(1, 13))
        env = 0.5 + 0.5 * np.sin(2 * np.pi * (1.5 + rng.random()) * t) ** 2
        noise = np.cumsum(rng.normal(size=t.shape[0]))
        noise = noise - np.convolve(noise, np.ones(64) / 64.0, "same")
        noise /= max(1e-9, np.abs(noise).max())
        x = 0.05 * sig * env + 0.01 * noise
        out[b] = x.astype(np.float32)
    return out


def tier_deviation(
    model: str = "dpdfnet8_48khz_hr",
    *,
    seconds: float = 4.0,
    batch: int = 2,
    seed: int = 0,
    contract: Optional[float] = 0.7,
    tiers=("high", "fast", "turbo"),
) -> dict:
    """Per-tier output deviation vs the 'highest' (6-pass f32) tier.

    With ``contract`` set, every >=2-D weight is rescaled to that spectral
    norm — modelling trained checkpoints (stable, non-amplifying dynamics)
    instead of adversarial raw random init.  Returns
    ``{tier: {"rel_rms": .., "max_abs": ..}}``.
    """
    from .config import get_config
    from .models.params import contract_params, init_params
    from .runtime.engine import engine_from_quality

    cfg = get_config(model)
    params = init_params(cfg, seed=seed)
    if contract is not None:
        params = contract_params(params, factor=contract)
    wav = speechlike_test_signal(seconds, cfg.sample_rate, seed=seed,
                                 batch=batch)

    ref = engine_from_quality(cfg, params, "highest").enhance_waveforms(wav)
    ref_rms = float(np.sqrt(np.mean(ref ** 2)))
    in_rms = float(np.sqrt(np.mean(wav ** 2)))
    out = {"_ref_rms": ref_rms, "_input_rms": in_rms}

    def _percept(a16, b16):
        """Perceptual proxies of tier-vs-highest fidelity at 16 kHz:
        native STOI (1.0 = transparent) and SI-SNR in dB, the same
        metrics the reference's eval tool reports
        (`/root/reference/pesq_stoi_sisnr_calc.py:149-153`).  Backs the
        PESQ-delta claim inside the air gap with more than waveform RMS."""
        from . import metrics

        return (float(metrics.stoi(a16, b16, 16000)),
                float(metrics.si_snr(a16, b16)))

    ref16 = [ensure_sample_rate(r, cfg.sample_rate, 16000) for r in ref]
    for tier in tiers:
        y = engine_from_quality(cfg, params, tier).enhance_waveforms(wav)
        d = y - ref
        d_rms = float(np.sqrt(np.mean(d ** 2)))
        stois, sisnrs = zip(*(
            _percept(r16, ensure_sample_rate(yi, cfg.sample_rate, 16000))
            for r16, yi in zip(ref16, y)))
        out[tier] = {
            "rel_rms": float(d_rms / max(ref_rms, 1e-12)),
            "max_abs": float(np.abs(d).max()),
            # deviation relative to the *input* scale: a trained enhancer's
            # output is O(input), so this is the perceptually meaningful
            # normalisation even when a synthetic model attenuates hard
            "rms_vs_input_db": float(
                20.0 * np.log10(max(d_rms, 1e-12) / max(in_rms, 1e-12))),
            "stoi_vs_highest": float(np.mean(stois)),
            "sisnr_vs_highest_db": float(np.mean(sisnrs)),
        }
    return out
