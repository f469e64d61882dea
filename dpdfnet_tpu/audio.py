"""Host-side audio utilities (mono mixdown, resampling, level safety).

Mirrors `/root/reference/package/src/dpdfnet/audio.py` semantics.  The
reference uses librosa (soxr) for resampling; this framework ships its own
polyphase resampler (scipy kaiser-windowed) since the TPU image carries no
librosa — quality is equivalent for speech enhancement purposes and the
resampler is exercised by the block-size-invariance tests.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass

import numpy as np

from .ops.windows import vorbis_window

ATTN_LIMIT_NOISY_FRAME_OFFSET = 4


def to_mono(audio: np.ndarray) -> np.ndarray:
    """Mix down to mono; accepts [S] or [S, C] (channels last, soundfile
    convention)."""
    x = np.asarray(audio, dtype=np.float32)
    if x.ndim == 2:
        x = x.mean(axis=-1, dtype=np.float32)
    elif x.ndim != 1:
        raise ValueError(f"to_mono wants [S] or [S, C] audio, not {x.shape}")
    return x


def _soxr_available() -> bool:
    try:
        import soxr  # noqa: F401
    except ImportError:
        return False
    return True


def resample(audio: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Resample between rates; backend order mirrors the reference pipeline.

    The reference resamples via librosa, whose default engine is soxr
    (`/root/reference/package/src/dpdfnet/audio.py:20-27`), so when the
    optional ``soxr`` package is importable it is preferred (HQ profile —
    librosa's default) and any input fed through both pipelines sees the
    SAME resampler.  Without it, scipy's Kaiser-windowed polyphase
    ``resample_poly`` is the fallback; ``DPDFNET_TPU_RESAMPLER`` forces a
    backend (``soxr`` / ``scipy`` / ``native`` — the framework's C++
    polyphase, same filter design as scipy, agreement ~-68 dB).  Measured
    backend deltas: ``tools/resampler_delta.py`` + docs/performance.md.
    """
    if sr_in == sr_out:
        return np.asarray(audio, dtype=np.float32)
    g = math.gcd(int(sr_in), int(sr_out))
    up, down = sr_out // g, sr_in // g

    import os

    backend = os.environ.get("DPDFNET_TPU_RESAMPLER", "auto")
    x32 = np.asarray(audio, np.float32)
    if backend in ("auto", "soxr") and _soxr_available():
        import soxr

        # soxr resamples along axis 0 (multi-channel natively); "HQ" is
        # librosa's soxr_hq default profile
        return np.asarray(
            soxr.resample(x32, int(sr_in), int(sr_out), quality="HQ"),
            dtype=np.float32)
    if backend == "native" and x32.ndim == 1:
        # the native resampler is mono-only (it would read a 2-D buffer as
        # interleaved mono garbage); multi-channel falls through to scipy,
        # which resamples along axis 0
        from . import native

        y = native.resample(x32, up, down)
        if y is not None:
            return y
    from scipy.signal import resample_poly

    return resample_poly(
        np.asarray(audio, dtype=np.float64), up, down
    ).astype(np.float32)


def ensure_sample_rate(audio: np.ndarray, sample_rate: int, target: int) -> np.ndarray:
    return resample(audio, sample_rate, target)


def fit_length(audio: np.ndarray, target_len: int) -> np.ndarray:
    """Crop or zero-extend a 1-D signal to exactly ``target_len`` samples."""
    x = np.asarray(audio, dtype=np.float32).reshape(-1)
    if x.shape[0] < target_len:
        return np.pad(x, (0, target_len - x.shape[0]))
    return x[:target_len]


def pcm16_safe(audio: np.ndarray) -> np.ndarray:
    """Convert float audio to int16 with hard clipping at full scale."""
    scaled = np.asarray(audio, dtype=np.float32) * 32767.0
    return np.clip(scaled, -32767.0, 32767.0).astype(np.int16)


def validate_attn_limit_db(attn_limit_db):
    """Normalise an attenuation-limit argument to float dB (None passes).

    ``inf`` means "no limit" and is accepted; negative values and NaN are
    rejected because a negative limit would amplify the noisy signal.
    """
    if attn_limit_db is None:
        return None
    db = float(attn_limit_db)
    if not db >= 0.0:  # single comparison rejects both negatives and NaN
        raise ValueError(
            f"attn_limit_db must be a non-negative dB value, inf, or None; "
            f"got {attn_limit_db!r}.")
    return db


def apply_attn_limit(
    spec_noisy: np.ndarray, spec_enh: np.ndarray, attn_limit_db
) -> np.ndarray:
    """Cap the applied attenuation by mixing delayed noisy spec back in.

    Computes ``enhanced + alpha * (noisy_delayed - enhanced)`` with
    ``alpha = 10^(-dB/20)``; the noisy reference is delayed by
    ``ATTN_LIMIT_NOISY_FRAME_OFFSET`` frames to line up with the enhanced
    output's 2-frame model lookahead + 2-frame DF delay (reference
    behaviour: `/root/reference/package/src/dpdfnet/audio.py:50-76`).
    """
    db = validate_attn_limit_db(attn_limit_db)
    enhanced = np.asarray(spec_enh, dtype=np.float32)
    if db is None:
        return enhanced
    noisy = np.asarray(spec_noisy, dtype=np.float32)
    if noisy.shape != enhanced.shape:
        raise ValueError(
            f"noisy/enhanced spectrogram shapes differ: {noisy.shape} vs "
            f"{enhanced.shape}.")
    # Delay along the frame axis; frames shifted in from before the stream
    # start are silence.
    delayed = np.roll(noisy, ATTN_LIMIT_NOISY_FRAME_OFFSET, axis=1)
    delayed[:, :ATTN_LIMIT_NOISY_FRAME_OFFSET] = 0.0
    alpha = np.float32(10.0 ** (-db / 20.0))
    blended = enhanced + alpha * (delayed - enhanced)
    return np.ascontiguousarray(blended, dtype=np.float32)


@dataclass(frozen=True)
class StftConfig:
    """Analysis/synthesis framing, fully determined by the window length
    (50% overlap, Vorbis window — the model family's fixed convention)."""

    win_len: int

    @property
    def hop_size(self) -> int:
        return self.win_len // 2

    @property
    def window(self) -> np.ndarray:
        # cached: callers read this inside per-frame loops
        return _window_cached(self.win_len)


@functools.lru_cache(maxsize=8)
def _window_cached(win_len: int) -> np.ndarray:
    w = vorbis_window(win_len)
    w.setflags(write=False)
    return w


def make_stft_config(win_len: int) -> StftConfig:
    return StftConfig(win_len=int(win_len))
