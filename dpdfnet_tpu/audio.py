"""Host-side audio utilities (mono mixdown, resampling, level safety).

Mirrors `/root/reference/package/src/dpdfnet/audio.py` semantics.  The
reference uses librosa (soxr) for resampling; this framework ships its own
polyphase resampler (scipy kaiser-windowed) since the TPU image carries no
librosa — quality is equivalent for speech enhancement purposes and the
resampler is exercised by the block-size-invariance tests.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from .ops.windows import vorbis_window

ATTN_LIMIT_NOISY_FRAME_OFFSET = 4


def to_mono(audio: np.ndarray) -> np.ndarray:
    x = np.asarray(audio, dtype=np.float32)
    if x.ndim == 1:
        return x
    if x.ndim != 2:
        raise ValueError(f"Expected mono/stereo audio, got shape {x.shape}")
    return np.mean(x, axis=1, dtype=np.float32)


def resample(audio: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Polyphase resampling (rational ratio) with a Kaiser anti-alias filter.

    Default backend is scipy's ``resample_poly``; set
    ``DPDFNET_TPU_RESAMPLER=native`` to use the framework's C++ resampler
    (same filter design; agreement ~-68 dB, not bit-identical).
    """
    if sr_in == sr_out:
        return np.asarray(audio, dtype=np.float32)
    g = math.gcd(int(sr_in), int(sr_out))
    up, down = sr_out // g, sr_in // g

    import os

    if os.environ.get("DPDFNET_TPU_RESAMPLER") == "native":
        from . import native

        y = native.resample(np.asarray(audio, np.float32), up, down)
        if y is not None:
            return y
    from scipy.signal import resample_poly

    return resample_poly(
        np.asarray(audio, dtype=np.float64), up, down
    ).astype(np.float32)


def ensure_sample_rate(audio: np.ndarray, sample_rate: int, target: int) -> np.ndarray:
    return resample(audio, sample_rate, target)


def fit_length(audio: np.ndarray, target_len: int) -> np.ndarray:
    x = np.asarray(audio, dtype=np.float32).reshape(-1)
    if x.shape[0] == target_len:
        return x
    if x.shape[0] > target_len:
        return x[:target_len]
    out = np.zeros(target_len, dtype=np.float32)
    out[: x.shape[0]] = x
    return out


def pcm16_safe(audio: np.ndarray) -> np.ndarray:
    x = np.clip(np.asarray(audio, dtype=np.float32), -1.0, 1.0)
    return (x * 32767.0).astype(np.int16)


def validate_attn_limit_db(attn_limit_db):
    if attn_limit_db is None:
        return None
    value = float(attn_limit_db)
    if np.isnan(value) or value < 0.0:
        raise ValueError("attn_limit_db must be non-negative, infinity, or None.")
    return value


def apply_attn_limit(
    spec_noisy: np.ndarray, spec_enh: np.ndarray, attn_limit_db
) -> np.ndarray:
    """Blend `alpha*noisy(+4 frames) + (1-alpha)*enhanced` in the spec domain.

    The 4-frame shift aligns the noisy reference with the enhanced output's
    2-frame model lookahead + 2-frame DF delay
    (`/root/reference/package/src/dpdfnet/audio.py:50-76`).
    """
    value = validate_attn_limit_db(attn_limit_db)
    enhanced = np.asarray(spec_enh, dtype=np.float32)
    if value is None:
        return enhanced
    noisy = np.asarray(spec_noisy, dtype=np.float32)
    if noisy.shape != enhanced.shape:
        raise ValueError(
            "spec_noisy and spec_enh must have matching shapes, "
            f"got {noisy.shape} and {enhanced.shape}."
        )
    aligned = np.zeros_like(noisy)
    k = ATTN_LIMIT_NOISY_FRAME_OFFSET
    if noisy.shape[1] > k:
        aligned[:, k:] = noisy[:, :-k]
    alpha = float(10.0 ** (-value / 20.0))
    return np.ascontiguousarray(alpha * aligned + (1.0 - alpha) * enhanced,
                                dtype=np.float32)


@dataclass(frozen=True)
class StftConfig:
    win_len: int
    hop_size: int
    window: np.ndarray


def make_stft_config(win_len: int) -> StftConfig:
    return StftConfig(win_len=win_len, hop_size=win_len // 2,
                      window=vorbis_window(win_len))
