"""Device-side STFT / ISTFT.

Two framing conventions, matching the reference's two pipelines:

- *center* (offline): reflect-pad ``win//2`` both sides, overlapping frames,
  matches ``librosa.stft(center=True, pad_mode='reflect')`` /
  ``torch.stft(center=True)`` used by the offline path
  (`/root/reference/package/src/dpdfnet/audio.py:104-117`,
  `/root/reference/model/modules.py:342-370`).
- *causal* (streaming): no padding; frame t covers samples
  ``[t*hop, t*hop+win)`` — what ``StreamEnhancer`` does with its hand-rolled
  rFFT (`/root/reference/package/src/dpdfnet/stream.py:117-126`).

The DFT itself is ``jnp.fft.rfft``; at n_fft in {320, 960} XLA lowers this
well on TPU, and the framing/window/scale all fuse into the surrounding
program under jit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def frame_signal(x: Array, win: int, hop: int, *, center: bool) -> Array:
    """Slice ``x: [B, S]`` into overlapping frames ``[B, T, win]``."""
    if center:
        x = jnp.pad(x, ((0, 0), (win // 2, win // 2)), mode="reflect")
    n = x.shape[-1]
    T = (n - win) // hop + 1
    idx = np.arange(T)[:, None] * hop + np.arange(win)[None, :]
    return x[:, idx]


def stft(
    x: Array, window: Array, hop: int, *, center: bool = True
) -> Array:
    """STFT returning real/imag-stacked frames ``[B, T, F, 2]`` (float32)."""
    frames = frame_signal(x, window.shape[0], hop, center=center)
    spec = jnp.fft.rfft(frames * window, axis=-1)
    return jnp.stack([spec.real, spec.imag], axis=-1).astype(x.dtype)


def dft_matrices(n_fft: int, window: np.ndarray) -> np.ndarray:
    """Windowed real-DFT as one matmul weight [win, 2*(n_fft//2+1)].

    The MXU-native front-end (cf. the reference's ConvSTFT, which expresses
    the DFT as a conv1d — model/modules.py:214-292 — and the GEMM-native
    NDFT idea of MelT): ``frames @ W`` yields [.., F] real parts then [.., F]
    imaginary parts.
    """
    F = n_fft // 2 + 1
    n = np.arange(n_fft)[:, None]
    k = np.arange(F)[None, :]
    arg = -2.0 * np.pi * n * k / n_fft
    real = np.cos(arg) * window[:, None]
    imag = np.sin(arg) * window[:, None]
    return np.concatenate([real, imag], axis=1).astype(np.float32)


def stft_matmul(
    x: Array, window: Array, hop: int, *, center: bool = True,
    dft: Array | None = None,
) -> Array:
    """STFT with the DFT evaluated as a single GEMM on the MXU.

    Numerically equivalent to :func:`stft` (an FFT) to ~1e-4; useful when
    the fused framing+window+DFT GEMM beats the FFT lowering, and as the
    equivalent of the reference's conv-STFT formulation.
    """
    win = window.shape[0]
    if dft is None:
        dft = jnp.asarray(dft_matrices(win, np.asarray(window)))
    frames = frame_signal(x, win, hop, center=center)
    F = win // 2 + 1
    out = frames @ dft.astype(x.dtype)                 # [B, T, 2F]
    return jnp.stack([out[..., :F], out[..., F:]], axis=-1)


def idft_matrices(n_fft: int, window: np.ndarray) -> np.ndarray:
    """Inverse real-DFT + synthesis window as one matmul weight
    [2*(n_fft//2+1), win]: ``spec_ri_concat @ W`` yields windowed time
    frames ready for overlap-add."""
    F = n_fft // 2 + 1
    n = np.arange(n_fft)[None, :]
    k = np.arange(F)[:, None]
    arg = 2.0 * np.pi * k * n / n_fft
    scale = np.full((F, 1), 2.0 / n_fft)
    scale[0] = 1.0 / n_fft
    if n_fft % 2 == 0:
        scale[-1] = 1.0 / n_fft
    real = np.cos(arg) * scale
    imag = -np.sin(arg) * scale
    m = np.concatenate([real, imag], axis=0)             # [2F, win]
    return (m * window[None, :]).astype(np.float32)


def istft_matmul(
    spec: Array, window: Array, hop: int, *, center: bool = True,
    idft: Array | None = None,
) -> Array:
    """Inverse STFT with the inverse DFT + synthesis window as one GEMM."""
    win = window.shape[0]
    if idft is None:
        idft = jnp.asarray(idft_matrices(win, np.asarray(window)))
    B, T, F, _ = spec.shape
    flat = jnp.concatenate([spec[..., 0], spec[..., 1]], axis=-1)  # [B,T,2F]
    frames = flat @ idft.astype(spec.dtype)                        # [B,T,win]
    total = win + hop * (T - 1)
    out = _overlap_add(frames, hop, total)
    wss = _window_sumsquare(np.asarray(window), T, hop)
    wss = jnp.asarray(np.where(wss > 1e-11, wss, 1.0), dtype=out.dtype)
    out = out / wss
    if center:
        return out[:, win // 2: total - win // 2]
    return out


def istft(
    spec: Array, window: Array, hop: int, *, center: bool = True
) -> Array:
    """Inverse STFT with windowed overlap-add and window-sum-square norm.

    ``spec: [B, T, F, 2]`` -> ``[B, S]`` with ``S = hop*(T-1)`` for
    center=True (librosa/torch convention: trim win//2 each side), or
    ``S = win + hop*(T-1)`` for causal frames.
    """
    win = window.shape[0]
    B, T = spec.shape[0], spec.shape[1]
    comp = jax.lax.complex(spec[..., 0], spec[..., 1])
    frames = jnp.fft.irfft(comp, n=win, axis=-1) * window      # [B, T, win]

    total = win + hop * (T - 1)
    out = _overlap_add(frames, hop, total)

    wss = _window_sumsquare(np.asarray(window), T, hop)         # [total]
    wss = jnp.asarray(np.where(wss > 1e-11, wss, 1.0), dtype=out.dtype)
    out = out / wss

    if center:
        return out[:, win // 2: total - win // 2]
    return out


def _overlap_add(frames: Array, hop: int, total: int) -> Array:
    """OLA of ``frames: [B, T, win]`` into ``[B, total]``.

    Implemented as a reshape-based fold for the fixed 50% overlap case
    (win == 2*hop) — two strided halves summed, no scatter; falls back to a
    scatter-add otherwise.
    """
    B, T, win = frames.shape
    if win == 2 * hop:
        # y[t*hop : t*hop+2*hop] += frame_t ; split frames into two hop-sized
        # halves: first halves tile [0..T*hop), second halves tile [hop..).
        first = frames[:, :, :hop].reshape(B, T * hop)
        second = frames[:, :, hop:].reshape(B, T * hop)
        out = jnp.zeros((B, total), frames.dtype)
        out = out.at[:, : T * hop].add(first)
        out = out.at[:, hop: hop + T * hop].add(second)
        return out
    idx = np.arange(T)[:, None] * hop + np.arange(win)[None, :]
    out = jnp.zeros((B, total), frames.dtype)
    return out.at[:, idx.reshape(-1)].add(frames.reshape(B, -1))


@functools.lru_cache(maxsize=32)
def _window_sumsquare_cached(win_key: bytes, win_len: int, T: int, hop: int):
    window = np.frombuffer(win_key, dtype=np.float32)
    return _window_sumsquare_impl(window, T, hop)


def _window_sumsquare_impl(window: np.ndarray, T: int, hop: int) -> np.ndarray:
    total = window.shape[0] + hop * (T - 1)
    wss = np.zeros(total, dtype=np.float64)
    w2 = window.astype(np.float64) ** 2
    for t in range(T):
        wss[t * hop: t * hop + window.shape[0]] += w2
    return wss.astype(np.float32)


def _window_sumsquare(window: np.ndarray, T: int, hop: int) -> np.ndarray:
    return _window_sumsquare_cached(
        np.asarray(window, np.float32).tobytes(), window.shape[0], T, hop
    )
