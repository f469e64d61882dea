"""Auxiliary signal utilities from the reference's op zoo.

Equivalents of the misc helpers in `/root/reference/model/utils.py`:
power-law compression, a gradient-robust complex angle, local-SNR targets
(training aid), and the comb-filter matrix.  None are used by the shipped
DPDFNet forward; they are carried for capability parity and for anyone
building training on top of this framework.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def as_complex(x: Array) -> Array:
    """[..., 2] real/imag stack -> complex array (torch view_as_complex)."""
    if jnp.iscomplexobj(x):
        return x
    if x.shape[-1] != 2:
        raise ValueError(
            f"Last dimension needs length 2 (re + im), got {x.shape}")
    return jax.lax.complex(x[..., 0], x[..., 1])


def as_real(x: Array) -> Array:
    if jnp.iscomplexobj(x):
        return jnp.stack([x.real, x.imag], axis=-1)
    return x


def to_db(x: Array) -> Array:
    return 10.0 * jnp.log10(x + 1e-10)


def get_magnitude(x: Array) -> Array:
    return jnp.abs(as_complex(x))


def power_law_compression(signal: Array, alpha: float) -> Array:
    return jnp.sign(signal) * jnp.power(jnp.abs(signal), alpha)


def power_law_decompression(signal: Array, alpha: float) -> Array:
    return jnp.sign(signal) * jnp.power(jnp.abs(signal), 1.0 / alpha)


@jax.custom_vjp
def angle(x: Array) -> Array:
    """atan2(imag, real) with the gradient robustified at zero magnitude
    (reference `angle` autograd Function, model/utils.py:104-116)."""
    return jnp.arctan2(x.imag, x.real)


def _angle_fwd(x):
    return angle(x), x


def _angle_bwd(x, g):
    denom = jnp.maximum(jnp.square(x.real) + jnp.square(x.imag), 1e-10)
    ginv = g / denom
    # JAX's complex cotangent convention is the CONJUGATE of torch's
    # (grad f = conj(df/dz) for real-valued f): the torch backward
    # (model/utils.py:104-116) returns (-i*g, r*g); here the imaginary
    # part flips so jax.grad matches jnp.arctan2's native gradient.
    return (jax.lax.complex(-x.imag * ginv, -(x.real * ginv)),)


angle.defvjp(_angle_fwd, _angle_bwd)


# --------------------------------------------------------------------------- #
# Local SNR target (training aid)
# --------------------------------------------------------------------------- #

def _local_energy(x: Array, ws: int) -> Array:
    """Hann-weighted sliding energy over the frame axis.

    x: [B, 1, T, F, 2] -> [B, 1, T] (reference _local_energy)."""
    if ws % 2 == 0:
        ws += 1
    half = ws // 2
    e = jnp.sum(jnp.square(x), axis=(-1, -2))            # [B, 1, T]
    e = jnp.pad(e, ((0, 0), (0, 0), (half, half)))
    # torch.hann_window default is periodic: hanning(ws+1) without the tail
    # (torch special-cases length 1 to [1.0])
    w_np = np.ones(1) if ws == 1 else np.hanning(ws + 1)[:-1]
    w = jnp.asarray(w_np, e.dtype)
    T = x.shape[2]
    windows = jnp.stack([e[:, :, i: i + T] for i in range(ws)], axis=-1)
    return jnp.sum(windows * w, axis=-1) / ws


def local_snr(
    clean: Array, noise: Array, window_size: int,
    db: bool = False, window_size_ns: Optional[int] = None,
    eps: float = 1e-12,
) -> Tuple[Array, Array, Array]:
    """Per-frame SNR from clean/noise spectrograms [B, T, F, 2]."""
    c = as_real(clean)
    n = as_real(noise)
    c = c[:, None] if c.ndim == 4 else c
    n = n[:, None] if n.ndim == 4 else n
    e_speech = _local_energy(c, window_size)
    ws_ns = window_size if window_size_ns is None else window_size_ns
    e_noise = _local_energy(n, ws_ns)
    snr = e_speech / jnp.maximum(e_noise, eps)
    if db:
        snr = 10.0 * jnp.log10(jnp.maximum(snr, eps))
    return snr, e_speech, e_noise


class LocalSnrTarget:
    """Frame-level SNR training target (reference LocalSnrTarget)."""

    def __init__(self, fft_size: int, hop_size: int, sr: int, ws: int = 20,
                 db: bool = True, ws_ns: Optional[int] = None,
                 target_snr_range: Optional[Tuple[float, float]] = None):
        self.fft_size = fft_size
        self.hop_size = hop_size
        self.sr = sr
        self.ws = self._calc_ws(ws)
        self.ws_ns = self.ws * 2 if ws_ns is None else self._calc_ws(ws_ns)
        self.db = db
        self.range = target_snr_range

    def _calc_ws(self, ws_ms: int) -> int:
        ws = ws_ms - self.fft_size / self.sr * 1000
        ws = 1 + ws / (self.hop_size / self.sr * 1000)
        return max(int(round(ws)), 1)

    def __call__(self, clean: Array, noise: Array,
                 max_bin: Optional[int] = None) -> Array:
        if max_bin is not None:
            # normalise to real-stacked [..., F, 2] FIRST: on a complex
            # [B, T, F] input the [..., :max_bin, :] slice would truncate
            # the TIME axis instead of frequency
            clean = as_real(clean)[..., :max_bin, :]
            noise = as_real(noise)[..., :max_bin, :]
        snr = local_snr(clean, noise, window_size=self.ws, db=self.db,
                        window_size_ns=self.ws_ns)[0]
        if self.range is not None:
            snr = jnp.clip(snr, self.range[0], self.range[1])
        return snr[:, 0] if snr.ndim == 3 else snr


def create_comb_filter_matrix(
    pitch_min: int = 65, pitch_max: int = 500, nfft: int = 512,
    sample_rate: int = 16000, max_order: Optional[int] = None,
    output_domain: str = "freq", symmetric: bool = False,
) -> np.ndarray:
    """Comb-filter dictionary over candidate pitches (reference
    create_comb_filter_matrix; numpy, precomputed once)."""
    assert output_domain in ("time", "freq")
    max_order_v = max_order if max_order is not None else 10 ** 9
    n_pitch = int(pitch_max) - int(pitch_min) + 1
    cf = np.zeros((n_pitch, nfft + 1), np.float64)
    for i, f0 in enumerate(range(int(pitch_min), int(pitch_max) + 1)):
        delay = int(sample_rate / f0)
        order = min(int((nfft // 2) / delay), max_order_v)
        # torch.hann_window(N) is the PERIODIC Hann = np.hanning(N+1)[:-1]
        # (NOT np.hanning(N+2)[1:-1], which shifts every sample and skews
        # the normalised weights by up to ~6% at low pitches)
        w = np.hanning((order + 1) * 2 + 1)[:-1][order + 1:]
        w = w / w.sum()
        for o, wv in enumerate(w):
            cf[i, (nfft // 2) - o * delay] = wv
    if symmetric:
        cf[:, nfft // 2 + 1:] = np.flip(cf[:, : nfft // 2], axis=-1)
        cf /= cf.sum(-1, keepdims=True)
    if output_domain == "time":
        return cf.astype(np.float32)
    # magnitude response via STFT of the impulse responses
    x = cf[:, :-1]
    win = np.hanning(nfft + 1)[:-1]          # periodic (torch.hann_window)
    spec = np.fft.rfft(x * win, n=nfft, axis=-1)
    mag = np.abs(spec)
    mn = mag.min(axis=1, keepdims=True)
    mx = mag.max(axis=1, keepdims=True)
    return ((mag - mn) / np.maximum(mx - mn, 1e-12)).astype(np.float32)
