"""Compiled enhancement engine.

This is the TPU-native replacement for the reference's ONNX-runtime session
(`/root/reference/package/src/dpdfnet/onnx_backend.py`): one jitted XLA
program per (batch, length) bucket instead of ~100 Python->C++ session calls
per second of audio.  The entire offline pipeline — framing, windowed rFFT,
wnorm scaling, the network over all frames, attenuation-limit blend, inverse
STFT and alignment shift — runs on device in a single program.

Shape discipline: utterance lengths are bucketed (rounded up to a multiple
of ``bucket_s`` seconds) so XLA compiles a handful of programs; zero-padding
is causally harmless (the network is strictly causal in its carried state,
and padded tail output is discarded).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..models import state as state_lib
from ..models.dpdfnet import forward_spec
from ..ops import stft as stft_ops
from ..ops.windows import vorbis_window
from .. import audio as audio_lib

Array = jax.Array

_STREAM_T_BUCKETS = (1, 2, 4, 8, 16, 32, 64, 128)


QUALITY_TIERS = {
    # name -> (matmul precision, compute dtype)
    "highest": ("highest", None),   # 6-pass f32 matmuls
    "high": ("high", None),         # bf16_3x matmuls, f32-grade (default)
    "fast": ("default", None),      # bf16 MXU matmuls (~1.4x faster)
    "turbo": ("default", "bf16"),   # bf16 activations end-to-end (~1.8x)
}


def engine_from_quality(cfg, params, quality: str = "high", **kwargs):
    """Build an Engine from a named quality tier (see QUALITY_TIERS)."""
    import jax.numpy as jnp

    try:
        precision, dtype = QUALITY_TIERS[quality]
    except KeyError as exc:
        raise ValueError(
            f"Unknown quality {quality!r}; choose from "
            f"{sorted(QUALITY_TIERS)}") from exc
    if dtype == "bf16":
        kwargs.setdefault("compute_dtype", jnp.bfloat16)
    return Engine(cfg, params, precision=precision, **kwargs)


class Engine:
    """Holds params + compiled programs for one model configuration."""

    def __init__(
        self,
        cfg: ModelConfig,
        params,
        *,
        precision: str = "high",
        bucket_s: float = 1.0,
        compute_dtype=jnp.float32,
        # segment sweep at b256 'default' on v5e: 64/1737, 96/1679,
        # 104/1701, 112/1748 (reproduced 3x), 120/1627, 128/1655,
        # 192/1467, 256/HBM-OOM — 112 is a stable local optimum
        seg_frames: int = 112,
        fuse: bool = True,
    ):
        from ..utils import compile_cache

        compile_cache.enable()
        self.cfg = cfg
        if fuse:
            from ..models.fuse import prepare_inference_params

            params = prepare_inference_params(params, cfg)
        self.params = params
        self.precision = precision
        self.compute_dtype = compute_dtype
        # Long utterances are processed as a lax.scan over fixed-size frame
        # segments with the stream state carried between them: live
        # activations (U-Net skip tensors etc.) are bounded by one segment
        # instead of the whole utterance, which is what keeps large batches
        # inside HBM.  Numerically identical to a single-span run up to the
        # usual fp reduction-order noise.
        self.seg_frames = int(seg_frames)
        self.bucket_samples = max(
            cfg.hop, int(round(bucket_s * cfg.sample_rate))
        )
        self._window = jnp.asarray(vorbis_window(cfg.win_len))
        self._offline_cache: Dict[Tuple[int, int], object] = {}
        self._stream_cache: Dict[Tuple[int, int], object] = {}

    # ------------------------------------------------------------------ #
    # Offline (whole-utterance) path
    # ------------------------------------------------------------------ #

    def _offline_fn(self, B: int, S: int):
        key = (B, S)
        fn = self._offline_cache.get(key)
        if fn is not None:
            return fn
        cfg = self.cfg
        window = self._window
        precision = self.precision

        seg = self.seg_frames

        @functools.partial(jax.jit, donate_argnums=())
        def run(params, wav: Array, alpha: Array):
            with jax.default_matmul_precision(precision):
                # reference alignment: pad win_len zeros before the STFT
                # (package/src/dpdfnet/api.py:88).  The DFT runs as a single
                # MXU GEMM (matches the FFT to ~1e-4; the FFT lowering at
                # n_fft 320/960 costs ~4% of the pipeline).
                x = jnp.pad(wav, ((0, 0), (0, cfg.win_len)))
                spec = stft_ops.stft_matmul(x, window, cfg.hop, center=True)
                if self.compute_dtype != jnp.float32:
                    spec = spec.astype(self.compute_dtype)
                spec = spec * jnp.asarray(cfg.wnorm, spec.dtype)
                st = state_lib.init_state(cfg, batch=B, dtype=spec.dtype)
                T = spec.shape[1]
                if T <= seg:
                    out, _, lsnr = forward_spec(params, cfg, spec, st)
                else:
                    n_seg = -(-T // seg)
                    spec_p = jnp.pad(
                        spec, ((0, 0), (0, n_seg * seg - T), (0, 0), (0, 0)))
                    segs = spec_p.reshape(
                        B, n_seg, seg, *spec.shape[2:]).swapaxes(0, 1)

                    def body(carry, spec_seg):
                        o, carry, l = forward_spec(params, cfg, spec_seg, carry)
                        return carry, (o, l)

                    _, (outs, lsnrs) = jax.lax.scan(body, st, segs)
                    out = outs.swapaxes(0, 1).reshape(
                        B, n_seg * seg, *spec.shape[2:])[:, :T]
                    lsnr = lsnrs.swapaxes(0, 1).reshape(B, n_seg * seg)[:, :T]
                # attenuation limit: blend 4-frame-shifted noisy spec
                # (package/src/dpdfnet/audio.py:50-76); alpha==0 -> passthrough
                k = audio_lib.ATTN_LIMIT_NOISY_FRAME_OFFSET
                aligned = jnp.pad(spec, ((0, 0), (k, 0), (0, 0), (0, 0)))[:, :-k]
                out = alpha * aligned.astype(jnp.float32) + \
                    (1.0 - alpha) * out.astype(jnp.float32)
                y = stft_ops.istft_matmul(
                    out / jnp.asarray(cfg.wnorm, jnp.float32),
                    window, cfg.hop, center=True)
                # output advanced by 2*win_len (2-frame lookahead + 2-frame DF
                # delay), cf. onnx_model/dpdfnet.py:872
                return y[:, 2 * cfg.win_len:].astype(jnp.float32), lsnr

        self._offline_cache[key] = run
        return run

    def enhance_waveforms(
        self,
        wavs: np.ndarray,
        attn_limit_db: Optional[float] = None,
        lengths: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        """Enhance a batch of waveforms at the model sample rate.

        Args:
            wavs: [S] or [B, S] float32 at ``cfg.sample_rate``.
            attn_limit_db: optional attenuation limit (dB).
            lengths: optional per-utterance valid lengths (defaults to S).

        Returns:
            Enhanced float32 audio with the same shape as ``wavs``.
        """
        squeeze = wavs.ndim == 1
        x = np.atleast_2d(np.asarray(wavs, dtype=np.float32))
        B, S = x.shape
        value = audio_lib.validate_attn_limit_db(attn_limit_db)
        alpha = np.float32(0.0 if value is None else 10.0 ** (-value / 20.0))

        # Geometric length buckets (x1.5 ladder above 1 bucket) so a corpus
        # of varied utterance lengths compiles O(log) programs instead of one
        # per second of length.  Padding is causally harmless (tail output
        # is discarded).
        S_pad = self.bucket_samples
        while S_pad < max(S, 1):
            S_pad = -(-(S_pad * 3 // 2) // self.bucket_samples) * self.bucket_samples
        xp = np.zeros((B, S_pad), np.float32)
        xp[:, :S] = x
        run = self._offline_fn(B, S_pad)
        y, _ = run(self.params, jnp.asarray(xp), jnp.asarray(alpha))
        y = np.asarray(y)

        out = np.zeros_like(x)
        n = min(S, y.shape[1])
        out[:, :n] = y[:, :n]
        if lengths is not None:
            for i, ln in enumerate(np.asarray(lengths).reshape(-1)):
                out[i, int(ln):] = 0.0
        return out[0] if squeeze else out

    # ------------------------------------------------------------------ #
    # Streaming path (sample frames in, overlap-add-ready frames out)
    # ------------------------------------------------------------------ #

    def _stream_fn(self, B: int, T: int):
        key = (B, T)
        fn = self._stream_cache.get(key)
        if fn is not None:
            return fn
        cfg = self.cfg
        window = self._window
        precision = self.precision

        @functools.partial(jax.jit, donate_argnums=(2,))
        def run(params, frames: Array, st):
            # Streaming scans a *single-frame* program over the frame axis so
            # the floating-point op sequence per frame is identical for every
            # chunking — block-size invariance is bit-exact, like the
            # reference's per-frame session calls.  (The offline path instead
            # vectorises over T for throughput.)
            with jax.default_matmul_precision(precision):
                spec = jnp.fft.rfft(frames * window, axis=-1)
                spec = jnp.stack([spec.real, spec.imag], -1).astype(
                    self.compute_dtype)
                spec = spec * jnp.asarray(cfg.wnorm, spec.dtype)

                def body(carry, spec_t):
                    out_t, carry, _ = forward_spec(
                        params, cfg, spec_t[:, None], carry)
                    return carry, out_t[:, 0]

                st, out = jax.lax.scan(body, st, jnp.swapaxes(spec, 0, 1))
                out = jnp.swapaxes(out, 0, 1).astype(jnp.float32)
                out = out / jnp.asarray(cfg.wnorm, jnp.float32)
                comp = jax.lax.complex(out[..., 0], out[..., 1])
                y = jnp.fft.irfft(comp, n=cfg.win_len, axis=-1) * window
                return y.astype(jnp.float32), st

        self._stream_cache[key] = run
        return run

    def init_stream_state(self, batch: int = 1):
        return state_lib.init_state(self.cfg, batch=batch,
                                    dtype=self.compute_dtype)

    def process_frames(self, frames: np.ndarray, st):
        """Process ``[B, T, win_len]`` sample frames; returns time-domain
        windowed frames ready for overlap-add, plus the new state.

        T is internally split into power-of-two buckets so only a handful of
        programs compile regardless of chunking pattern.
        """
        B, T, _ = frames.shape
        outs = []
        pos = 0
        x = jnp.asarray(frames)
        while pos < T:
            step = 1
            for b in _STREAM_T_BUCKETS:
                if pos + b <= T:
                    step = b
            run = self._stream_fn(B, step)
            y, st = run(self.params, x[:, pos: pos + step], st)
            outs.append(y)
            pos += step
        return np.concatenate([np.asarray(o) for o in outs], axis=1), st
