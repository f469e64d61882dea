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


def _state_f32_hiddens() -> bool:
    """Carry the DPRNN inter-GRU hiddens in f32 under bf16 compute
    (DPDFNET_TPU_STATE_F32H, default ON; read at state-init time) — see
    Engine.init_stream_state.  =0 restores the uniform compute-dtype
    state for A/B measurement."""
    import os

    return os.environ.get(
        "DPDFNET_TPU_STATE_F32H", "1") not in ("0", "false", "False")


def _stream_dft_gemm() -> bool:
    """Streaming front/back DFT as the MXU GEMM (ops.stft.dft_matrices)
    instead of jnp.fft.rfft/irfft (DPDFNET_TPU_STREAM_DFT_GEMM=1).
    Changes bits vs the FFT (not vs chunking: the per-frame op sequence
    stays identical, so exact-mode block-size invariance is preserved).
    Read at trace time.

    Round-5 probe, REJECTED as default (OFF): exact s512 turbo measured
    3.081 ms/hop vs 3.023 with the rfft lowering (-2%) — XLA's rfft at
    win 960 is already fine at T==1 shapes, and the [B, 960] x [960, 1026]
    GEMM per hop costs more than it saves.  Kept for experimentation."""
    import os

    return os.environ.get(
        "DPDFNET_TPU_STREAM_DFT_GEMM", "0") not in ("0", "false", "False")

# Mesh axis name for batch data-parallelism (one compiled program, utterance
# axis sharded over ICI; must agree with parallel.mesh.BATCH_AXIS).
BATCH_AXIS = "data"


QUALITY_TIERS = {
    # name -> (matmul precision, compute dtype)
    "highest": ("highest", None),   # 6-pass f32 matmuls
    "high": ("high", None),         # bf16_3x matmuls, f32-grade (default)
    "fast": ("default", None),      # bf16 MXU matmuls (~1.4x faster)
    "turbo": ("default", "bf16"),   # bf16 activations end-to-end (~1.8x)
}


def engine_from_quality(cfg, params, quality: str = "high", **kwargs):
    """Build an Engine from a named quality tier (see QUALITY_TIERS)."""
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
        mesh=None,
    ):
        from ..utils import compile_cache

        compile_cache.enable()
        self.cfg = cfg
        # Optional multi-chip batch data-parallelism: with a jax.sharding.Mesh
        # the SAME tuned programs (segment-scan, fused params, DFT-GEMM,
        # precision tiers) are wrapped in shard_map over the utterance axis —
        # per-shard computation is identical to the single-device path and no
        # collectives are needed (utterances are independent; SURVEY.md §2.9).
        self.mesh = mesh
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
        self._stepped_cache: Dict[Tuple[int, int, int], object] = {}

    def _place_state(self, st):
        """Place a state pytree batch-sharded on the engine's mesh."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        sh = NamedSharding(self.mesh, P(BATCH_AXIS))
        return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), st)

    # ------------------------------------------------------------------ #
    # Compilation helper: single-device jit, or jit(shard_map) on a mesh
    # ------------------------------------------------------------------ #

    def _compile(self, core, in_specs, out_specs, donate=()):
        """jit ``core``; on a mesh, shard the batch axis with shard_map so the
        per-device program is bit-identical to the single-device one (Pallas
        kernels included — shard_map runs them per-shard, no GSPMD
        partitioning of custom calls needed)."""
        if self.mesh is not None:
            # check_vma off: scan carries are initialised from replicated
            # zeros inside the body, which the varying-axis type checker
            # rejects; with batch-only sharding there is no replication
            # subtlety to check (no collectives anywhere in the program).
            try:
                core = jax.shard_map(
                    core, mesh=self.mesh, in_specs=in_specs,
                    out_specs=out_specs, check_vma=False)
            except TypeError:
                core = jax.shard_map(
                    core, mesh=self.mesh, in_specs=in_specs,
                    out_specs=out_specs, check_rep=False)
        return jax.jit(core, donate_argnums=donate)

    def _batch_specs(self):
        from jax.sharding import PartitionSpec as P

        return P(BATCH_AXIS), P()

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

        def run(params, wav: Array, alpha: Array):
            b = wav.shape[0]                   # local batch under shard_map
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
                st = state_lib.init_state(cfg, batch=b, dtype=spec.dtype)
                T = spec.shape[1]
                if T <= seg:
                    out, _, lsnr = forward_spec(params, cfg, spec, st)
                else:
                    n_seg = -(-T // seg)
                    spec_p = jnp.pad(
                        spec, ((0, 0), (0, n_seg * seg - T), (0, 0), (0, 0)))
                    segs = spec_p.reshape(
                        b, n_seg, seg, *spec.shape[2:]).swapaxes(0, 1)

                    def body(carry, spec_seg):
                        o, carry, l = forward_spec(params, cfg, spec_seg, carry)
                        return carry, (o, l)

                    _, (outs, lsnrs) = jax.lax.scan(body, st, segs)
                    out = outs.swapaxes(0, 1).reshape(
                        b, n_seg * seg, *spec.shape[2:])[:, :T]
                    lsnr = lsnrs.swapaxes(0, 1).reshape(b, n_seg * seg)[:, :T]
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

        shard, rep = self._batch_specs()
        run = self._compile(run, in_specs=(rep, shard, rep),
                            out_specs=(shard, shard))
        self._offline_cache[key] = run
        return run

    def _pad_batch(self, x: np.ndarray) -> np.ndarray:
        """Round the batch up to a multiple of the mesh size (zero rows)."""
        if self.mesh is None:
            return x
        m = int(self.mesh.size)
        B = x.shape[0]
        if B % m == 0:
            return x
        pad = m - B % m
        return np.concatenate(
            [x, np.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)

    def enhance_waveforms(
        self,
        wavs: np.ndarray,
        attn_limit_db: Optional[float] = None,
        lengths: Optional[np.ndarray] = None,
        progress_callback=None,
    ) -> np.ndarray:
        """Enhance a batch of waveforms at the model sample rate.

        Args:
            wavs: [S] or [B, S] float32 at ``cfg.sample_rate``.
            attn_limit_db: optional attenuation limit (dB).
            lengths: optional per-utterance valid lengths (defaults to S).
            progress_callback: optional ``cb(done_frames, total_frames)``;
                when given, the network runs segment-by-segment (identical
                math, a few extra dispatches) so progress is real.

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
        # per second of length.  The pipeline's valid output length is
        # S_pad - win_len (the front end pads win_len, the back end drops
        # the 2*win_len alignment), so the bucket must clear S by at least
        # win_len or the last 20 ms of an exact-bucket-length clip would
        # come back as silence.
        need = max(S + self.cfg.win_len, 1)
        S_pad = self.bucket_samples
        while S_pad < need:
            S_pad = -(-(S_pad * 3 // 2) // self.bucket_samples) * self.bucket_samples
        xp = np.zeros((B, S_pad), np.float32)
        xp[:, :S] = x
        xp = self._pad_batch(xp)
        if progress_callback is not None:
            y = self._run_offline_stepped(xp, alpha, progress_callback)
        else:
            run = self._offline_fn(xp.shape[0], S_pad)
            y, _ = run(self.params, jnp.asarray(xp), jnp.asarray(alpha))
        y = np.asarray(y)

        out = np.zeros_like(x)
        n = min(S, y.shape[1])
        out[:, :n] = y[:B, :n]
        if lengths is not None:
            for i, ln in enumerate(np.asarray(lengths).reshape(-1)):
                out[i, int(ln):] = 0.0
        return out[0] if squeeze else out

    # -- segment-stepped offline path (drives real progress reporting) ---- #

    def _stepped_fns(self, B: int, S: int, T: int):
        key = (B, S, T)
        fns = self._stepped_cache.get(key)
        if fns is not None:
            return fns
        cfg = self.cfg
        window = self._window
        precision = self.precision
        shard, rep = self._batch_specs()

        def front(wav):
            with jax.default_matmul_precision(precision):
                x = jnp.pad(wav, ((0, 0), (0, cfg.win_len)))
                spec = stft_ops.stft_matmul(x, window, cfg.hop, center=True)
                if self.compute_dtype != jnp.float32:
                    spec = spec.astype(self.compute_dtype)
                return spec * jnp.asarray(cfg.wnorm, spec.dtype)

        def seg_step(params, spec_seg, st):
            with jax.default_matmul_precision(precision):
                out, st, lsnr = forward_spec(params, cfg, spec_seg, st)
                return out, st

        def back(spec, out, alpha):
            with jax.default_matmul_precision(precision):
                k = audio_lib.ATTN_LIMIT_NOISY_FRAME_OFFSET
                aligned = jnp.pad(spec, ((0, 0), (k, 0), (0, 0), (0, 0)))[:, :-k]
                out = alpha * aligned.astype(jnp.float32) + \
                    (1.0 - alpha) * out.astype(jnp.float32)
                y = stft_ops.istft_matmul(
                    out / jnp.asarray(cfg.wnorm, jnp.float32),
                    window, cfg.hop, center=True)
                return y[:, 2 * cfg.win_len:].astype(jnp.float32)

        fns = (
            self._compile(front, in_specs=(shard,), out_specs=shard),
            self._compile(seg_step, in_specs=(rep, shard, shard),
                          out_specs=(shard, shard), donate=(2,)),
            self._compile(back, in_specs=(shard, shard, rep), out_specs=shard),
        )
        self._stepped_cache[key] = fns
        return fns

    def _run_offline_stepped(self, xp: np.ndarray, alpha, progress_callback):
        """The offline pipeline as front / per-segment / back device calls.

        Math is identical to the fused single-program path (same per-segment
        op sequence; the scan is simply unrolled across device calls) but the
        host regains control between segments to report progress.
        """
        B, S_pad = xp.shape
        seg = self.seg_frames
        spec_probe = S_pad // self.cfg.hop + 2   # frames after center padding
        front, seg_step, back = self._stepped_fns(B, S_pad, spec_probe)
        spec = front(jnp.asarray(xp))
        T = spec.shape[1]
        n_seg = -(-T // seg)
        spec_p = jnp.pad(spec, ((0, 0), (0, n_seg * seg - T), (0, 0), (0, 0)))
        st = state_lib.init_state(self.cfg, batch=B, dtype=spec.dtype)
        if self.mesh is not None:
            st = self._place_state(st)
        outs = []
        progress_callback(0, T)
        for i in range(n_seg):
            o, st = seg_step(self.params, spec_p[:, i * seg:(i + 1) * seg], st)
            outs.append(o)
            # Materialise a scalar of the segment before reporting: jit
            # dispatch is async, so without a sync the callback would track
            # ENQUEUE rate and hit 100% while the device is still working.
            # (A host checksum, not block_until_ready — the latter returns
            # early through the axon relay.)
            float(jnp.sum(o[:1, -1, :1]))
            progress_callback(min((i + 1) * seg, T), T)
        out = jnp.concatenate(outs, axis=1)[:, :T]
        return back(spec, out, jnp.asarray(np.float32(alpha)))

    # ------------------------------------------------------------------ #
    # Streaming path (sample frames in, overlap-add-ready frames out)
    # ------------------------------------------------------------------ #

    def _stream_ends(self):
        """(front, back) closures for the streaming programs: sample frames
        ``[B, T, win]`` -> scaled spec ``[B, T, F, 2]``, and network output
        spec -> windowed time frames ``[B, T, win]`` (OLA-ready).

        Two DFT lowerings, identical per-frame op sequence either way (so
        exact-mode block-size invariance holds for both):
        ``jnp.fft.rfft``/``irfft`` (default), or the MXU DFT/iDFT GEMMs the
        offline path uses (``DPDFNET_TPU_STREAM_DFT_GEMM=1``; the windows
        and irfft normalisation live inside the matrices).
        """
        cfg = self.cfg
        window = self._window
        cdt = self.compute_dtype
        if _stream_dft_gemm():
            dft = jnp.asarray(stft_ops.dft_matrices(
                cfg.win_len, np.asarray(window)))
            idft = jnp.asarray(stft_ops.idft_matrices(
                cfg.win_len, np.asarray(window)))
            F = cfg.win_len // 2 + 1

            def front(frames):
                out = frames @ dft
                spec = jnp.stack([out[..., :F], out[..., F:]], -1).astype(cdt)
                return spec * jnp.asarray(cfg.wnorm, spec.dtype)

            def back(out):
                out = out.astype(jnp.float32) / jnp.asarray(
                    cfg.wnorm, jnp.float32)
                flat = jnp.concatenate([out[..., 0], out[..., 1]], axis=-1)
                return (flat @ idft).astype(jnp.float32)
        else:
            def front(frames):
                spec = jnp.fft.rfft(frames * window, axis=-1)
                spec = jnp.stack([spec.real, spec.imag], -1).astype(cdt)
                return spec * jnp.asarray(cfg.wnorm, spec.dtype)

            def back(out):
                out = out.astype(jnp.float32) / jnp.asarray(
                    cfg.wnorm, jnp.float32)
                comp = jax.lax.complex(out[..., 0], out[..., 1])
                y = jnp.fft.irfft(comp, n=cfg.win_len, axis=-1) * window
                return y.astype(jnp.float32)
        return front, back

    def _stream_fn(self, B: int, T: int):
        key = (B, T)
        fn = self._stream_cache.get(key)
        if fn is not None:
            return fn
        cfg = self.cfg
        precision = self.precision
        front, back = self._stream_ends()

        def run(params, frames: Array, st):
            # Streaming scans a *single-frame* program over the frame axis so
            # the floating-point op sequence per frame is identical for every
            # chunking — block-size invariance is bit-exact, like the
            # reference's per-frame session calls.  (The offline path instead
            # vectorises over T for throughput.)
            with jax.default_matmul_precision(precision):
                spec = front(frames)

                def body(carry, spec_t):
                    out_t, carry, _ = forward_spec(
                        params, cfg, spec_t[:, None], carry)
                    return carry, out_t[:, 0]

                st, out = jax.lax.scan(body, st, jnp.swapaxes(spec, 0, 1))
                return back(jnp.swapaxes(out, 0, 1)), st

        shard, rep = self._batch_specs()
        run = self._compile(run, in_specs=(rep, shard, shard),
                            out_specs=(shard, shard), donate=(2,))
        self._stream_cache[key] = run
        return run

    def _stream_vec_fn(self, B: int, T: int):
        """Time-vectorised streaming step: ``T`` hops per call through ONE
        ``forward_spec`` invocation (the offline path's per-segment program,
        wrapped with the streaming DFT front/back ends).

        Same math as ``_stream_fn`` — every recurrence carries the same
        state — but convs/GEMMs evaluate over all ``T`` frames at once and
        the EMA norms use the associative scan, so the floating-point
        reduction order differs between chunkings (outputs match the exact
        path to ~1e-5, not bit-exactly).  This is the serving throughput
        mode: a frontend batching a few hops of audio per call amortises the
        per-frame launch overhead that bounds the exact path.
        """
        key = ("vec", B, T)
        fn = self._stream_cache.get(key)
        if fn is not None:
            return fn
        cfg = self.cfg
        precision = self.precision
        front, back = self._stream_ends()

        def run(params, frames: Array, st):
            with jax.default_matmul_precision(precision):
                spec = front(frames)
                out, st, _ = forward_spec(params, cfg, spec, st)
                return back(out), st

        shard, rep = self._batch_specs()
        run = self._compile(run, in_specs=(rep, shard, shard),
                            out_specs=(shard, shard), donate=(2,))
        self._stream_cache[key] = run
        return run

    def _stream_spec_fn(self, B: int, T: int):
        """Streaming step over raw spec frames ``[B, T, F, 2]`` (no STFT):
        the serving-layer entry when the caller already has spectra.  Scans
        per frame, so chunking is bit-invariant like ``_stream_fn``."""
        key = ("spec", B, T)
        fn = self._stream_cache.get(key)
        if fn is not None:
            return fn
        cfg = self.cfg
        precision = self.precision

        def run(params, spec: Array, st):
            with jax.default_matmul_precision(precision):
                def body(carry, spec_t):
                    out_t, carry, _ = forward_spec(
                        params, cfg, spec_t[:, None], carry)
                    return carry, out_t[:, 0]

                st, out = jax.lax.scan(body, st, jnp.swapaxes(spec, 0, 1))
                return jnp.swapaxes(out, 0, 1), st

        shard, rep = self._batch_specs()
        run = self._compile(run, in_specs=(rep, shard, shard),
                            out_specs=(shard, shard), donate=(2,))
        self._stream_cache[key] = run
        return run

    def init_stream_state(self, batch: int = 1):
        st = state_lib.init_state(self.cfg, batch=batch,
                                  dtype=self.compute_dtype)
        if self.compute_dtype != jnp.float32 and _state_f32_hiddens():
            # DPRNN inter-GRU hiddens ride in f32 even under bf16 planes:
            # the kernels compute f32 internally, so a bf16 state forces
            # two standalone bf16<->f32 converts per block per frame on
            # the exact path — profiled round 5 at ~13% of the T==1 step
            # (s512 turbo).  f32 carry makes those casts no-ops and
            # matches the offline path's in-kernel f32 carry.  Conv tails
            # and delay lines stay at compute dtype (they concatenate
            # with the activation planes).
            st["dprnn_erb"] = [h.astype(jnp.float32)
                               for h in st["dprnn_erb"]]
            st["dprnn_df"] = [h.astype(jnp.float32)
                              for h in st["dprnn_df"]]
        if self.mesh is not None:
            if batch % int(self.mesh.size) != 0:
                raise ValueError(
                    f"streaming batch ({batch}) must be a multiple of the "
                    f"mesh size ({self.mesh.size}) on a sharded engine")
            st = self._place_state(st)
        return st

    def process_frames(self, frames: np.ndarray, st, mode: str = "exact"):
        """Process ``[B, T, win_len]`` sample frames; returns time-domain
        windowed frames ready for overlap-add, plus the new state.

        T is internally split into power-of-two buckets so only a handful of
        programs compile regardless of chunking pattern.

        ``mode``:
            ``"exact"`` (default) — per-frame scan; the op sequence per
            frame is identical for every chunking, so outputs are
            bit-invariant to how the stream is chunked.
            ``"throughput"`` — time-vectorised program (one ``forward_spec``
            over all buffered frames).  Same math/state; fp reduction order
            differs across chunkings (~1e-5 vs exact).  Measured on one
            v5e (dpdfnet8_48khz_hr turbo, round 4, 4-8 hops/call): ~19%
            cheaper per hop than exact at 128 streams, ~26% at 256 — the
            h-hop program amortises the T==1 program's per-dispatch fixed
            work, so peak capacity moves from ~1684 streams/chip (exact,
            512 streams) to ~2128 at 256 streams / 40 ms buffering, ~2386
            at 512 / 80 ms.  The serving mode for frontends that batch
            hops per call.
        """
        B, T, _ = frames.shape
        if self.mesh is not None and B % int(self.mesh.size) != 0:
            raise ValueError(
                f"streaming batch ({B}) must be a multiple of the mesh size "
                f"({self.mesh.size}) on a sharded engine")
        if mode not in ("exact", "throughput"):
            raise ValueError(f"unknown streaming mode {mode!r}")
        if T == 0:
            return np.zeros((B, 0, self.cfg.win_len), np.float32), st
        make_fn = (self._stream_vec_fn if mode == "throughput"
                   else self._stream_fn)
        outs = []
        pos = 0
        x = jnp.asarray(frames)
        while pos < T:
            step = 1
            for b in _STREAM_T_BUCKETS:
                if pos + b <= T:
                    step = b
            run = make_fn(B, step)
            y, st = run(self.params, x[:, pos: pos + step], st)
            outs.append(y)
            pos += step
        return np.concatenate([np.asarray(o) for o in outs], axis=1), st
