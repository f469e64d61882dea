"""Chunked real-time streaming enhancer.

Behavioural contract matches `/root/reference/package/src/dpdfnet/stream.py`:
arbitrary chunk sizes, causal STFT (center=False) with one-window latency,
Vorbis-COLA overlap-add committing one hop per frame, ``process``/``flush``/
``reset``, internal resampling, and a hard error on mid-stream sample-rate
changes.  Block-size invariance holds bit-exactly because the model state is
carried explicitly and every frame's math is identical regardless of how
frames were grouped into device calls.

Unlike the reference (one ONNX session call per 10 ms frame), all frames
available in a chunk are processed in one compiled call (power-of-two frame
buckets), and the overlap-add is vectorised.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Union

import numpy as np

from .audio import ensure_sample_rate, to_mono
from .zoo import DEFAULT_MODEL


class StreamEnhancer:
    """Process audio chunk-by-chunk while preserving model state across calls.

    Args:
        model: Model name (default: ``"dpdfnet2"``).
        checkpoint_path: Optional path to a custom ``.pth``; overrides *model*.
        verbose: Print model resolution / download progress.
    """

    def __init__(
        self,
        model: str = DEFAULT_MODEL,
        checkpoint_path: Optional[Union[str, Path]] = None,
        verbose: bool = False,
        engine=None,
    ) -> None:
        if engine is None:
            from .api import _get_engine

            engine = _get_engine(model, checkpoint_path, verbose)
        self._engine = engine
        cfg = engine.cfg
        self._model_sr: int = cfg.sample_rate
        self._win_len: int = cfg.win_len
        self._hop_size: int = cfg.hop
        self._input_sr: Optional[int] = None
        # Warm the native host library at setup: its first load() may
        # build libdpdfnet_host.so (seconds) — that must not land on the
        # first hop of a live stream (e.g. inside an audio callback).
        from . import native

        native.load()
        self.reset()

    # ------------------------------------------------------------------ #

    def reset(self) -> None:
        """Reset model state and internal buffers (between independent streams)."""
        self._state = self._engine.init_stream_state(batch=1)
        self._in_buf = np.zeros(0, dtype=np.float32)
        self._ola_tail = np.zeros(self._win_len - self._hop_size, dtype=np.float32)
        self._input_sr = None

    def _bind_stream_rate(self, sample_rate: Optional[int]) -> int:
        """Latch the stream's input sample rate on first use; reject changes."""
        sr = int(sample_rate) if sample_rate is not None else self._model_sr
        if self._input_sr is None:
            self._input_sr = sr
        elif sr != self._input_sr:
            raise ValueError(
                f"This stream was opened at {self._input_sr} Hz but received "
                f"a chunk at {sr} Hz. A StreamEnhancer instance handles one "
                "stream; call reset() (or use a second instance) before "
                "switching sample rates."
            )
        return sr

    def _emit(self, committed: np.ndarray, sr_out: int) -> np.ndarray:
        """Convert committed model-rate samples to the caller's rate."""
        if sr_out != self._model_sr:
            committed = ensure_sample_rate(committed, self._model_sr, sr_out)
        return committed.astype(np.float32, copy=False)

    def _advance(self, model_chunk: np.ndarray) -> np.ndarray:
        """Feed model-rate samples through the engine; return committed
        model-rate output (length = hop x frames completed, possibly 0)."""
        self._in_buf = np.concatenate([self._in_buf, model_chunk])
        win, hop = self._win_len, self._hop_size
        n = self._in_buf.shape[0]
        if n < win:
            return np.zeros(0, dtype=np.float32)
        T = (n - win) // hop + 1

        # frame the buffered samples: [1, T, win]
        idx = np.arange(T)[:, None] * hop + np.arange(win)[None, :]
        frames = self._in_buf[idx][None, ...]

        y, self._state = self._engine.process_frames(frames, self._state)
        y = y[0]                                       # [T, win]

        # Overlap-add at 50% overlap (win == 2*hop): each committed hop is
        # this frame's first half plus the previous frame's second half.
        # Native C++ path when built (bit-identical to the NumPy form).
        from . import native

        committed = native.ola_commit(y, self._ola_tail)
        if committed is None:
            tails = np.concatenate([self._ola_tail[None], y[:-1, hop:]], axis=0)
            committed = (y[:, :hop] + tails).reshape(-1)
            self._ola_tail = y[-1, hop:].copy()
        self._in_buf = self._in_buf[T * hop:]
        return committed

    def process(
        self,
        chunk: np.ndarray,
        sample_rate: Optional[int] = None,
    ) -> np.ndarray:
        """Enhance a chunk; returns enhanced samples (possibly length 0).

        The first output appears once one full window (~20 ms) has been
        buffered; thereafter each completed hop yields ~10 ms of output.
        """
        chunk = to_mono(np.asarray(chunk, dtype=np.float32))
        if chunk.size == 0:
            return np.zeros(0, dtype=np.float32)
        sr_in = self._bind_stream_rate(sample_rate)
        committed = self._advance(ensure_sample_rate(chunk, sr_in, self._model_sr))
        return self._emit(committed, sr_in)

    # ------------------------------------------------------------------ #
    # Mid-stream checkpoint / resume (SURVEY.md §5: the runtime state is a
    # pure value — save/restore continues the stream exactly).  The model
    # state is serialized in the reference's flat layout, so a stream can
    # even be handed over to/from the reference's ONNX runtime.
    # ------------------------------------------------------------------ #

    def save_state(self) -> dict:
        """Snapshot the complete stream state (JSON-free, numpy arrays)."""
        from .models import state as state_lib

        return {
            "model_state": state_lib.flatten_state(self._engine.cfg, self._state),
            "in_buf": self._in_buf.copy(),
            "ola_tail": self._ola_tail.copy(),
            "input_sr": self._input_sr,
        }

    def load_state(self, snapshot: dict) -> None:
        """Restore a snapshot from :meth:`save_state`; the stream continues
        bit-exactly from where it was saved."""
        import jax

        from .models import state as state_lib

        st = state_lib.unflatten_state(
            self._engine.cfg, snapshot["model_state"], batch=1)
        # restore each leaf at the engine's live state dtype (bf16 planes
        # with f32 recurrent hiddens on the turbo tier — see
        # Engine.init_stream_state): a uniformly-f32 tree would trace a
        # second program per shape and diverge from the un-interrupted
        # stream's dtypes
        template = self._engine.init_stream_state(batch=1)
        self._state = jax.tree_util.tree_map(
            lambda x, t: x.astype(t.dtype), st, template)
        self._in_buf = np.asarray(snapshot["in_buf"], np.float32).copy()
        self._ola_tail = np.asarray(snapshot["ola_tail"], np.float32).copy()
        self._input_sr = snapshot["input_sr"]

    def flush(self) -> np.ndarray:
        """Drain the final partial window by zero-padding it to a full frame.

        Works for resampled streams too: the pad is injected directly into
        the model-rate buffer, so it never trips the stream's sample-rate
        latch (the reference raises here, `stream.py:166-200` there).
        Returns at most one hop of enhanced audio (at the stream's input
        rate) and does not reset state.
        """
        if self._in_buf.size == 0:
            return np.zeros(0, dtype=np.float32)
        sr_out = self._input_sr if self._input_sr is not None else self._model_sr
        pad = np.zeros(self._win_len - self._in_buf.shape[0], dtype=np.float32)
        committed = self._advance(pad)
        # Only the leading hop came from real (non-padded) input.
        return self._emit(committed[: self._hop_size], sr_out)
