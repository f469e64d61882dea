"""Multi-stream serving: many concurrent real-time streams on one device.

The reference serves concurrency with one thread + ONNX session per file
(`/root/reference/package/src/dpdfnet/cli.py:252-311`).  The TPU-native
shape of that workload is a single batched streaming program whose state
tensor carries all live sessions: one device call per hop advances every
stream.  On one v5e chip this sustains hundreds of concurrent real-time
48 kHz streams (see ``runtime.bench.run_stream_bench``).

``MultiStreamEnhancer`` manages a fixed pool of slots.  Each slot behaves
like an independent ``StreamEnhancer`` (same buffering, COLA overlap-add,
flush/reset semantics); slots can be acquired/reset independently while the
device state stays batched.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Union

import numpy as np

from .zoo import DEFAULT_MODEL


class MultiStreamEnhancer:
    """A pool of ``capacity`` concurrent enhancement streams.

    Usage:
        pool = MultiStreamEnhancer(capacity=64, model="dpdfnet2")
        sid = pool.open()
        out = pool.process(sid, chunk)
        ...
        tail = pool.flush(sid); pool.close(sid)

    ``process_many`` advances several streams with one device call per hop
    bucket — the throughput path for a serving frontend that aggregates
    chunks across connections.
    """

    def __init__(
        self,
        capacity: int,
        model: str = DEFAULT_MODEL,
        checkpoint_path=None,
        verbose: bool = False,
        engine=None,
        mode: str = "exact",
    ) -> None:
        """``mode``: ``"exact"`` (bit-invariant per-frame program) or
        ``"throughput"`` (time-vectorised; cheaper per hop when callers
        batch several hops per ``process_many`` call — measured round 4
        at turbo: it lifts peak capacity from ~1684 (exact, 512 streams)
        to ~2386 streams/chip (512 streams x 8 hops/call) — see
        ``runtime.engine.Engine.process_frames`` and
        docs/performance.md)."""
        if engine is None:
            from .api import _get_engine

            engine = _get_engine(model, checkpoint_path, verbose)
        self._engine = engine
        if mode not in ("exact", "throughput"):
            raise ValueError(f"unknown streaming mode {mode!r}")
        self.mode = mode
        cfg = engine.cfg
        self.capacity = int(capacity)
        self._sr = cfg.sample_rate
        self._win = cfg.win_len
        self._hop = cfg.hop
        self._state = engine.init_stream_state(batch=self.capacity)
        self._in_buf: List[np.ndarray] = [
            np.zeros(0, np.float32) for _ in range(self.capacity)]
        self._ola_tail = np.zeros((self.capacity, self._win - self._hop),
                                  np.float32)
        self._open = [False] * self.capacity

        # Slot gather/scatter as single compiled programs (one dispatch
        # each instead of two per state leaf); in the steady-serving case
        # where every slot advances together they are skipped entirely.
        import jax

        self._gather = jax.jit(
            lambda st, idx: jax.tree_util.tree_map(lambda a: a[idx], st))

        def _scatter_fn(st, sub, rows, take):
            return jax.tree_util.tree_map(
                lambda cur, new: cur.at[rows].set(new[take]), st, sub)

        self._scatter = jax.jit(_scatter_fn, donate_argnums=(0,))

    # ------------------------------------------------------------------ #
    # slot management
    # ------------------------------------------------------------------ #

    def open(self) -> int:
        """Acquire a free slot; returns its stream id."""
        for sid in range(self.capacity):
            if not self._open[sid]:
                self._open[sid] = True
                self._reset_slot(sid)
                return sid
        raise RuntimeError(f"all {self.capacity} stream slots are busy")

    def close(self, sid: int) -> None:
        self._check(sid)
        self._open[sid] = False

    def reset(self, sid: int) -> None:
        self._check(sid)
        self._reset_slot(sid)

    def _reset_slot(self, sid: int) -> None:
        # Build the fresh slot through the engine so every leaf matches
        # the pool state's per-leaf dtype (f32 recurrent hiddens under
        # bf16 planes — see Engine.init_stream_state): a mismatched leaf
        # scattered into the tree is an unsafe cast JAX is deprecating
        # into an error.
        fresh = self._engine.init_stream_state(batch=1)

        def put(cur, new):
            return cur.at[sid].set(new[0])

        import jax

        self._state = jax.tree_util.tree_map(put, self._state, fresh)
        self._in_buf[sid] = np.zeros(0, np.float32)
        self._ola_tail[sid] = 0.0

    def _check(self, sid: int) -> None:
        if not (0 <= sid < self.capacity) or not self._open[sid]:
            raise ValueError(f"stream id {sid} is not open")

    # ------------------------------------------------------------------ #
    # processing
    # ------------------------------------------------------------------ #

    def process(self, sid: int, chunk: np.ndarray) -> np.ndarray:
        """Enhance a chunk on one stream (model sample rate)."""
        return self.process_many({sid: chunk})[sid]

    def process_many(
        self, chunks: Dict[int, np.ndarray]
    ) -> Dict[int, np.ndarray]:
        """Advance several streams; one device call per hop count bucket.

        Streams with insufficient buffered audio contribute zero frames and
        return empty arrays.  All frames of all streams in the same call run
        through one batched program (padded to the max frame count).
        """
        from .audio import to_mono

        # Validate and downmix EVERY chunk before touching any buffer: a
        # bad sid late in the dict must not leave earlier streams' buffers
        # already appended (a caller retrying the whole dict would then
        # duplicate audio in live streams).
        staged: Dict[int, np.ndarray] = {}
        for sid, chunk in chunks.items():
            self._check(sid)
            staged[sid] = to_mono(np.asarray(chunk, np.float32))
        for sid, c in staged.items():
            self._in_buf[sid] = np.concatenate([self._in_buf[sid], c])

        import jax.numpy as jnp

        counts = {
            sid: max(0, (len(self._in_buf[sid]) - self._win) // self._hop + 1)
            for sid in chunks
        }
        out: Dict[int, np.ndarray] = {
            sid: np.zeros(0, np.float32) for sid in chunks}

        # Group streams by frame count; each group advances together in one
        # batched call (states gathered/scattered on device).  In steady
        # serving every live stream has the same cadence -> one group.
        groups: Dict[int, List[int]] = {}
        for sid, n in counts.items():
            if n > 0:
                groups.setdefault(n, []).append(sid)

        for n, sids in sorted(groups.items()):
            # slot order is output-independent (the scatter maps rows back
            # by sid); sorting makes the zero-copy identity fast path
            # insensitive to the dict's insertion order
            sids = sorted(sids)
            g = len(sids)
            # Always run the full-capacity batch: one compiled program for
            # the pool's lifetime, and per-slot results independent of which
            # other slots are active (row-deterministic at fixed batch).
            gp = self.capacity
            frames = np.zeros((gp, n, self._win), np.float32)
            fidx = (np.arange(n)[:, None] * self._hop
                    + np.arange(self._win)[None, :])
            for row, sid in enumerate(sids):
                frames[row] = self._in_buf[sid][fidx]

            # Steady serving (every slot advances together, in slot order)
            # needs no state shuffle at all — the hot path is exactly one
            # device call per hop bucket.
            identity = g == gp and sids == list(range(gp))
            if identity:
                y, self._state = self._engine.process_frames(
                    frames, self._state, mode=self.mode)
            else:
                idx = jnp.asarray(np.asarray(sids + [sids[0]] * (gp - g)))
                sub = self._gather(self._state, idx)
                y, sub_new = self._engine.process_frames(
                    frames, sub, mode=self.mode)
                self._state = self._scatter(
                    self._state, sub_new, jnp.asarray(np.asarray(sids)),
                    jnp.asarray(np.arange(g)))

            for row, sid in enumerate(sids):
                yf = np.asarray(y[row])                  # [n, win]
                tails = np.concatenate(
                    [self._ola_tail[sid][None], yf[:-1, self._hop:]], axis=0)
                out[sid] = (yf[:, : self._hop] + tails).reshape(-1)
                self._ola_tail[sid] = yf[-1, self._hop:]
                self._in_buf[sid] = self._in_buf[sid][n * self._hop:]
        return out

    def flush(self, sid: int) -> np.ndarray:
        """Drain the final partial window of one stream (<= one hop)."""
        self._check(sid)
        if self._in_buf[sid].size == 0:
            return np.zeros(0, np.float32)
        pad = np.zeros(self._win - len(self._in_buf[sid]), np.float32)
        out = self.process(sid, pad)
        return out[: min(self._hop, len(out))].astype(np.float32)
