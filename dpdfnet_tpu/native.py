"""ctypes bindings for the native host library (libdpdfnet_host.so).

The native library accelerates the host-side data path (WAV IO, polyphase
resampling, streaming overlap-add) — the pieces the reference delegates to
libsndfile/librosa's native code.  Every entry point here has a NumPy
fallback in ``audio``/``audio_io``; the loader degrades gracefully when the
library has not been built (``make -C native``).
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


class _WavInfo(ctypes.Structure):
    _fields_ = [
        ("sample_rate", ctypes.c_int32),
        ("channels", ctypes.c_int32),
        ("bits", ctypes.c_int32),
        ("format", ctypes.c_int32),
        ("frames", ctypes.c_int64),
    ]


def _candidate_paths():
    env = os.environ.get("DPDFNET_TPU_NATIVE_LIB")
    if env:
        yield Path(env)
    root = Path(__file__).resolve().parent.parent
    yield root / "native" / "build" / "libdpdfnet_host.so"


def _try_build() -> None:
    """Best-effort on-demand build of the native library.

    The .so is not shipped in the repo (build artifacts stay out of git);
    when a toolchain is present the first import builds it transparently,
    otherwise the NumPy fallbacks carry on.
    """
    import shutil
    import subprocess

    src_dir = Path(__file__).resolve().parent.parent / "native"
    if not (src_dir / "Makefile").is_file():
        return
    make = shutil.which("make")
    if make is None:
        return
    try:
        subprocess.run(
            [make, "-C", str(src_dir)], check=False, timeout=120,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    except (OSError, subprocess.TimeoutExpired):
        pass


def load() -> Optional[ctypes.CDLL]:
    """Load (and memoise) the native library; None when unavailable."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("DPDFNET_TPU_NATIVE") in ("0", "false", "False"):
        return None
    if not any(p.is_file() for p in _candidate_paths()):
        _try_build()
    for path in _candidate_paths():
        if not path.is_file():
            continue
        try:
            lib = ctypes.CDLL(str(path))
            _bind(lib)
        except (OSError, AttributeError):
            # unloadable, or a stale build missing a symbol: degrade to
            # the NumPy fallbacks rather than breaking all audio IO
            continue
        _LIB = lib
        break
    return _LIB


def _bind(lib: ctypes.CDLL) -> None:
    """Declare every entry point's signature (raises AttributeError on a
    stale build missing a symbol — caught by load())."""
    lib.dpdfnet_resample_out_len.restype = ctypes.c_int64
    lib.dpdfnet_resample_out_len.argtypes = [
        ctypes.c_int64, ctypes.c_int, ctypes.c_int]
    lib.dpdfnet_resample.restype = ctypes.c_int64
    lib.dpdfnet_resample.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
    lib.dpdfnet_ola_commit.restype = None
    lib.dpdfnet_ola_commit.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)]
    lib.dpdfnet_wav_info.restype = ctypes.c_int
    lib.dpdfnet_wav_info.argtypes = [ctypes.c_char_p,
                                     ctypes.POINTER(_WavInfo)]
    lib.dpdfnet_wav_read.restype = ctypes.c_int
    lib.dpdfnet_wav_read.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
    lib.dpdfnet_wav_write.restype = ctypes.c_int
    lib.dpdfnet_wav_write.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32]


def available() -> bool:
    return load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def resample(x: np.ndarray, up: int, down: int) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.float32)
    out_len = lib.dpdfnet_resample_out_len(x.shape[0], up, down)
    y = np.empty(out_len, np.float32)
    n = lib.dpdfnet_resample(_fptr(x), x.shape[0], up, down, _fptr(y), out_len)
    if n < 0:
        return None
    return y[:n]


def ola_commit(frames: np.ndarray, tail: np.ndarray) -> Optional[np.ndarray]:
    """50%-overlap OLA: frames [T, win], tail [hop] (updated in place)."""
    lib = load()
    if lib is None:
        return None
    frames = np.ascontiguousarray(frames, np.float32)
    T, win = frames.shape
    out = np.empty(T * (win // 2), np.float32)
    lib.dpdfnet_ola_commit(_fptr(frames), T, win, _fptr(tail), _fptr(out))
    return out


def wav_read(path) -> Optional[Tuple[np.ndarray, int]]:
    lib = load()
    if lib is None:
        return None
    info = _WavInfo()
    if lib.dpdfnet_wav_info(str(path).encode(), ctypes.byref(info)) != 0:
        return None
    total = info.frames * info.channels
    buf = np.empty(total, np.float32)
    if lib.dpdfnet_wav_read(str(path).encode(), _fptr(buf), total) != 0:
        return None
    if info.channels > 1:
        buf = buf.reshape(-1, info.channels)
    return buf, int(info.sample_rate)


def wav_write(path, audio: np.ndarray, sample_rate: int) -> bool:
    lib = load()
    if lib is None:
        return False
    x = np.ascontiguousarray(audio, np.float32)
    frames = x.shape[0]
    channels = 1 if x.ndim == 1 else x.shape[1]
    rc = lib.dpdfnet_wav_write(str(path).encode(), _fptr(x), frames,
                               channels, int(sample_rate))
    return rc == 0
