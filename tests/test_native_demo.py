"""Native host library + demo tests (library built on demand if g++ exists)."""

import shutil
import subprocess
from pathlib import Path

import numpy as np
import pytest

from conftest import REPO_ROOT

from dpdfnet_tpu import audio_io, native


@pytest.fixture(scope="module")
def native_lib():
    lib = Path(REPO_ROOT) / "native" / "build" / "libdpdfnet_host.so"
    if not lib.exists():
        if shutil.which("g++") is None and shutil.which("make") is None:
            pytest.skip("no C++ toolchain available")
        subprocess.run(["make", "-C", str(Path(REPO_ROOT) / "native")],
                       check=True, capture_output=True)
    # reset the loader cache in case an earlier test ran without the lib
    native._TRIED = False
    native._LIB = None
    if not native.available():
        pytest.skip("native library failed to load")
    return native


def test_native_resample_matches_scipy(native_lib):
    from scipy.signal import resample_poly

    t = np.arange(16000) / 16000
    x = (0.4 * np.sin(2 * np.pi * 440 * t)
         + 0.2 * np.sin(2 * np.pi * 1330 * t)).astype(np.float32)
    for up, down in ((3, 1), (1, 3), (160, 441), (441, 160)):
        y_n = native_lib.resample(x, up, down)
        y_s = resample_poly(x.astype(np.float64), up, down).astype(np.float32)
        n = min(len(y_n), len(y_s))
        assert abs(len(y_n) - len(y_s)) <= 1
        interior = slice(200, n - 200)
        np.testing.assert_allclose(y_n[interior], y_s[interior], atol=1e-3)


def test_native_wav_roundtrip(native_lib, tmp_path):
    rng = np.random.default_rng(0)
    x = np.clip(0.5 * rng.normal(size=4800), -1, 1).astype(np.float32)
    p = tmp_path / "n.wav"
    assert native_lib.wav_write(p, x, 48000)
    y, sr = native_lib.wav_read(p)
    assert sr == 48000
    np.testing.assert_allclose(y, x, atol=1e-4)
    # python reader decodes the native-written file identically
    y2, sr2 = audio_io.read_wav(p)
    assert sr2 == 48000
    np.testing.assert_array_equal(np.asarray(y2), np.asarray(y))


def test_native_ola_matches_numpy(native_lib):
    rng = np.random.default_rng(1)
    frames = rng.normal(size=(7, 320)).astype(np.float32)
    tail0 = rng.normal(size=160).astype(np.float32)
    tail_n = tail0.copy()
    out_n = native_lib.ola_commit(frames, tail_n)
    tails = np.concatenate([tail0[None], frames[:-1, 160:]], axis=0)
    ref = (frames[:, :160] + tails).reshape(-1)
    np.testing.assert_allclose(out_n, ref, atol=0)
    np.testing.assert_allclose(tail_n, frames[-1, 160:], atol=0)


def test_demo_file_mode(tmp_path, capsys):
    """Headless demo streams a file and reports latency stats."""
    from dpdfnet_tpu import demo
    from dpdfnet_tpu.config import get_config
    from dpdfnet_tpu.models.params import init_params
    from dpdfnet_tpu.runtime.engine import Engine
    from dpdfnet_tpu.stream import StreamEnhancer

    cfg = get_config("dpdfnet2")
    eng = Engine(cfg, init_params(cfg, seed=0))
    t = np.arange(16000) / 16000
    noisy = (0.3 * np.sin(2 * np.pi * 440 * t)
             + 0.05 * np.random.default_rng(0).normal(size=16000)).astype(np.float32)
    src = tmp_path / "in.wav"
    audio_io.write_wav(src, noisy, 16000)

    se = StreamEnhancer(engine=eng)
    out = tmp_path / "out.wav"
    rc = demo._run_file(se, 16000, 160, 1.0, src, out, max_seconds=0.5)
    assert rc == 0
    assert out.exists()
    assert "RTF" in capsys.readouterr().out


def test_demo_live_mode_without_sounddevice(monkeypatch, capsys):
    import sys

    from dpdfnet_tpu import demo
    from dpdfnet_tpu.config import get_config
    from dpdfnet_tpu.models.params import init_params
    from dpdfnet_tpu.runtime.engine import Engine
    from dpdfnet_tpu.stream import StreamEnhancer

    monkeypatch.setitem(sys.modules, "sounddevice", None)
    cfg = get_config("dpdfnet2")
    se = StreamEnhancer(engine=Engine(cfg, init_params(cfg, seed=0)))
    rc = demo._run_live(se, 16000, 160, 1.0)
    assert rc == 2
    assert "sounddevice" in capsys.readouterr().err


def test_termviz_renders_ansi_lines():
    """TerminalSpectrogram emits one self-contained ANSI line per hop."""
    import io

    from dpdfnet_tpu.termviz import TerminalSpectrogram, _band_edges

    edges = _band_edges(257, 36)
    assert len(edges) == 37
    assert (np.diff(edges) >= 1).all()

    buf = io.StringIO()
    viz = TerminalSpectrogram(16000, bands=36, n_fft=512, hop=512, out=buf)
    rng = np.random.default_rng(0)
    noisy = rng.normal(size=2048).astype(np.float32) * 0.1
    enhanced = noisy * 0.3
    printed = viz.feed(noisy, enhanced)
    assert printed == 4  # 2048 samples, 512-window/512-hop -> 4 full frames
    lines = buf.getvalue().splitlines()
    assert "noisy" in lines[0] and "enhanced" in lines[0]
    for line in lines[1:]:
        # 2 panels x 36 background-colored cells, each panel reset-terminated
        assert line.count("\x1b[48;5;") == 72
        assert line.count("\x1b[0m") == 2
    # louder signal maps to brighter (higher ramp index) cells than silence
    loud = viz.render_line(np.full(512, 0.5, np.float32),
                           np.zeros(512, np.float32))
    left, right = loud.split("|")
    assert left != right


def test_demo_file_mode_spectrogram(tmp_path, capsys):
    """--spectrogram path prints spectrogram lines alongside latency stats."""
    from dpdfnet_tpu import demo
    from dpdfnet_tpu.config import get_config
    from dpdfnet_tpu.models.params import init_params
    from dpdfnet_tpu.runtime.engine import Engine
    from dpdfnet_tpu.stream import StreamEnhancer
    from dpdfnet_tpu.termviz import TerminalSpectrogram

    cfg = get_config("dpdfnet2")
    eng = Engine(cfg, init_params(cfg, seed=0))
    noisy = np.random.default_rng(1).normal(size=8000).astype(np.float32) * 0.1
    src = tmp_path / "in.wav"
    audio_io.write_wav(src, noisy, 16000)

    se = StreamEnhancer(engine=eng)
    import io as _io

    vout = _io.StringIO()
    viz = TerminalSpectrogram(16000, n_fft=512, hop=1280, out=vout)
    rc = demo._run_file(se, 16000, 160, 1.0, src, None, max_seconds=None,
                        viz=viz)
    assert rc == 0
    assert "RTF" in capsys.readouterr().out
    assert vout.getvalue().count("\x1b[48;5;") > 0
