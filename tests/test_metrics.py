"""Metrics tests: SI-SNR, alignment, native STOI properties, CSV evaluator."""

import numpy as np
import pytest

from dpdfnet_tpu import audio_io, metrics


def _speechlike(n, sr, seed=0):
    """Modulated multi-tone + noise — enough spectro-temporal structure
    for STOI's envelope correlations to be meaningful."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    env = 0.5 * (1 + np.sign(np.sin(2 * np.pi * 4 * t)))
    x = env * (0.4 * np.sin(2 * np.pi * 210 * t)
               + 0.3 * np.sin(2 * np.pi * 840 * t + 0.7)
               + 0.2 * np.sin(2 * np.pi * 2310 * t + 1.1))
    x += 0.01 * rng.normal(size=n)
    return x.astype(np.float32)


def test_si_snr_identity_and_scale_invariance():
    x = _speechlike(16000, 16000)
    assert metrics.si_snr(x, x) > 60
    assert metrics.si_snr(x, 0.5 * x) > 60          # scale invariant
    noisy = x + 0.1 * np.random.default_rng(1).normal(size=x.shape)
    assert 5 < metrics.si_snr(x, noisy) < 30


def test_align_by_xcorr():
    x = _speechlike(16000, 16000)
    delayed = np.concatenate([np.zeros(500, np.float32), x])
    a, b, lag = metrics.align_by_xcorr_trim(x, delayed)
    assert abs(abs(lag) - 500) <= 2
    assert a.shape == b.shape
    assert np.corrcoef(a, b)[0, 1] > 0.99


def test_stoi_perfect_and_degraded():
    sr = 16000
    x = _speechlike(3 * sr, sr)
    s_perfect = metrics.stoi(x, x, sr)
    assert s_perfect > 0.95
    rng = np.random.default_rng(2)
    light = x + 0.05 * rng.normal(size=x.shape).astype(np.float32)
    heavy = x + 0.8 * rng.normal(size=x.shape).astype(np.float32)
    s_light = metrics.stoi(x, light, sr)
    s_heavy = metrics.stoi(x, heavy, sr)
    assert s_perfect >= s_light > s_heavy           # monotonic in noise


def test_stoi_too_short_raises():
    x = _speechlike(1000, 16000)
    with pytest.raises(ValueError):
        metrics.stoi(x, x, 16000)


def test_wb_pesq_gated():
    try:
        import pesq  # noqa: F401

        has_pesq = True
    except ImportError:
        has_pesq = False
    x = _speechlike(16000, 16000)
    if has_pesq:
        assert metrics.wb_pesq(x, x, 16000) > 4.0
    else:
        with pytest.raises(ImportError, match="pesq"):
            metrics.wb_pesq(x, x, 16000)


def test_evaluate_csv(tmp_path):
    import pandas as pd

    sr = 16000
    clean = _speechlike(2 * sr, sr)
    noisy = clean + 0.1 * np.random.default_rng(3).normal(size=clean.shape).astype(np.float32)
    audio_io.write_wav(tmp_path / "clean.wav", clean, sr)
    audio_io.write_wav(tmp_path / "enh.wav", noisy, sr)
    pd.DataFrame([
        {"enhanced_path": "enh.wav", "clean_path": "clean.wav"},
        {"enhanced_path": "missing.wav", "clean_path": "clean.wav"},
    ]).to_csv(tmp_path / "meta.csv", index=False)

    out = metrics.evaluate_csv(str(tmp_path / "meta.csv"))
    res = pd.read_csv(out)
    assert len(res) == 2
    ok = res.iloc[0]
    assert ok["si_snr_db"] > 5
    assert 0 < ok["stoi"] <= 1
    assert "FileNotFoundError" in str(res.iloc[1]["error"])


def test_metrics_cli(tmp_path, capsys):
    import pandas as pd

    sr = 16000
    clean = _speechlike(2 * sr, sr)
    audio_io.write_wav(tmp_path / "c.wav", clean, sr)
    audio_io.write_wav(tmp_path / "e.wav", clean, sr)
    pd.DataFrame([{"enhanced_path": "e.wav", "clean_path": "c.wav"}]).to_csv(
        tmp_path / "m.csv", index=False)
    assert metrics.main([str(tmp_path / "m.csv")]) == 0
    assert "results" in capsys.readouterr().out
