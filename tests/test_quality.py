"""Tier-accuracy gate machinery (the air-gapped quality substitute)."""

import numpy as np
import jax

from dpdfnet_tpu.config import get_config
from dpdfnet_tpu.models.params import contract_params, init_params
from dpdfnet_tpu.quality import speechlike_test_signal, tier_deviation


def test_contract_params_bounds_spectral_norms():
    cfg = get_config("dpdfnet2")
    params = contract_params(init_params(cfg, seed=0), factor=0.7)

    def check(path, x):
        a = np.asarray(x)
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        if a.ndim < 2 or "erb_fb" in name or "erb_inv_fb" in name:
            return
        s = np.linalg.svd(a.reshape(a.shape[0], -1), compute_uv=False)[0]
        assert s <= 0.7 + 1e-4, (name, s)

    jax.tree_util.tree_map_with_path(check, params)


def test_speechlike_signal_is_deterministic_and_sane():
    a = speechlike_test_signal(0.5, 16000, seed=3, batch=2)
    b = speechlike_test_signal(0.5, 16000, seed=3, batch=2)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (2, 8000)
    rms = np.sqrt((a ** 2).mean())
    assert 0.005 < rms < 0.2          # speech-ish level, not clipping
    assert np.abs(a).max() < 1.0


def test_tier_deviation_runs_and_is_tiny_on_cpu():
    """On CPU every tier computes f32, so deviations are at float noise;
    the real tier table is produced on TPU by tools/tier_accuracy.py."""
    dev = tier_deviation("dpdfnet2", seconds=0.5, batch=1, contract=0.7,
                         tiers=("fast",))
    assert "fast" in dev and "_input_rms" in dev
    assert dev["fast"]["rel_rms"] < 1e-3
    assert dev["fast"]["rms_vs_input_db"] < -60.0
    # perceptual proxies vs the highest tier (STOI 1.0 / SI-SNR +inf-ish
    # when transparent); on CPU both tiers compute f32 so these must be
    # at the transparent end
    assert dev["fast"]["stoi_vs_highest"] > 0.99
    assert dev["fast"]["sisnr_vs_highest_db"] > 40.0


# --------------------------------------------------------------------------- #
# validate_vs_onnx plumbing (fake ORT session — the real gate needs
# onnxruntime + checkpoints, unavailable here)
# --------------------------------------------------------------------------- #

class _FakeOrtInput:
    def __init__(self, name, shape):
        self.name = name
        self.shape = shape


class _FakeOrtOutput:
    def __init__(self, name):
        self.name = name


class _FakeOrtMeta:
    def __init__(self, state_size, e, s):
        self.custom_metadata_map = {
            "state_size": str(state_size),
            "erb_norm_state_size": str(e),
            "spec_norm_state_size": str(s),
            "erb_norm_init": ",".join(["-60.0"] * e),
            "spec_norm_init": ",".join(["0.001"] * s),
        }


class _PassthroughSession:
    """Reference-shaped ORT session: run() echoes the spec frame and state
    (the reference tests' passthrough-session pattern,
    package/tests/test_package_behaviors.py:421-439)."""

    def __init__(self):
        self.calls = 0
        self._meta = _FakeOrtMeta(45424, 32, 96)

    def get_modelmeta(self):
        return self._meta

    def get_inputs(self):
        # 16 kHz family: (F-1)*2 = 320-sample window
        return [_FakeOrtInput("spec", [1, 1, 161, 2]),
                _FakeOrtInput("state", [45424])]

    def get_outputs(self):
        return [_FakeOrtOutput("spec_e"), _FakeOrtOutput("state_out")]

    def run(self, out_names, feed):
        self.calls += 1
        return [feed["spec"], feed["state"]]


def _write_corpus(tmp_path, n_clips=2, seconds=2.0):
    import csv

    from dpdfnet_tpu import audio_io

    rows = []
    for i in range(n_clips):
        x = speechlike_test_signal(seconds, 16000, seed=i)[0]
        p = tmp_path / f"clip{i}.wav"
        audio_io.write_wav(p, x, 16000)
        rows.append({"noisy_path": p.name, "clean_path": p.name})
    csv_p = tmp_path / "corpus.csv"
    with open(csv_p, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["noisy_path", "clean_path"])
        w.writeheader()
        w.writerows(rows)
    return csv_p


def test_validate_vs_onnx_plumbing_pass(tmp_path, monkeypatch):
    """End-to-end through validate_vs_onnx with a passthrough fake session
    and identity tpu enhancement: per-frame state threading, metadata state
    assembly, CSV writing and the PESQ gate all execute; equal fake PESQ
    scores -> PASS (rc 0)."""
    from dpdfnet_tpu import api, metrics, quality

    sess = _PassthroughSession()
    monkeypatch.setattr(quality, "_onnx_session", lambda p: sess)
    monkeypatch.setattr(api, "enhance",
                        lambda audio, sr, **k: np.asarray(audio, np.float32))
    monkeypatch.setattr(metrics, "wb_pesq", lambda c, x, sr: 3.14)

    csv_p = _write_corpus(tmp_path)
    out_csv = tmp_path / "results.csv"
    rc = quality.validate_vs_onnx(str(csv_p), "fake.onnx", model="dpdfnet2",
                                  out_csv=str(out_csv))
    assert rc == 0
    assert sess.calls > 100               # per-frame streaming really ran
    text = out_csv.read_text()
    assert "pesq_tpu" in text and "pesq_onnx" in text


def test_validate_vs_onnx_one_sided_pesq_failure(tmp_path, monkeypatch):
    """A per-clip PESQ failure that hits only ONE system must drop that
    ROW from both averages (regression: nanmean over unlike subsets).
    Fake scores: clip0 tpu=2.0/onnx=FAIL, clip1 tpu=3.0/onnx=3.0 ->
    delta must be 0 (clip1 only), i.e. PASS."""
    from dpdfnet_tpu import api, metrics, quality

    monkeypatch.setattr(quality, "_onnx_session",
                        lambda p: _PassthroughSession())
    monkeypatch.setattr(api, "enhance",
                        lambda audio, sr, **k: np.asarray(audio, np.float32))
    scores = iter([2.0, "fail", 3.0, 3.0])   # tpu0, onnx0, tpu1, onnx1

    def fake_pesq(c, x, sr):
        v = next(scores)
        if v == "fail":
            raise RuntimeError("NoUtterancesError")
        return v

    monkeypatch.setattr(metrics, "wb_pesq", fake_pesq)
    rc = quality.validate_vs_onnx(str(_write_corpus(tmp_path)), "fake.onnx",
                                  model="dpdfnet2")
    assert rc == 0


def test_validate_vs_onnx_all_pesq_missing_fails(tmp_path, monkeypatch):
    """If no row ever produces a PESQ pair the gate must FAIL loudly."""
    from dpdfnet_tpu import api, metrics, quality

    monkeypatch.setattr(quality, "_onnx_session",
                        lambda p: _PassthroughSession())
    monkeypatch.setattr(api, "enhance",
                        lambda audio, sr, **k: np.asarray(audio, np.float32))

    def no_pesq(c, x, sr):
        raise RuntimeError("pesq unavailable")

    monkeypatch.setattr(metrics, "wb_pesq", no_pesq)
    rc = quality.validate_vs_onnx(str(_write_corpus(tmp_path, n_clips=1)),
                                  "fake.onnx", model="dpdfnet2")
    assert rc == 1
