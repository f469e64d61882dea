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
