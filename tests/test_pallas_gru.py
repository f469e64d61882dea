"""Pallas fused-GRU kernel tests (interpreter mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dpdfnet_tpu.ops import nn as onn
from dpdfnet_tpu.ops import pallas_gru


def _params(rng, I, H):
    return {
        "wi": jnp.asarray(rng.normal(size=(I, 3 * H)).astype(np.float32) * 0.3),
        "bi": jnp.asarray(rng.normal(size=(3 * H,)).astype(np.float32) * 0.1),
        "wh": jnp.asarray(rng.normal(size=(H, 3 * H)).astype(np.float32) * 0.3),
        "bh": jnp.asarray(rng.normal(size=(3 * H,)).astype(np.float32) * 0.1),
    }


@pytest.mark.parametrize("reverse", [False, True])
@pytest.mark.parametrize("N,T,I,H", [(40, 13, 8, 8), (16, 24, 16, 8), (8, 5, 8, 16)])
def test_gru_scan_matches_lax_scan(reverse, N, T, I, H):
    rng = np.random.default_rng(0)
    p = _params(rng, I, H)
    x = jnp.asarray(rng.normal(size=(N, T, I)).astype(np.float32))
    h0 = jnp.asarray(rng.normal(size=(N, H)).astype(np.float32) * 0.2)

    ys_ref, hl_ref = onn.gru_seq(p, x, h0=h0, reverse=reverse)
    ys, hl = pallas_gru.gru_scan_tm(
        jnp.swapaxes(x, 0, 1), h0, p["wi"], p["bi"], p["wh"], p["bh"],
        reverse=reverse, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(jnp.swapaxes(ys, 0, 1)), np.asarray(ys_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(hl), np.asarray(hl_ref), atol=1e-5)


def test_gru_scan_row_padding():
    """Rows not divisible by the tile must pad transparently."""
    rng = np.random.default_rng(1)
    I = H = 8
    p = _params(rng, I, H)
    x = jnp.asarray(rng.normal(size=(11, 7, I)).astype(np.float32))
    h0 = jnp.zeros((11, H), jnp.float32)
    ys_ref, hl_ref = onn.gru_seq(p, x, h0=h0)
    ys, hl = pallas_gru.gru_scan_tm(
        jnp.swapaxes(x, 0, 1), h0, p["wi"], p["bi"], p["wh"], p["bh"],
        interpret=True,
    )
    assert ys.shape == (7, 11, H) and hl.shape == (11, H)
    np.testing.assert_allclose(
        np.asarray(jnp.swapaxes(ys, 0, 1)), np.asarray(ys_ref), atol=1e-5)


def test_enabled_env_override(monkeypatch):
    monkeypatch.setenv("DPDFNET_TPU_PALLAS", "0")
    assert not pallas_gru.enabled()
    monkeypatch.setenv("DPDFNET_TPU_PALLAS", "1")
    assert pallas_gru.enabled()
    monkeypatch.delenv("DPDFNET_TPU_PALLAS")
    assert pallas_gru.enabled() == (jax.default_backend() == "tpu")
