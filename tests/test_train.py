"""Training utilities: gradients flow end-to-end; losses behave."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dpdfnet_tpu.config import get_config
from dpdfnet_tpu.models.params import init_params
from dpdfnet_tpu import train


def _wavs(cfg, seconds=0.12, seed=0):
    rng = np.random.default_rng(seed)
    n = int(seconds * cfg.sample_rate)
    clean = (0.2 * np.sin(2 * np.pi * 300 * np.arange(n) / cfg.sample_rate)
             ).astype(np.float32)
    noisy = clean + 0.1 * rng.normal(size=n).astype(np.float32)
    return (jnp.asarray(noisy)[None], jnp.asarray(clean)[None])


def test_losses_zero_at_identity():
    cfg = get_config("dpdfnet2")
    noisy, clean = _wavs(cfg)
    assert float(train.si_snr_loss(clean, clean)) < -50     # -SNR, huge SNR
    from dpdfnet_tpu.ops import stft as S
    from dpdfnet_tpu.ops.windows import vorbis_window

    w = jnp.asarray(vorbis_window(cfg.win_len))
    spec = S.stft(clean, w, cfg.hop)
    assert float(train.spectral_loss(spec, spec)) < 1e-10


def test_multi_res_loss_orders_noise_levels():
    cfg = get_config("dpdfnet2")
    _, clean = _wavs(cfg, seconds=0.3)
    rng = np.random.default_rng(1)
    light = clean + 0.01 * rng.normal(size=clean.shape).astype(np.float32)
    heavy = clean + 0.2 * rng.normal(size=clean.shape).astype(np.float32)
    l_light = float(train.multi_res_spectral_loss(light, clean))
    l_heavy = float(train.multi_res_spectral_loss(heavy, clean))
    assert 0 < l_light < l_heavy


def test_gradients_flow_through_full_model():
    """value_and_grad through the whole forward (XLA scan path on CPU)."""
    cfg = get_config("dpdfnet2")
    params = init_params(cfg, seed=0)
    noisy, clean = _wavs(cfg)
    (loss, aux), grads = jax.value_and_grad(
        train.enhancement_loss, has_aux=True)(params, cfg, noisy, clean)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert leaves, "no gradient leaves"
    nonzero = sum(float(jnp.abs(g).sum()) > 0 for g in leaves)
    # every parameter group receives gradient signal
    assert nonzero / len(leaves) > 0.9
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)


def test_train_step_reduces_loss():
    import optax

    cfg = get_config("dpdfnet2")
    params = init_params(cfg, seed=0)
    noisy, clean = _wavs(cfg)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    step = train.make_train_step(cfg, opt)
    losses = []
    for _ in range(4):
        params, opt_state, loss, aux = step(params, opt_state, noisy, clean)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_sharded_train_step():
    import optax

    from dpdfnet_tpu.parallel import mesh as pmesh

    cfg = get_config("dpdfnet2")
    params = init_params(cfg, seed=0)
    mesh = pmesh.make_mesh(jax.devices()[:8])
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    step = train.make_train_step(cfg, opt, mesh=mesh)
    rng = np.random.default_rng(2)
    n = cfg.hop * 6
    noisy = jnp.asarray(rng.normal(size=(8, n)).astype(np.float32) * 0.1)
    clean = noisy * 0.8
    params, opt_state, loss, aux = step(params, opt_state, noisy, clean)
    assert np.isfinite(float(loss))
