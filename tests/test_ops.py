"""Unit tests for numeric substrate and NN primitives (vs torch ground truth)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from dpdfnet_tpu.ops import erb as erb_ops
from dpdfnet_tpu.ops import nn as onn
from dpdfnet_tpu.ops import stft as stft_ops
from dpdfnet_tpu.ops import windows


def test_vorbis_window_cola():
    for win in (320, 960):
        w = windows.vorbis_window(win)
        hop = win // 2
        # COLA identity at 50% overlap: w[n]^2 + w[n+hop]^2 == 1
        assert np.allclose(w[:hop] ** 2 + w[hop:] ** 2, 1.0, atol=1e-6)


def test_vorbis_window_matches_reference_formula():
    win = 320
    w = windows.vorbis_window(win)
    half = win / 2
    ref = np.array(
        [np.sin(0.5 * np.pi * np.sin(0.5 * np.pi * (i + 0.5) / half) ** 2)
         for i in range(win)],
        dtype=np.float32,
    )
    assert np.allclose(w, ref, atol=1e-7)


@pytest.mark.parametrize("nfft,fs,minf", [(320, 16000, 1), (960, 48000, 2)])
def test_erb_filterbank_properties(nfft, fs, minf):
    fb = erb_ops.erb_filter_banks(n_filters=32, nfft=nfft, fs=fs, min_nb_freqs=minf)
    assert fb.shape == (32, nfft // 2 + 1)
    # each rfft bin belongs to exactly one band; every band non-empty
    assert np.allclose(fb.sum(0), 1.0)
    assert (fb.sum(1) >= minf).all()
    fwd, inv = erb_ops.erb_fb_and_inverse(nfft, fs, 32, minf)
    assert fwd.shape == (nfft // 2 + 1, 32) and inv.shape == (32, nfft // 2 + 1)
    assert np.allclose(fwd.sum(0), 1.0)


def test_gru_seq_matches_torch():
    torch.manual_seed(0)
    B, T, I, H = 3, 17, 12, 8
    tg = torch.nn.GRU(I, H, batch_first=True)
    x = torch.randn(B, T, I)
    with torch.no_grad():
        y_ref, h_ref = tg(x)
    p = {
        "wi": jnp.asarray(tg.weight_ih_l0.detach().numpy().T),
        "bi": jnp.asarray(tg.bias_ih_l0.detach().numpy()),
        "wh": jnp.asarray(tg.weight_hh_l0.detach().numpy().T),
        "bh": jnp.asarray(tg.bias_hh_l0.detach().numpy()),
    }
    y, h = onn.gru_seq(p, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(y), y_ref.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h), h_ref[0].numpy(), atol=1e-5)


def test_gru_bidir_matches_torch():
    torch.manual_seed(1)
    B, T, C = 2, 9, 6
    tg = torch.nn.GRU(C, C, batch_first=True, bidirectional=True)
    x = torch.randn(B, T, C)
    with torch.no_grad():
        y_ref, _ = tg(x)

    def mk(sfx):
        return {
            "wi": jnp.asarray(getattr(tg, f"weight_ih_l0{sfx}").detach().numpy().T),
            "bi": jnp.asarray(getattr(tg, f"bias_ih_l0{sfx}").detach().numpy()),
            "wh": jnp.asarray(getattr(tg, f"weight_hh_l0{sfx}").detach().numpy().T),
            "bh": jnp.asarray(getattr(tg, f"bias_hh_l0{sfx}").detach().numpy()),
        }

    y = onn.gru_bidir(mk(""), mk("_reverse"), jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(y), y_ref.numpy(), atol=1e-5)


def test_ema_scan_matches_loop():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 33, 5)).astype(np.float32)
    init = rng.normal(size=(5,)).astype(np.float32)
    out = np.asarray(onn.ema_scan(jnp.asarray(x), jnp.asarray(init), 0.98))
    mu = np.broadcast_to(init, (2, 5)).copy()
    for t in range(x.shape[1]):
        mu = 0.98 * mu + 0.02 * x[:, t]
        np.testing.assert_allclose(out[:, t], mu, atol=1e-5)


def test_grouped_linear_matches_torch_loop():
    torch.manual_seed(2)
    G, I, O = 4, 16, 8
    layers = [torch.nn.Linear(I // G, O // G) for _ in range(G)]
    x = torch.randn(3, 7, I)
    with torch.no_grad():
        y_ref = torch.cat(
            [l(x[..., g * (I // G):(g + 1) * (I // G)]) for g, l in enumerate(layers)],
            dim=-1,
        )
    p = {
        "w": jnp.asarray(np.stack([l.weight.detach().numpy().T for l in layers])),
        "b": jnp.asarray(np.concatenate([l.bias.detach().numpy() for l in layers])),
    }
    y = onn.grouped_linear(p, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(y), y_ref.numpy(), atol=1e-5)


def test_layer_norm_matches_torch():
    torch.manual_seed(3)
    ln = torch.nn.LayerNorm(10)
    with torch.no_grad():
        ln.weight.mul_(1.3).add_(0.1)
        ln.bias.add_(0.2)
    x = torch.randn(4, 6, 10)
    with torch.no_grad():
        y_ref = ln(x)
    p = {"g": jnp.asarray(ln.weight.detach().numpy()),
         "b": jnp.asarray(ln.bias.detach().numpy())}
    y = onn.layer_norm(p, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(y), y_ref.numpy(), atol=1e-5)


def test_stft_matches_torch_center():
    torch.manual_seed(4)
    win, hop = 320, 160
    x = torch.randn(2, 3200)
    w = torch.from_numpy(windows.vorbis_window(win))
    ref = torch.stft(x, n_fft=win, hop_length=hop, win_length=win, window=w,
                     center=True, return_complex=True, normalized=False)
    ref = ref.transpose(1, 2)  # [B, T, F]
    got = stft_ops.stft(jnp.asarray(x.numpy()), jnp.asarray(w.numpy()), hop,
                        center=True)
    np.testing.assert_allclose(np.asarray(got[..., 0]), ref.real.numpy(), atol=1e-3)
    np.testing.assert_allclose(np.asarray(got[..., 1]), ref.imag.numpy(), atol=1e-3)


def test_istft_roundtrip_center():
    rng = np.random.default_rng(5)
    win, hop = 320, 160
    w = jnp.asarray(windows.vorbis_window(win))
    x = jnp.asarray(rng.normal(size=(1, 4800)).astype(np.float32))
    spec = stft_ops.stft(x, w, hop, center=True)
    y = stft_ops.istft(spec, w, hop, center=True)
    n = int(y.shape[-1])
    # interior samples reconstruct (edges lack full overlap)
    np.testing.assert_allclose(
        np.asarray(y[0, win: n - win]), np.asarray(x[0, win: n - win]), atol=1e-4
    )


def test_istft_matches_torch():
    torch.manual_seed(6)
    win, hop = 320, 160
    w = torch.from_numpy(windows.vorbis_window(win))
    T = 30
    spec = torch.randn(1, win // 2 + 1, T, dtype=torch.cfloat)
    ref = torch.istft(spec, n_fft=win, hop_length=hop, win_length=win,
                      window=w, center=True, normalized=False)
    spec_ri = np.stack(
        [spec.numpy().real, spec.numpy().imag], axis=-1
    ).transpose(0, 2, 1, 3)
    got = stft_ops.istft(jnp.asarray(spec_ri.astype(np.float32)),
                         jnp.asarray(w.numpy()), hop, center=True)
    n = min(ref.shape[-1], got.shape[-1])
    np.testing.assert_allclose(np.asarray(got[0, :n]), ref[0, :n].numpy(),
                               atol=1e-4)


def test_fuse_separable_preserves_forward():
    """Engine-style fused params (dense convs, freq-major subpixel packing,
    packed bidir intra weights) must match the unfused forward."""
    import jax.numpy as jnp

    from dpdfnet_tpu.config import get_config
    from dpdfnet_tpu.models.dpdfnet import forward_spec
    from dpdfnet_tpu.models.fuse import prepare_inference_params
    from dpdfnet_tpu.models.params import init_params
    from dpdfnet_tpu.models.state import init_state

    rng = np.random.default_rng(0)
    for name in ("dpdfnet2", "dpdfnet2_48khz_hr"):
        cfg = get_config(name)
        params = init_params(cfg, seed=3)
        fused = prepare_inference_params(params, cfg)
        spec = jnp.asarray(
            rng.normal(size=(2, 6, cfg.freq_bins, 2)).astype(np.float32))
        st = init_state(cfg, batch=2)
        out_ref, _, _ = forward_spec(params, cfg, spec, st)
        out_fused, _, _ = forward_spec(fused, cfg, spec, st)
        np.testing.assert_allclose(
            np.asarray(out_fused), np.asarray(out_ref), atol=2e-5,
            err_msg=name)


def test_fuse_conv_transforms_bias():
    """Separable-conv fusion must transform the bias too: the unfused
    epilogue order is bias -> pointwise, so the fused dense conv needs
    b @ pw (regression: the bias was carried over untransformed, shifting
    outputs by b - b@pw for any biased separable checkpoint)."""
    from dpdfnet_tpu.models.fuse import _fuse_conv
    from dpdfnet_tpu.ops.nn import conv_block

    rng = np.random.default_rng(21)
    B, T, F, C = 2, 5, 16, 8
    p = {
        "w": jnp.asarray(rng.normal(size=(2, 3, 1, C)).astype(np.float32) * 0.3),
        "b": jnp.asarray(rng.normal(size=(C,)).astype(np.float32)),
        "pw": {"w": jnp.asarray(
            rng.normal(size=(C, C)).astype(np.float32) * 0.3)},
        "bn": {"scale": jnp.asarray(rng.normal(size=(C,)).astype(np.float32)),
               "shift": jnp.asarray(rng.normal(size=(C,)).astype(np.float32))},
    }
    x = jnp.asarray(rng.normal(size=(B, T, F, C)).astype(np.float32))
    ref, _ = conv_block(p, x, kt=2, kf=3)
    fused = _fuse_conv(dict(p), C)
    assert fused.get("pw") is None
    got, _ = conv_block(fused, x, kt=2, kf=3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_fuse_subpixel_transforms_bias():
    """Same bias contract for the sub-pixel fusion (bias on channel c*s+i
    -> shuffle -> pointwise over c, then freq-major repack)."""
    from dpdfnet_tpu.models.fuse import _fuse_subpixel
    from dpdfnet_tpu.ops.nn import subpixel_block

    rng = np.random.default_rng(22)
    B, T, F, C, s = 2, 4, 10, 8, 2
    p = {
        "w": jnp.asarray(
            rng.normal(size=(1, 3, 1, s * C)).astype(np.float32) * 0.3),
        "b": jnp.asarray(rng.normal(size=(s * C,)).astype(np.float32)),
        "pw": {"w": jnp.asarray(
            rng.normal(size=(C, C)).astype(np.float32) * 0.3)},
        "bn": None,
    }
    x = jnp.asarray(rng.normal(size=(B, T, F, C)).astype(np.float32))
    ref = subpixel_block(p, x, kf=3, fstride=s, act=None)
    fused = _fuse_subpixel(dict(p), C, s)
    assert fused.get("pw") is None and "w_fm" in fused
    got = subpixel_block(fused, x, kf=3, fstride=s, act=None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


import pytest as _pytest


@_pytest.mark.parametrize("F,T,B,C,G,OG", [
    (16, 3, 4, 8, 4, 6),     # whole-f groups (ig = 4*C)
    (6, 3, 4, 8, 4, 5),      # supergroups: ig = 12, C = 8 -> P=3, Q=2
])
def test_grouped_linear_fm_matches_grouped_linear(F, T, B, C, G, OG):
    """grouped_linear_fm contracts the freq-leading plane directly and
    matches grouped_linear on the transposed-and-flattened input (both
    whole-f groups and the supergroup zero-padded form)."""
    import numpy as np
    import jax.numpy as jnp
    from dpdfnet_tpu.ops import nn as onn

    rng = np.random.default_rng(5)
    plane = jnp.asarray(rng.normal(size=(F, T, B, C)).astype(np.float32))
    p = {"w": jnp.asarray(
            rng.normal(size=(G, F * C // G, OG)).astype(np.float32) * 0.2),
         "b": jnp.asarray(rng.normal(size=(G * OG,)).astype(np.float32))}

    flat = jnp.transpose(plane, (2, 1, 0, 3)).reshape(B, T, F * C)
    ref = onn.grouped_linear(p, flat, act="relu")
    got = onn.grouped_linear_fm(p, plane, act="relu")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
