"""Tests for auxiliary ops: multiframe filters, extras, matmul-DFT, grouped GRU."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from conftest import add_reference_paths, reference_available

from dpdfnet_tpu.ops import extras, multiframe, nn as onn, stft as stft_ops
from dpdfnet_tpu.ops.windows import vorbis_window


def test_spec_unfold_and_df_match_reference_module():
    if not reference_available():
        pytest.skip("reference not available")
    add_reference_paths()
    import importlib

    ref_mf = importlib.import_module("onnx_model.multiframe")

    rng = np.random.default_rng(0)
    B, T, F, N, LA = 2, 12, 33, 5, 2
    spec = rng.normal(size=(B, T, F, 2)).astype(np.float32)
    coefs = rng.normal(size=(B, T, N, F, 2)).astype(np.float32)

    # reference offline: unfold [B,C,T,F] complex, einsum with [B,C,N,T,F]
    mod = ref_mf.DF.__mro__[1]  # MultiFrameModule
    ref = mod(num_freqs=F, frame_size=N, lookahead=LA)
    spec_t = torch.view_as_complex(
        torch.from_numpy(spec)).unsqueeze(1)            # [B,1,T,F]
    su = ref.spec_unfold(spec_t)                        # [B,1,T,F,N]
    coefs_t = torch.view_as_complex(
        torch.from_numpy(coefs)).unsqueeze(1)           # [B,1,T? ...]
    # reference df: spec [B,C,T,F,N] x coefs [B,C,N,T,F]
    ref_out = ref_mf.df(su, coefs_t.permute(0, 1, 2, 3, 4).reshape(
        B, 1, T, N, F).permute(0, 1, 3, 2, 4))
    ref_out = torch.view_as_real(ref_out[:, 0]).numpy()

    got_u = multiframe.spec_unfold(jnp.asarray(spec), N, LA)   # [B,T,N,F,2]
    got = multiframe.df(got_u, jnp.asarray(coefs))
    np.testing.assert_allclose(np.asarray(got), ref_out, atol=1e-5)


def test_mf_wiener_inverse_identity():
    """With iRxx = identity, weights == ifc; output = sum_n win_n * ifc_n."""
    rng = np.random.default_rng(1)
    B, T, F, N = 1, 8, 17, 3
    spec = rng.normal(size=(B, T, F, 2)).astype(np.float32)
    ifc = rng.normal(size=(B, T, F, N, 2)).astype(np.float32)
    eye = np.zeros((B, T, F, N, N, 2), np.float32)
    for n in range(N):
        eye[..., n, n, 0] = 1.0
    out = multiframe.mf_wiener(jnp.asarray(spec), jnp.asarray(ifc),
                               jnp.asarray(eye), frame_size=N, num_freqs=F)
    su = multiframe.spec_unfold(jnp.asarray(spec), N, 0)
    sc = jax.lax.complex(su[..., 0], su[..., 1])
    vc = jax.lax.complex(ifc[..., 0], ifc[..., 1])
    expect = jnp.einsum("btnf,btfn->btf", sc, jnp.moveaxis(vc, -1, -1).transpose(0, 1, 2, 3))
    expect = jnp.sum(jnp.moveaxis(sc, 2, -1) * vc, axis=-1)
    np.testing.assert_allclose(
        np.asarray(out[..., 0] + 1j * out[..., 1]), np.asarray(expect),
        atol=1e-4)


def test_mf_mvdr_runs_and_preserves_upper_bins():
    rng = np.random.default_rng(2)
    B, T, F, N, NF = 1, 6, 21, 3, 10
    spec = rng.normal(size=(B, T, F, 2)).astype(np.float32)
    ifc = rng.normal(size=(B, T, NF, N, 2)).astype(np.float32)
    r = rng.normal(size=(B, T, NF, N, N, 2)).astype(np.float32)
    out = multiframe.mf_mvdr(jnp.asarray(spec), jnp.asarray(ifc),
                             jnp.asarray(r), frame_size=N, num_freqs=NF)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_array_equal(np.asarray(out)[:, :, NF:], spec[:, :, NF:])


def test_tik_reg_matches_reference():
    if not reference_available():
        pytest.skip("reference not available")
    add_reference_paths()
    import importlib

    ref_mf = importlib.import_module("onnx_model.multiframe")
    rng = np.random.default_rng(3)
    m = rng.normal(size=(2, 4, 4, 2)).astype(np.float32)
    mt = torch.view_as_complex(torch.from_numpy(m))
    ref = torch.view_as_real(ref_mf._tik_reg(mt, 1e-6, 1e-7)).numpy()
    got = np.asarray(multiframe.tik_reg(jnp.asarray(m), 1e-6, 1e-7))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_power_law_roundtrip_and_angle_grad():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=64).astype(np.float32))
    c = extras.power_law_compression(x, 0.6)
    y = extras.power_law_decompression(c, 0.6)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)

    z = jax.lax.complex(jnp.asarray([1.0, 0.0, 1e-8]),
                        jnp.asarray([1.0, 0.0, 0.0]))
    g = jax.grad(lambda v: jnp.sum(extras.angle(v)), holomorphic=False)
    gv = g(z)
    assert np.isfinite(np.asarray(gv.real)).all()     # robust at ~0 magnitude


def test_local_snr_target_matches_reference():
    if not reference_available():
        pytest.skip("reference not available")
    add_reference_paths()
    import importlib
    import sys

    sys.path.insert(0, "/root/reference/model")
    ref_utils = importlib.import_module("model.utils")
    rng = np.random.default_rng(5)
    clean = rng.normal(size=(2, 40, 33, 2)).astype(np.float32)
    noise = rng.normal(size=(2, 40, 33, 2)).astype(np.float32)

    tgt_ref = ref_utils.LocalSnrTarget(fft_size=320, hop_size=160, sr=16000,
                                       ws=20, db=True,
                                       target_snr_range=(-15, 35))
    ref = tgt_ref(torch.view_as_complex(torch.from_numpy(clean)),
                  torch.view_as_complex(torch.from_numpy(noise))).numpy()

    tgt = extras.LocalSnrTarget(fft_size=320, hop_size=160, sr=16000, ws=20,
                                db=True, target_snr_range=(-15, 35))
    got = np.asarray(tgt(jnp.asarray(clean), jnp.asarray(noise)))
    np.testing.assert_allclose(got, ref, atol=1e-3)


def test_comb_filter_matrix_matches_reference():
    if not reference_available():
        pytest.skip("reference not available")
    add_reference_paths()
    import importlib

    ref_utils = importlib.import_module("model.utils")
    ref = ref_utils.create_comb_filter_matrix(
        pitch_min=80, pitch_max=90, nfft=256, sample_rate=16000,
        output_domain="time").numpy()
    got = extras.create_comb_filter_matrix(
        pitch_min=80, pitch_max=90, nfft=256, sample_rate=16000,
        output_domain="time")
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_stft_matmul_matches_fft():
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(2, 3200)).astype(np.float32))
    w = jnp.asarray(vorbis_window(320))
    a = stft_ops.stft(x, w, 160, center=True)
    b = stft_ops.stft_matmul(x, w, 160, center=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_grouped_gru_matches_torch_grouped_layer():
    if not reference_available():
        pytest.skip("reference not available")
    add_reference_paths()
    import importlib
    import sys

    sys.path.insert(0, "/root/reference/model")
    mods = importlib.import_module("modules")

    torch.manual_seed(7)
    G, C = 4, 16
    layer = mods.GroupedGRULayer(C, C, groups=G, batch_first=True)
    layer.eval()
    x = torch.randn(3, 11, C)
    with torch.no_grad():
        y_ref, h_ref = layer(x)

    ps = []
    for i, gru in enumerate(layer.layers):
        ps.append({
            "wi": jnp.asarray(gru.weight_ih_l0.detach().numpy().T),
            "bi": jnp.asarray(gru.bias_ih_l0.detach().numpy()),
            "wh": jnp.asarray(gru.weight_hh_l0.detach().numpy().T),
            "bh": jnp.asarray(gru.bias_hh_l0.detach().numpy()),
        })
    y, hs = onn.grouped_gru_seq(ps, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(y), y_ref.numpy(), atol=1e-5)


def test_grouped_gru_stack_matches_reference_groupedgru():
    """2-layer GroupedGRU incl. the between-layer channel shuffle
    (model/modules.py:1240-1252)."""
    if not reference_available():
        pytest.skip("reference not available")
    add_reference_paths()
    import importlib
    import sys

    sys.path.insert(0, "/root/reference/model")
    mods = importlib.import_module("modules")

    torch.manual_seed(8)
    G, C, L = 4, 16, 3
    ggru = mods.GroupedGRU(C, C, num_layers=L, groups=G, batch_first=True)
    ggru.eval()
    x = torch.randn(2, 9, C)
    with torch.no_grad():
        y_ref, _ = ggru(x)

    def layer_params(glayer):
        return [{
            "wi": jnp.asarray(g.weight_ih_l0.detach().numpy().T),
            "bi": jnp.asarray(g.bias_ih_l0.detach().numpy()),
            "wh": jnp.asarray(g.weight_hh_l0.detach().numpy().T),
            "bh": jnp.asarray(g.bias_hh_l0.detach().numpy()),
        } for g in glayer.layers]

    h = jnp.asarray(x.numpy())
    for li, glayer in enumerate(ggru.grus):
        h, _ = onn.grouped_gru_seq(layer_params(glayer), h,
                                   shuffle_out=li < L - 1)
    np.testing.assert_allclose(np.asarray(h), y_ref.numpy(), atol=1e-5)


def test_squeezed_gru_group_gru_matches_reference():
    """SqueezedGRU_S with group_gru=2 (the reference's grouped-GRU stack
    selector, model/modules.py:1061-1062) vs our _squeezed_gru via the
    checkpoint converter path; also checks chunked-state invariance."""
    if not reference_available():
        pytest.skip("reference not available")
    add_reference_paths()
    import importlib
    import sys
    from functools import partial

    sys.path.insert(0, "/root/reference/model")
    mods = importlib.import_module("modules")

    from dpdfnet_tpu.models import convert as cv
    from dpdfnet_tpu.models.dpdfnet import _squeezed_gru

    torch.manual_seed(9)
    I, H, O, L = 32, 16, 24, 2
    sq = mods.SqueezedGRU_S(
        I, H, output_size=O, num_layers=L, linear_groups=8,
        batch_first=True, group_gru=2,
        linear_act_layer=partial(torch.nn.ReLU, inplace=True))
    sq.eval()
    x = torch.randn(2, 10, I)
    with torch.no_grad():
        y_ref, _ = sq(x)

    sd = cv._SD({"m." + k: v.detach().numpy()
                 for k, v in sq.state_dict().items()})
    p = jax.tree_util.tree_map(jnp.asarray, cv._squeezed(sd, "m", L, 8, True))

    hs = [jnp.zeros((2, H), jnp.float32) for _ in range(L)]
    y, new_hs = _squeezed_gru(p, jnp.asarray(x.numpy()), hs)
    np.testing.assert_allclose(np.asarray(y), y_ref.numpy(), atol=1e-5)

    # chunked execution with carried state must match the full pass
    y1, hs1 = _squeezed_gru(p, jnp.asarray(x.numpy()[:, :4]), hs)
    y2, _ = _squeezed_gru(p, jnp.asarray(x.numpy()[:, 4:]), hs1)
    np.testing.assert_allclose(
        np.concatenate([np.asarray(y1), np.asarray(y2)], axis=1),
        y_ref.numpy(), atol=1e-5)


def test_full_forward_group_gru_chunk_invariance():
    """A full model with cfg.group_gru=2 runs and its streamed (chunked)
    execution matches the single-pass output.  The reference offers
    group_gru only offline (the streaming graph never wires it); here the
    one forward covers both modes."""
    import dataclasses

    from dpdfnet_tpu.config import get_config
    from dpdfnet_tpu.models import state as state_lib
    from dpdfnet_tpu.models.dpdfnet import forward_spec
    from dpdfnet_tpu.models.params import init_params

    cfg = dataclasses.replace(get_config("dpdfnet2"), group_gru=2)
    params = init_params(cfg, seed=3)
    rng = np.random.default_rng(4)
    spec = jnp.asarray(
        rng.normal(size=(1, 12, cfg.freq_bins, 2)).astype(np.float32) * 0.1)

    st = state_lib.init_state(cfg, batch=1)
    out, _, _ = forward_spec(params, cfg, spec, st)

    st2 = state_lib.init_state(cfg, batch=1)
    outs = []
    for lo, hi in ((0, 5), (5, 6), (6, 12)):
        o, st2, _ = forward_spec(params, cfg, spec[:, lo:hi], st2)
        outs.append(np.asarray(o))
    np.testing.assert_allclose(
        np.concatenate(outs, axis=1), np.asarray(out), atol=1e-5)


def test_comb_filter_matrix_matches_reference_multi_order():
    """Pitches low enough for order >= 1: the periodic-Hann weight recipe
    only differs from the (previously wrong) symmetric one when more than
    one tap survives normalisation (regression: maxdiff was 0.057 here)."""
    if not reference_available():
        pytest.skip("reference not available")
    add_reference_paths()
    import importlib

    ref_utils = importlib.import_module("model.utils")
    kw = dict(pitch_min=65, pitch_max=120, nfft=512, sample_rate=16000)
    # time domain only: the reference's own freq path calls torch.stft
    # without return_complex and raises on torch >= 2 (its freq output
    # has no runnable ground truth here)
    ref = ref_utils.create_comb_filter_matrix(
        output_domain="time", **kw).numpy()
    got = extras.create_comb_filter_matrix(output_domain="time", **kw)
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_angle_grad_matches_native_convention():
    """jax.grad through the robustified angle must equal the native
    arctan2 gradient away from zero magnitude (regression: the backward
    copied torch's OPPOSITE complex-cotangent convention, flipping the
    imaginary part's sign)."""
    z = jax.lax.complex(jnp.asarray([1.0, -0.3, 2.0]),
                        jnp.asarray([2.0, 0.7, -1.5]))
    g_ours = jax.grad(lambda v: jnp.sum(extras.angle(v)))(z)
    g_native = jax.grad(
        lambda v: jnp.sum(jnp.arctan2(v.imag, v.real)))(z)
    np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_native),
                               atol=1e-6)


def _import_reference_mask():
    """Import the reference offline ``Mask`` (model/modules.py) — it uses
    flat sibling imports, so the model/ dir itself must be on sys.path."""
    add_reference_paths()
    import sys

    p = "/root/reference/model"
    if p not in sys.path:
        sys.path.insert(0, p)
    import importlib

    return importlib.import_module("modules").Mask


def test_valin_post_filter_matches_reference_pf():
    """valin_post_filter == reference Mask.pf on random masks in [0, 1]
    (model/modules.py:415-426)."""
    if not reference_available():
        pytest.skip("reference not available")
    RefMask = _import_reference_mask()
    from dpdfnet_tpu.models.dpdfnet import valin_post_filter

    rng = np.random.default_rng(7)
    mask = rng.uniform(0.0, 1.0, size=(2, 1, 9, 32)).astype(np.float32)
    ref = RefMask(torch.eye(32), post_filter=True)
    with torch.no_grad():
        want = ref.pf(torch.from_numpy(mask)).numpy()
    got = np.asarray(valin_post_filter(jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_mask_pf_atten_lim_full_path_matches_reference_forward():
    """pf + per-utterance atten-lim clamp + ERB expansion + apply, end to
    end vs the reference Mask.forward in eval mode
    (model/modules.py:428-449)."""
    if not reference_available():
        pytest.skip("reference not available")
    RefMask = _import_reference_mask()
    from dpdfnet_tpu.models.dpdfnet import (clamp_mask_atten_lim,
                                            valin_post_filter)

    rng = np.random.default_rng(11)
    B, T, F, Fe = 2, 7, 161, 32
    erb_inv = rng.uniform(size=(Fe, F)).astype(np.float32)
    mask = rng.uniform(0.0, 1.0, size=(B, 1, T, Fe)).astype(np.float32)
    spec = rng.normal(size=(B, 1, T, F, 2)).astype(np.float32)
    atten = np.array([6.0, 40.0], np.float32)

    ref = RefMask(torch.from_numpy(erb_inv), post_filter=True)
    ref.eval()
    with torch.no_grad():
        want = ref(torch.from_numpy(spec), torch.from_numpy(mask),
                   atten_lim=torch.from_numpy(atten)).numpy()

    m = valin_post_filter(jnp.asarray(mask[:, 0]))                # [B,T,Fe]
    m = clamp_mask_atten_lim(m, jnp.asarray(atten))
    full = m @ jnp.asarray(erb_inv)                               # [B,T,F]
    got = np.asarray(jnp.asarray(spec[:, 0]) * full[..., None])
    np.testing.assert_allclose(got, want[:, 0], atol=1e-6)


def test_forward_spec_atten_lim_plumbing():
    """atten_lim_db reaches the mask: a 0 dB floor forces gain 1 (output
    = DF over the unmasked delayed spec); a 300 dB floor is a no-op."""
    from dpdfnet_tpu.config import get_config
    from dpdfnet_tpu.models import state as state_lib
    from dpdfnet_tpu.models.params import init_params
    from dpdfnet_tpu.models.dpdfnet import forward_spec

    cfg = get_config("dpdfnet2")
    params = init_params(cfg, seed=3)
    rng = np.random.default_rng(5)
    spec = jnp.asarray(rng.normal(size=(2, 6, cfg.freq_bins, 2))
                       .astype(np.float32))
    st = state_lib.init_state(cfg, 2)

    base, _, _ = forward_spec(params, cfg, spec, st)
    noop, _, _ = forward_spec(params, cfg, spec, st,
                              atten_lim_db=jnp.full((2,), 300.0))
    clamped, _, _ = forward_spec(params, cfg, spec, st,
                                 atten_lim_db=jnp.zeros((2,)))
    # fusion order may shift once the clamp is in the graph: fp-noise only
    np.testing.assert_allclose(np.asarray(noop), np.asarray(base), atol=1e-6)
    assert np.abs(np.asarray(clamped) - np.asarray(base)).max() > 1e-4


def test_post_filter_config_rejected_on_hr():
    from dpdfnet_tpu.config import get_config
    import dataclasses

    cfg16 = dataclasses.replace(get_config("dpdfnet2"), post_filter=True)
    assert cfg16.post_filter
    with pytest.raises(ValueError):
        dataclasses.replace(get_config("dpdfnet2_48khz_hr"), post_filter=True)
