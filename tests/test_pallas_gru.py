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
        reverse=reverse, precision="highest", interpret=True,
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
        precision="highest", interpret=True,
    )
    assert ys.shape == (7, 11, H) and hl.shape == (11, H)
    np.testing.assert_allclose(
        np.asarray(jnp.swapaxes(ys, 0, 1)), np.asarray(ys_ref), atol=1e-5)


@pytest.mark.parametrize("N,T,I,H", [(40, 13, 8, 8), (16, 24, 16, 8), (11, 7, 8, 8)])
def test_gru_bidir_fused_matches_two_scans(N, T, I, H):
    rng = np.random.default_rng(2)
    p_fw = _params(rng, I, H)
    p_bw = _params(rng, I, H)
    x = jnp.asarray(rng.normal(size=(N, T, I)).astype(np.float32))

    y_fw, _ = onn.gru_seq(p_fw, x)
    y_bw, _ = onn.gru_seq(p_bw, x, reverse=True)
    ref = jnp.concatenate([y_fw, y_bw], axis=-1)

    wi2, wh2, b2 = pallas_gru._pack_bidir(p_fw, p_bw, jnp.float32)
    ys_f, ys_b = pallas_gru.gru_bidir_tm(
        jnp.swapaxes(x, 0, 1), wi2, wh2, b2, precision="highest", interpret=True)
    got = jnp.concatenate(
        [jnp.swapaxes(ys_f, 0, 1), jnp.swapaxes(ys_b, 0, 1)], axis=-1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_enabled_env_override(monkeypatch):
    monkeypatch.setenv("DPDFNET_TPU_PALLAS", "0")
    assert not pallas_gru.enabled()
    monkeypatch.setenv("DPDFNET_TPU_PALLAS", "1")
    assert pallas_gru.enabled()
    monkeypatch.delenv("DPDFNET_TPU_PALLAS")
    assert pallas_gru.enabled() == (jax.default_backend() == "tpu")


def _lnp(rng, C):
    return (
        jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.5 + 1.0),
        jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.1),
    )


@pytest.mark.parametrize("N,T,C", [(20, 13, 8), (11, 5, 16)])
def test_dprnn_intra_block_kernel(N, T, C):
    """Fused intra stage == gru_bidir + linear + layer_norm + residual."""
    rng = np.random.default_rng(3)
    p_fw, p_bw = _params(rng, C, C), _params(rng, C, C)
    wfc = jnp.asarray(rng.normal(size=(2 * C, C)).astype(np.float32) * 0.3)
    bfc = jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.1)
    g, bln = _lnp(rng, C)
    x = jnp.asarray(rng.normal(size=(N, T, C)).astype(np.float32))

    yi = onn.gru_bidir(p_fw, p_bw, x)
    yi = onn.layer_norm({"g": g, "b": bln}, onn.linear({"w": wfc, "b": bfc}, yi))
    ref = x + yi

    wi2, wh2, b2 = pallas_gru._pack_bidir(p_fw, p_bw, jnp.float32)
    got = pallas_gru.dprnn_intra_block(
        x, wi2, wh2, b2, wfc, bfc, g, bln, precision="highest", interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("N,T,C", [(20, 13, 8), (11, 16, 16), (20, 16, 8)])
@pytest.mark.parametrize("dt", [jnp.float32, jnp.bfloat16])
def test_dprnn_intra_block_tm_kernel(N, T, C, dt):
    """Freq-leading intra kernel == the row-major fused intra kernel
    (same packed weights, x fed scan-axis-leading, row-major out)."""
    rng = np.random.default_rng(9)
    p_fw, p_bw = _params(rng, C, C), _params(rng, C, C)
    wfc = jnp.asarray(rng.normal(size=(2 * C, C)).astype(np.float32) * 0.3)
    bfc = jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.1)
    g, bln = _lnp(rng, C)
    x = jnp.asarray(rng.normal(size=(N, T, C)).astype(np.float32)).astype(dt)

    wi2, wh2, b2 = pallas_gru._pack_bidir(p_fw, p_bw, jnp.float32)
    ref = pallas_gru.dprnn_intra_block(
        x, wi2, wh2, b2, wfc, bfc, g, bln,
        precision="highest", interpret=True)
    got = pallas_gru.dprnn_intra_block_tm(
        jnp.swapaxes(x, 0, 1), wi2, wh2, b2, wfc, bfc, g, bln,
        precision="highest", interpret=True)
    assert got.dtype == x.dtype and got.shape == (N, T, C)
    atol = 3e-2 if dt == jnp.bfloat16 else 1e-5
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=atol)


@pytest.mark.parametrize("Tt,B,Fq,C", [(5, 4, 16, 8), (3, 8, 13, 8)])
def test_dprnn_intra_block_tm_fm_mode(Tt, B, Fq, C):
    """fm_batch out == row-major out rearranged to the f-major 4-D plane."""
    rng = np.random.default_rng(10)
    p_fw, p_bw = _params(rng, C, C), _params(rng, C, C)
    wfc = jnp.asarray(rng.normal(size=(2 * C, C)).astype(np.float32) * 0.3)
    bfc = jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.1)
    g, bln = _lnp(rng, C)
    x = jnp.asarray(
        rng.normal(size=(Fq, Tt * B, C)).astype(np.float32))

    wi2, wh2, b2 = pallas_gru._pack_bidir(p_fw, p_bw, jnp.float32)
    ref = pallas_gru.dprnn_intra_block_tm(
        x, wi2, wh2, b2, wfc, bfc, g, bln,
        precision="highest", interpret=True)           # [Tt*B, Fq, C]
    got = pallas_gru.dprnn_intra_block_tm(
        x, wi2, wh2, b2, wfc, bfc, g, bln,
        precision="highest", interpret=True, fm_batch=B)
    assert got.shape == (Tt, Fq, B, C)
    ref4 = np.asarray(ref).reshape(Tt, B, Fq, C).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(got), ref4, atol=1e-5)


@pytest.mark.parametrize("pack", [False, True])
def test_dprnn_inter_block_fm_mode(pack):
    """fm_batch out == time-leading out rearranged to [Fq, T, B, C]."""
    Fq, B, T, C = 12, 4, 6, 8
    rng = np.random.default_rng(11)
    p = _params(rng, C, C)
    wfc = jnp.asarray(rng.normal(size=(C, C)).astype(np.float32) * 0.3)
    bfc = jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.1)
    g, bln = _lnp(rng, C)
    x = jnp.asarray(rng.normal(size=(T, Fq * B, C)).astype(np.float32))
    h0 = jnp.asarray(rng.normal(size=(Fq * B, C)).astype(np.float32) * 0.2)

    ref, hl_ref = pallas_gru.dprnn_inter_block(
        x, h0, p["wi"], p["bi"], p["wh"], p["bh"], wfc, bfc, g, bln,
        precision="highest", interpret=True, pack=pack)
    got, hl = pallas_gru.dprnn_inter_block(
        x, h0, p["wi"], p["bi"], p["wh"], p["bh"], wfc, bfc, g, bln,
        precision="highest", interpret=True, pack=pack, fm_batch=B)
    assert got.shape == (Fq, T, B, C)
    ref4 = np.asarray(ref).reshape(T, Fq, B, C).transpose(1, 0, 2, 3)
    np.testing.assert_allclose(np.asarray(got), ref4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hl), np.asarray(hl_ref),
                               atol=1e-5)


@pytest.mark.parametrize("fm", [False, True])
def test_dprnn_inter_block_deferred_tail(monkeypatch, fm):
    """DPDFNET_TPU_INTER_DEFER (fc+LN+residual as an XLA pass outside the
    kernel) matches the fused in-kernel tail exactly at highest
    precision, in both row layouts."""
    Fq, B, T, C = 12, 4, 8, 8
    rng = np.random.default_rng(17)
    p = _params(rng, C, C)
    wfc = jnp.asarray(rng.normal(size=(C, C)).astype(np.float32) * 0.3)
    bfc = jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.1)
    g, bln = _lnp(rng, C)
    x = jnp.asarray(rng.normal(size=(T, Fq * B, C)).astype(np.float32))
    h0 = jnp.asarray(rng.normal(size=(Fq * B, C)).astype(np.float32) * 0.2)
    kw = dict(precision="highest", interpret=True, pack=True, ts=4)
    if fm:
        kw["fm_batch"] = B

    monkeypatch.setenv("DPDFNET_TPU_INTER_DEFER", "0")
    ref, hl_ref = pallas_gru.dprnn_inter_block(
        x, h0, p["wi"], p["bi"], p["wh"], p["bh"], wfc, bfc, g, bln, **kw)
    monkeypatch.setenv("DPDFNET_TPU_INTER_DEFER", "1")
    got, hl = pallas_gru.dprnn_inter_block(
        x, h0, p["wi"], p["bi"], p["wh"], p["bh"], wfc, bfc, g, bln, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(hl), np.asarray(hl_ref),
                               atol=1e-6)


def test_dprnn_fused_stack_intra_tm(monkeypatch):
    """The fused DPRNN stack is invariant to the intra-kernel layout
    (DPDFNET_TPU_INTRA_TM handles its own transposes)."""
    from dpdfnet_tpu.models import dpdfnet as md

    rng = np.random.default_rng(12)
    B, T, Fq, C, K = 32, 2, 16, 8, 2    # B >= 32: the fm chain engages
    # (B was 8 until round 4 — the tm floor raised to 32 in e88c1bf made
    # that compare two identical row-major runs)
    blocks, hs = [], []
    for _ in range(K):
        p_fw, p_bw = _params(rng, C, C), _params(rng, C, C)
        wfc = jnp.asarray(
            rng.normal(size=(2 * C, C)).astype(np.float32) * 0.3)
        bfc = jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.1)
        gi, bi = _lnp(rng, C)
        gg = _params(rng, C, C)
        wfc2 = jnp.asarray(
            rng.normal(size=(C, C)).astype(np.float32) * 0.3)
        bfc2 = jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.1)
        g2, b2_ = _lnp(rng, C)
        wi2, wh2, b2 = pallas_gru._pack_bidir(p_fw, p_bw, jnp.float32)
        blocks.append({
            "intra": {"packed": {"wi2": wi2, "wh2": wh2, "b2": b2},
                      "fc": {"w": wfc, "b": bfc},
                      "ln": {"g": gi, "b": bi}},
            "inter": {"gru": gg, "fc": {"w": wfc2, "b": bfc2},
                      "ln": {"g": g2, "b": b2_}},
        })
        hs.append(jnp.zeros((B, Fq, C), jnp.float32))
    x = jnp.asarray(rng.normal(size=(B, T, Fq, C)).astype(np.float32))

    monkeypatch.setenv("DPDFNET_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("DPDFNET_TPU_INTRA_TM", "0")
    ref, hs_ref = md._dprnn_fused(blocks, x, hs)
    monkeypatch.setenv("DPDFNET_TPU_INTRA_TM", "1")
    got, hs_got = md._dprnn_fused(blocks, x, hs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    for a, b in zip(hs_got, hs_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.parametrize("N,T,C", [(20, 13, 8), (11, 5, 16)])
def test_dprnn_inter_block_kernel(N, T, C):
    """Fused inter stage == gru_seq + linear + layer_norm + residual."""
    rng = np.random.default_rng(4)
    p = _params(rng, C, C)
    wfc = jnp.asarray(rng.normal(size=(C, C)).astype(np.float32) * 0.3)
    bfc = jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.1)
    g, bln = _lnp(rng, C)
    x = jnp.asarray(rng.normal(size=(N, T, C)).astype(np.float32))
    h0 = jnp.asarray(rng.normal(size=(N, C)).astype(np.float32) * 0.2)

    yt, hl_ref = onn.gru_seq(p, x, h0=h0)
    yt = onn.layer_norm({"g": g, "b": bln}, onn.linear({"w": wfc, "b": bfc}, yt))
    ref = x + yt

    out, hl = pallas_gru.dprnn_inter_block(
        jnp.swapaxes(x, 0, 1), h0, p["wi"], p["bi"], p["wh"], p["bh"],
        wfc, bfc, g, bln, precision="highest", interpret=True)
    np.testing.assert_allclose(
        np.asarray(jnp.swapaxes(out, 0, 1)), np.asarray(ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(hl), np.asarray(hl_ref), atol=1e-5)


@pytest.mark.parametrize("B,T,Fq,C,K,kmax",
                         [(2, 5, 13, 8, 3, 2),     # CH=1 walk, K split
                          (3, 4, 16, 16, 2, 4)])   # CH=8 walk, single call
def test_dprnn_stack_kernel(B, T, Fq, C, K, kmax):
    """Merged stack kernel == K x (intra + inter) block compositions."""
    rng = np.random.default_rng(6)
    blocks = []
    for _ in range(K):
        p_fw, p_bw = _params(rng, C, C), _params(rng, C, C)
        blocks.append({
            "intra": {
                "fw": p_fw, "bw": p_bw,
                "packed": dict(zip(
                    ("wi2", "wh2", "b2"),
                    pallas_gru._pack_bidir(p_fw, p_bw, jnp.float32))),
                "fc": {"w": jnp.asarray(
                    rng.normal(size=(2 * C, C)).astype(np.float32) * 0.3),
                    "b": jnp.asarray(
                        rng.normal(size=(C,)).astype(np.float32) * 0.1)},
                "ln": dict(zip(("g", "b"), _lnp(rng, C))),
            },
            "inter": {
                "gru": _params(rng, C, C),
                "fc": {"w": jnp.asarray(
                    rng.normal(size=(C, C)).astype(np.float32) * 0.3),
                    "b": jnp.asarray(
                        rng.normal(size=(C,)).astype(np.float32) * 0.1)},
                "ln": dict(zip(("g", "b"), _lnp(rng, C))),
            },
        })
    x = jnp.asarray(rng.normal(size=(B, T, Fq, C)).astype(np.float32))
    hs = [jnp.asarray(rng.normal(size=(B, Fq, C)).astype(np.float32) * 0.2)
          for _ in range(K)]

    from dpdfnet_tpu.models.dpdfnet import _dprnn_block

    ref, ref_hs = x, []
    for p, h in zip(blocks, hs):
        ref, h_new = _dprnn_block(p, ref, h)
        ref_hs.append(h_new)

    out, hl = pallas_gru.dprnn_stack(
        jnp.swapaxes(x, 0, 1), jnp.stack(hs), pallas_gru.pack_stack(blocks),
        precision="highest", interpret=True, k_max=kmax)
    np.testing.assert_allclose(
        np.asarray(jnp.swapaxes(out, 0, 1)), np.asarray(ref), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(hl), np.asarray(jnp.stack(ref_hs)), atol=2e-5)


def test_fused_dprnn_stack_forward(monkeypatch):
    """forward_spec with the fused time-major DPRNN stack (interpret mode)
    matches the plain XLA path, outputs and carried state.

    Pinned to 'highest' (exact f32 on both sides — the 'high' tier is
    bf16_3x whose accumulation order differs between the kernel and XLA);
    the v2 path is covered by test_fused_dprnn_stack_forward_v2."""
    from dpdfnet_tpu.config import get_config
    from dpdfnet_tpu.models.dpdfnet import forward_spec
    from dpdfnet_tpu.models.fuse import fuse_separable, pack_dprnn_bidir
    from dpdfnet_tpu.models.params import init_params
    from dpdfnet_tpu.models.state import init_state

    rng = np.random.default_rng(5)
    cfg = get_config("dpdfnet2")
    params = init_params(cfg, seed=3)
    fused = pack_dprnn_bidir(fuse_separable(params, cfg), cfg)
    spec = jnp.asarray(
        rng.normal(size=(2, 6, cfg.freq_bins, 2)).astype(np.float32))
    st = init_state(cfg, batch=2)

    out_ref, st_ref, _ = forward_spec(params, cfg, spec, st)

    monkeypatch.setenv("DPDFNET_TPU_PALLAS", "1")
    monkeypatch.setenv("DPDFNET_TPU_PALLAS_INTERPRET", "1")
    with jax.default_matmul_precision("highest"):
        out_f, st_f, _ = forward_spec(fused, cfg, spec, st)

    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_ref), atol=3e-5)
    for a, b in zip(jax.tree_util.tree_leaves(st_f),
                    jax.tree_util.tree_leaves(st_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


@pytest.mark.parametrize("N,T,C", [(20, 13, 8), (11, 5, 16)])
@pytest.mark.parametrize("xp_bf16", [False, True])
def test_dprnn_intra_block_v2_kernel(N, T, C, xp_bf16):
    """v2 (hoisted xp + fc folded into the walk) == the same composition;
    exact with f32 xp storage, bf16-rounded with the default bf16 storage."""
    rng = np.random.default_rng(6)
    p_fw, p_bw = _params(rng, C, C), _params(rng, C, C)
    wfc = jnp.asarray(rng.normal(size=(2 * C, C)).astype(np.float32) * 0.3)
    bfc = jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.1)
    g, bln = _lnp(rng, C)
    x = jnp.asarray(rng.normal(size=(N, T, C)).astype(np.float32))

    yi = onn.gru_bidir(p_fw, p_bw, x)
    yi = onn.layer_norm({"g": g, "b": bln}, onn.linear({"w": wfc, "b": bfc}, yi))
    ref = x + yi

    wi2, wh2, b2 = pallas_gru._pack_bidir(p_fw, p_bw, jnp.float32)
    wi_cat, wh_big = pallas_gru.pack_intra_v2({"wi2": wi2, "wh2": wh2}, wfc)
    got = pallas_gru.dprnn_intra_block_v2(
        x, wi_cat, wh_big, b2, bfc, g, bln,
        precision="highest", interpret=True, xp_bf16=xp_bf16)
    atol = 5e-2 if xp_bf16 else 1e-5
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=atol)


@pytest.mark.parametrize("N,T,C", [(20, 13, 8), (11, 5, 16)])
def test_dprnn_inter_block_v2_kernel(N, T, C):
    """v2 (external xp, fc deferred into the recurrence dot) is exact."""
    rng = np.random.default_rng(7)
    p = _params(rng, C, C)
    wfc = jnp.asarray(rng.normal(size=(C, C)).astype(np.float32) * 0.3)
    bfc = jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.1)
    g, bln = _lnp(rng, C)
    x = jnp.asarray(rng.normal(size=(N, T, C)).astype(np.float32))
    h0 = jnp.asarray(rng.normal(size=(N, C)).astype(np.float32) * 0.2)

    yt, hl_ref = onn.gru_seq(p, x, h0=h0)
    yt = onn.layer_norm({"g": g, "b": bln}, onn.linear({"w": wfc, "b": bfc}, yt))
    ref = x + yt

    x_tm = jnp.swapaxes(x, 0, 1)
    xp_tm = x_tm @ p["wi"] + p["bi"]
    whfc = jnp.concatenate([p["wh"], wfc], axis=1)
    out, hl = pallas_gru.dprnn_inter_block_v2(
        xp_tm, x_tm, h0, whfc, p["bh"], bfc, g, bln, precision="highest", interpret=True)
    np.testing.assert_allclose(
        np.asarray(jnp.swapaxes(out, 0, 1)), np.asarray(ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(hl), np.asarray(hl_ref), atol=1e-5)


def test_pick_tile_divisors():
    """Row tiling splits into near-equal multiples of 8, no 2x padding."""
    for N, cap in [(2560, 2048), (3072, 2048), (1280, 2048), (11, 2048),
                   (4096, 2048), (2049, 2048)]:
        tile = pallas_gru._pick_tile(N, cap)
        assert tile <= cap and tile % 8 == 0 or tile == max(8, N)
        n_pad = (-N) % tile
        assert n_pad < max(tile, 16), (N, cap, tile, n_pad)
        # waste bounded: padding never doubles the work
        assert (N + n_pad) <= 2 * N


def test_fused_dprnn_stack_forward_v2(monkeypatch):
    """forward_spec on the (env-gated) v2 inter-kernel path matches the
    plain XLA path within the fast tier's bf16 tolerance."""
    monkeypatch.setenv("DPDFNET_TPU_PALLAS_V2", "1")
    from dpdfnet_tpu.config import get_config
    from dpdfnet_tpu.models.dpdfnet import forward_spec
    from dpdfnet_tpu.models.fuse import prepare_inference_params
    from dpdfnet_tpu.models.params import init_params
    from dpdfnet_tpu.models.state import init_state

    rng = np.random.default_rng(8)
    cfg = get_config("dpdfnet2")
    params = init_params(cfg, seed=3)
    fused = prepare_inference_params(params, cfg)
    spec = jnp.asarray(
        rng.normal(size=(2, 6, cfg.freq_bins, 2)).astype(np.float32))
    st = init_state(cfg, batch=2)

    out_ref, st_ref, _ = forward_spec(params, cfg, spec, st)

    monkeypatch.setenv("DPDFNET_TPU_PALLAS", "1")
    monkeypatch.setenv("DPDFNET_TPU_PALLAS_INTERPRET", "1")
    out_f, st_f, _ = forward_spec(fused, cfg, spec, st)

    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_ref), atol=2e-2)
    for a, b in zip(jax.tree_util.tree_leaves(st_f),
                    jax.tree_util.tree_leaves(st_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-2)


@pytest.mark.parametrize("T,ts", [(12, 4), (16, 8), (10, 8)])
def test_dprnn_inter_block_kernel_multi_step(monkeypatch, T, ts):
    """TS > 1 (multiple recurrence steps per grid cell) is exact, including
    the fallback halving when TS does not divide T."""
    monkeypatch.setenv("DPDFNET_TPU_INTER_TS", str(ts))
    rng = np.random.default_rng(11)
    N, C = 9, 8
    p = _params(rng, C, C)
    wfc = jnp.asarray(rng.normal(size=(C, C)).astype(np.float32) * 0.3)
    bfc = jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.1)
    g, bln = _lnp(rng, C)
    x = jnp.asarray(rng.normal(size=(N, T, C)).astype(np.float32))
    h0 = jnp.asarray(rng.normal(size=(N, C)).astype(np.float32) * 0.2)

    yt, hl_ref = onn.gru_seq(p, x, h0=h0)
    yt = onn.layer_norm({"g": g, "b": bln}, onn.linear({"w": wfc, "b": bfc}, yt))
    ref = x + yt

    out, hl = pallas_gru.dprnn_inter_block(
        jnp.swapaxes(x, 0, 1), h0, p["wi"], p["bi"], p["wh"], p["bh"],
        wfc, bfc, g, bln, precision="highest", interpret=True)
    np.testing.assert_allclose(
        np.asarray(jnp.swapaxes(out, 0, 1)), np.asarray(ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(hl), np.asarray(hl_ref), atol=1e-5)


@pytest.mark.parametrize("T,dt", [(16, "float32"), (16, "bfloat16"),
                                  (40, "float32"), (13, "bfloat16")])
def test_dprnn_intra_block_chunked_and_bf16(T, dt):
    """The 8-aligned chunked sequence walk (and the bf16 upcast fallback
    for T % 8 != 0) matches the reference composition."""
    rng = np.random.default_rng(12)
    N, C = 20, 8
    p_fw, p_bw = _params(rng, C, C), _params(rng, C, C)
    wfc = jnp.asarray(rng.normal(size=(2 * C, C)).astype(np.float32) * 0.3)
    bfc = jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.1)
    g, bln = _lnp(rng, C)
    x = jnp.asarray(rng.normal(size=(N, T, C)).astype(np.float32))

    yi = onn.gru_bidir(p_fw, p_bw, x)
    yi = onn.layer_norm({"g": g, "b": bln}, onn.linear({"w": wfc, "b": bfc}, yi))
    ref = x + yi

    wi2, wh2, b2 = pallas_gru._pack_bidir(p_fw, p_bw, jnp.float32)
    xd = x.astype(jnp.dtype(dt))
    got = pallas_gru.dprnn_intra_block(
        xd, wi2, wh2, b2, wfc, bfc, g, bln, precision="highest", interpret=True)
    assert got.dtype == xd.dtype
    atol = 1e-5 if dt == "float32" else 0.15
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref), atol=atol)


def test_dprnn_intra_block_hoisted_xp(monkeypatch):
    """The v3 chunk-hoisted x-projection path is exact."""
    monkeypatch.setenv("DPDFNET_TPU_INTRA_HOIST", "1")
    rng = np.random.default_rng(13)
    N, T, C = 20, 16, 8
    p_fw, p_bw = _params(rng, C, C), _params(rng, C, C)
    wfc = jnp.asarray(rng.normal(size=(2 * C, C)).astype(np.float32) * 0.3)
    bfc = jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.1)
    g, bln = _lnp(rng, C)
    x = jnp.asarray(rng.normal(size=(N, T, C)).astype(np.float32))

    yi = onn.gru_bidir(p_fw, p_bw, x)
    yi = onn.layer_norm({"g": g, "b": bln}, onn.linear({"w": wfc, "b": bfc}, yi))
    ref = x + yi

    wi2, wh2, b2 = pallas_gru._pack_bidir(p_fw, p_bw, jnp.float32)
    got = pallas_gru.dprnn_intra_block(
        x, wi2, wh2, b2, wfc, bfc, g, bln, precision="highest", interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_high_tier_bf16_3x_accuracy():
    """The 'high' kernel tier (manual bf16_3x decomposition) stays within
    f32-grade tolerance of the exact result and is far more accurate than
    a plain bf16 ('default') pass."""
    rng = np.random.default_rng(14)
    N, T, C = 24, 16, 8
    p_fw, p_bw = _params(rng, C, C), _params(rng, C, C)
    wfc = jnp.asarray(rng.normal(size=(2 * C, C)).astype(np.float32) * 0.3)
    bfc = jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.1)
    g, bln = _lnp(rng, C)
    x = jnp.asarray(rng.normal(size=(N, T, C)).astype(np.float32))
    wi2, wh2, b2 = pallas_gru._pack_bidir(p_fw, p_bw, jnp.float32)

    def run(prec):
        return np.asarray(pallas_gru.dprnn_intra_block(
            x, wi2, wh2, b2, wfc, bfc, g, bln,
            precision=prec, interpret=True))

    exact = run("highest")
    err_high = np.abs(run("high") - exact).max()
    # bf16_3x really rounds operands even in interpret mode, so this
    # bounds the decomposition's own error (plain-'default' interprets as
    # exact f32 on CPU, so no ordering comparison is possible here)
    assert 0 < err_high < 2e-4, err_high


def test_dprnn_intra_block_bf16_planes():
    """bf16 plane IO == the upcast-outside path with one output rounding:
    in-kernel math runs f32 either way (plane_io_bf16 contract)."""
    rng = np.random.default_rng(11)
    N, T, C = 16, 16, 8                      # T % 8 == 0: the aligned walk
    p_fw, p_bw = _params(rng, C, C), _params(rng, C, C)
    wfc = jnp.asarray(rng.normal(size=(2 * C, C)).astype(np.float32) * 0.3)
    bfc = jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.1)
    g, bln = _lnp(rng, C)
    x = jnp.asarray(rng.normal(size=(N, T, C)).astype(np.float32))
    xb = x.astype(jnp.bfloat16)

    wi2, wh2, b2 = pallas_gru._pack_bidir(p_fw, p_bw, jnp.float32)
    ref = pallas_gru.dprnn_intra_block(
        xb.astype(jnp.float32), wi2, wh2, b2, wfc, bfc, g, bln,
        precision="highest", interpret=True)
    got = pallas_gru.dprnn_intra_block(
        xb, wi2, wh2, b2, wfc, bfc, g, bln,
        precision="highest", interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(got), np.asarray(ref.astype(jnp.bfloat16)))


def test_dprnn_inter_block_bf16_planes():
    """bf16 plane IO: out == f32 out rounded once; h_last stays exact f32."""
    rng = np.random.default_rng(12)
    N, T, C = 16, 6, 8
    p = _params(rng, C, C)
    wfc = jnp.asarray(rng.normal(size=(C, C)).astype(np.float32) * 0.3)
    bfc = jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.1)
    g, bln = _lnp(rng, C)
    x = jnp.asarray(rng.normal(size=(T, N, C)).astype(np.float32))
    xb = x.astype(jnp.bfloat16)
    h0 = jnp.asarray(rng.normal(size=(N, C)).astype(np.float32) * 0.2)

    out_ref, hl_ref = pallas_gru.dprnn_inter_block(
        xb.astype(jnp.float32), h0, p["wi"], p["bi"], p["wh"], p["bh"],
        wfc, bfc, g, bln, precision="highest", interpret=True)
    out, hl = pallas_gru.dprnn_inter_block(
        xb, h0, p["wi"], p["bi"], p["wh"], p["bh"],
        wfc, bfc, g, bln, precision="highest", interpret=True)
    assert out.dtype == jnp.bfloat16 and hl.dtype == jnp.float32
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(out_ref.astype(jnp.bfloat16)))
    np.testing.assert_allclose(np.asarray(hl), np.asarray(hl_ref), atol=1e-6)


def test_fused_dprnn_stack_forward_bf16_planes(monkeypatch):
    """forward_spec with DPDFNET_TPU_PLANE_IO=bf16 (interpret mode) stays
    within the bf16-storage error envelope of the f32-plane fused path and
    keeps the state dtype stable (f32)."""
    from dpdfnet_tpu.config import get_config
    from dpdfnet_tpu.models.dpdfnet import forward_spec
    from dpdfnet_tpu.models.fuse import fuse_separable, pack_dprnn_bidir
    from dpdfnet_tpu.models.params import init_params
    from dpdfnet_tpu.models.state import init_state

    rng = np.random.default_rng(13)
    cfg = get_config("dpdfnet2")
    params = init_params(cfg, seed=3)
    fused = pack_dprnn_bidir(fuse_separable(params, cfg), cfg)
    spec = jnp.asarray(
        rng.normal(size=(2, 6, cfg.freq_bins, 2)).astype(np.float32))
    st = init_state(cfg, batch=2)

    monkeypatch.setenv("DPDFNET_TPU_PALLAS", "1")
    monkeypatch.setenv("DPDFNET_TPU_PALLAS_INTERPRET", "1")
    with jax.default_matmul_precision("default"):
        out_ref, st_ref, _ = forward_spec(fused, cfg, spec, st)
        monkeypatch.setenv("DPDFNET_TPU_PLANE_IO", "bf16")
        out_b, st_b, _ = forward_spec(fused, cfg, spec, st)

    scale = float(jnp.max(jnp.abs(out_ref))) + 1e-9
    dev = float(jnp.max(jnp.abs(out_b - out_ref))) / scale
    assert dev < 5e-2, dev
    for a, b in zip(jax.tree_util.tree_leaves(st_b),
                    jax.tree_util.tree_leaves(st_ref)):
        assert a.dtype == b.dtype
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=0.05)


@pytest.mark.parametrize("bf16_planes", [False, True])
def test_dprnn_inter_block_hoist(monkeypatch, bf16_planes):
    """DPDFNET_TPU_INTER_HOIST=1 (TS-block xp GEMM into scratch) must
    match the per-step form exactly — same dots, same order, only the
    xp computation site moves."""
    monkeypatch.setenv("DPDFNET_TPU_INTER_HOIST", "1")
    rng = np.random.default_rng(14)
    N, T, C = 16, 8, 8
    p = _params(rng, C, C)
    wfc = jnp.asarray(rng.normal(size=(C, C)).astype(np.float32) * 0.3)
    bfc = jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.1)
    g, bln = _lnp(rng, C)
    x = jnp.asarray(rng.normal(size=(N, T, C)).astype(np.float32))
    h0 = jnp.asarray(rng.normal(size=(N, C)).astype(np.float32) * 0.2)

    yt, hl_ref = onn.gru_seq(p, x, h0=h0)
    yt = onn.layer_norm({"g": g, "b": bln}, onn.linear({"w": wfc, "b": bfc}, yt))
    ref = x + yt

    xt = jnp.swapaxes(x, 0, 1)
    if bf16_planes:
        xt = xt.astype(jnp.bfloat16)
    out, hl = pallas_gru.dprnn_inter_block(
        xt, h0, p["wi"], p["bi"], p["wh"], p["bh"],
        wfc, bfc, g, bln, precision="highest", interpret=True, ts=4)
    atol = 3e-2 if bf16_planes else 2e-5
    np.testing.assert_allclose(
        np.asarray(jnp.swapaxes(out, 0, 1), np.float32),
        np.asarray(ref), atol=atol)
    np.testing.assert_allclose(np.asarray(hl), np.asarray(hl_ref),
                               atol=3e-2 if bf16_planes else 2e-5)


@pytest.mark.parametrize("bf16_planes", [False, True])
@pytest.mark.parametrize("T,ts", [(6, 1), (8, 4)])
def test_dprnn_inter_block_packed(T, ts, bf16_planes):
    """The packed-gate kernel (one [x|h] @ Wp dot per step — see
    pallas_gru._inter_pack) matches gru_seq + fc + LN + residual.  The
    r/z columns sum xp+hh inside the dot accumulator, so tolerances
    cover that reassociation."""
    rng = np.random.default_rng(15)
    N, C = 12, 8
    p = _params(rng, C, C)
    wfc = jnp.asarray(rng.normal(size=(C, C)).astype(np.float32) * 0.3)
    bfc = jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.1)
    g, bln = _lnp(rng, C)
    x = jnp.asarray(rng.normal(size=(N, T, C)).astype(np.float32))
    h0 = jnp.asarray(rng.normal(size=(N, C)).astype(np.float32) * 0.2)

    yt, hl_ref = onn.gru_seq(p, x, h0=h0)
    yt = onn.layer_norm({"g": g, "b": bln}, onn.linear({"w": wfc, "b": bfc}, yt))
    ref = x + yt

    xt = jnp.swapaxes(x, 0, 1)
    if bf16_planes:
        xt = xt.astype(jnp.bfloat16)
    out, hl = pallas_gru.dprnn_inter_block(
        xt, h0, p["wi"], p["bi"], p["wh"], p["bh"],
        wfc, bfc, g, bln, precision="highest", interpret=True, ts=ts,
        pack=True)
    atol = 3e-2 if bf16_planes else 2e-5
    np.testing.assert_allclose(
        np.asarray(jnp.swapaxes(out, 0, 1), np.float32),
        np.asarray(ref), atol=atol)
    np.testing.assert_allclose(np.asarray(hl), np.asarray(hl_ref),
                               atol=3e-2 if bf16_planes else 2e-5)


@pytest.mark.parametrize("T,dt", [(16, "float32"), (16, "bfloat16"),
                                  (13, "float32")])
def test_dprnn_intra_block_fc_chunk(T, dt):
    """The chunk-batched fc epilogue (one [CH*tile, C] dot pair per chunk
    — see pallas_gru._intra_fc_chunk) is bit-identical math to the
    per-step epilogue: same dots over the same rows, just batched."""
    rng = np.random.default_rng(16)
    N, C = 20, 8
    p_fw, p_bw = _params(rng, C, C), _params(rng, C, C)
    wfc = jnp.asarray(rng.normal(size=(2 * C, C)).astype(np.float32) * 0.3)
    bfc = jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.1)
    g, bln = _lnp(rng, C)
    x = jnp.asarray(rng.normal(size=(N, T, C)).astype(np.float32))
    xd = x.astype(jnp.dtype(dt))

    wi2, wh2, b2 = pallas_gru._pack_bidir(p_fw, p_bw, jnp.float32)
    base = pallas_gru.dprnn_intra_block(
        xd, wi2, wh2, b2, wfc, bfc, g, bln, precision="highest",
        interpret=True, fc_chunk=False)
    got = pallas_gru.dprnn_intra_block(
        xd, wi2, wh2, b2, wfc, bfc, g, bln, precision="highest",
        interpret=True, fc_chunk=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(base))


@pytest.mark.parametrize("fm_batch", [None, 4])
def test_dprnn_intra_block_tm_fc_chunk(fm_batch):
    """The chunk-batched fc epilogue on the freq-leading (tm) walk is
    bit-identical math to its per-step epilogue, in both plain and
    fm (f-major 4-D out) modes."""
    rng = np.random.default_rng(17)
    T, C = 16, 8
    N = 20 if fm_batch is None else 3 * fm_batch
    p_fw, p_bw = _params(rng, C, C), _params(rng, C, C)
    wfc = jnp.asarray(rng.normal(size=(2 * C, C)).astype(np.float32) * 0.3)
    bfc = jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.1)
    g, bln = _lnp(rng, C)
    x = jnp.asarray(rng.normal(size=(T, N, C)).astype(np.float32))

    wi2, wh2, b2 = pallas_gru._pack_bidir(p_fw, p_bw, jnp.float32)
    base = pallas_gru.dprnn_intra_block_tm(
        x, wi2, wh2, b2, wfc, bfc, g, bln, precision="highest",
        interpret=True, fm_batch=fm_batch, fc_chunk=False)
    got = pallas_gru.dprnn_intra_block_tm(
        x, wi2, wh2, b2, wfc, bfc, g, bln, precision="highest",
        interpret=True, fm_batch=fm_batch, fc_chunk=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(base))


@pytest.mark.parametrize("fm_batch", [None, 4])
@pytest.mark.parametrize("dt", [jnp.float32, jnp.bfloat16])
def test_dprnn_intra_block_tm_static_walk(fm_batch, dt):
    """The fully static unrolled tm walk (DPDFNET_TPU_INTRA_STATIC,
    default ON) is bit-identical to the CH-chunked fori walk — same
    per-step op sequence, only the load/loop structure differs."""
    rng = np.random.default_rng(21)
    T, C = 16, 8
    N = 20 if fm_batch is None else 3 * fm_batch
    p_fw, p_bw = _params(rng, C, C), _params(rng, C, C)
    wfc = jnp.asarray(rng.normal(size=(2 * C, C)).astype(np.float32) * 0.3)
    bfc = jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.1)
    g, bln = _lnp(rng, C)
    x = jnp.asarray(rng.normal(size=(T, N, C)).astype(np.float32)).astype(dt)

    wi2, wh2, b2 = pallas_gru._pack_bidir(p_fw, p_bw, jnp.float32)
    base = pallas_gru.dprnn_intra_block_tm(
        x, wi2, wh2, b2, wfc, bfc, g, bln, precision="highest",
        interpret=True, fm_batch=fm_batch, static_walk=False)
    got = pallas_gru.dprnn_intra_block_tm(
        x, wi2, wh2, b2, wfc, bfc, g, bln, precision="highest",
        interpret=True, fm_batch=fm_batch, static_walk=True)
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(base, np.float32))


@pytest.mark.parametrize("fm_batch", [None, 4])
@pytest.mark.parametrize("ts", [4, 8])
def test_dprnn_inter_block_fcfuse(fm_batch, ts):
    """The fc-fused packed kernel (fc folded into the gate dot as extra
    columns, one-step-deferred out writes — see fcfuse in
    pallas_gru._inter_block_kernel_packed) matches the plain packed
    kernel exactly: the fused fc columns contract the same h against the
    same Wfc, plus exact zeros from the x half."""
    rng = np.random.default_rng(23)
    C, T = 8, 16
    N = 12 if fm_batch is None else 3 * fm_batch
    p = _params(rng, C, C)
    wfc = jnp.asarray(rng.normal(size=(C, C)).astype(np.float32) * 0.3)
    bfc = jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.1)
    g, bln = _lnp(rng, C)
    x = jnp.asarray(rng.normal(size=(T, N, C)).astype(np.float32))
    h0 = jnp.asarray(rng.normal(size=(N, C)).astype(np.float32) * 0.2)

    base = pallas_gru.dprnn_inter_block(
        x, h0, p["wi"], p["bi"], p["wh"], p["bh"], wfc, bfc, g, bln,
        precision="highest", interpret=True, ts=ts, pack=True,
        fm_batch=fm_batch, fcfuse=False)
    got = pallas_gru.dprnn_inter_block(
        x, h0, p["wi"], p["bi"], p["wh"], p["bh"], wfc, bfc, g, bln,
        precision="highest", interpret=True, ts=ts, pack=True,
        fm_batch=fm_batch, fcfuse=True)
    np.testing.assert_allclose(np.asarray(got[0], np.float32),
                               np.asarray(base[0], np.float32), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(base[1]))


def test_dprnn_fused_out_fm_layout(monkeypatch):
    """out_fm=True returns the stack's native freq-leading plane — the
    transpose the caller folds into its (f c) contraction — identical in
    content to the batch-major output."""
    from dpdfnet_tpu.models import dpdfnet as md

    rng = np.random.default_rng(31)
    B, T, Fq, C = 32, 2, 16, 8          # B >= 32: the fm chain engages
    p_fw, p_bw = _params(rng, C, C), _params(rng, C, C)
    wfc = jnp.asarray(rng.normal(size=(2 * C, C)).astype(np.float32) * 0.3)
    bfc = jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.1)
    gi, bi = _lnp(rng, C)
    gg = _params(rng, C, C)
    wfc2 = jnp.asarray(rng.normal(size=(C, C)).astype(np.float32) * 0.3)
    bfc2 = jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.1)
    g2, b2_ = _lnp(rng, C)
    wi2, wh2, b2 = pallas_gru._pack_bidir(p_fw, p_bw, jnp.float32)
    blocks = [{
        "intra": {"packed": {"wi2": wi2, "wh2": wh2, "b2": b2},
                  "fc": {"w": wfc, "b": bfc},
                  "ln": {"g": gi, "b": bi}},
        "inter": {"gru": gg, "fc": {"w": wfc2, "b": bfc2},
                  "ln": {"g": g2, "b": b2_}},
    }]
    hs = [jnp.zeros((B, Fq, C), jnp.float32)]
    x = jnp.asarray(rng.normal(size=(B, T, Fq, C)).astype(np.float32))

    monkeypatch.setenv("DPDFNET_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("DPDFNET_TPU_INTRA_TM", "1")
    ref, hs_ref = md._dprnn_fused(blocks, x, hs)
    got, hs_got, layout = md._dprnn_fused(blocks, x, hs, out_fm=True)
    assert layout == "fm" and got.shape == (Fq, T, B, C)
    np.testing.assert_array_equal(
        np.asarray(jnp.transpose(got, (2, 1, 0, 3))), np.asarray(ref))
    for a, b in zip(hs_got, hs_ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("B,T,F,C,dt_out", [
    (32, 16, 40, 64, None),          # kernel path, dtype pass-through
    (8, 8, 48, 64, "bfloat16"),      # kernel path + cast fold
    (12, 16, 40, 64, None),          # B % 8 != 0 -> XLA fallback
    (32, 10, 40, 64, None),          # T % 8 != 0 -> XLA fallback
])
def test_relayout_fm(B, T, F, C, dt_out):
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(B, T, F, C)).astype(np.float32))
    kw = {} if dt_out is None else {"out_dtype": jnp.dtype(dt_out)}
    got = pallas_gru.relayout_fm(x, interpret=True, **kw)
    want = jnp.transpose(x, (2, 1, 0, 3))
    if dt_out is not None:
        want = want.astype(jnp.dtype(dt_out))
    assert got.dtype == want.dtype and got.shape == (F, T, B, C)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_dprnn_fused_entry_relayout(monkeypatch):
    """DPDFNET_TPU_ENTRY_RELAYOUT produces the identical fm chain."""
    import dpdfnet_tpu.models.dpdfnet as md

    rng = np.random.default_rng(11)
    B, T, Fq, C = 32, 16, 8, 64

    def glorot(*s):
        return jnp.asarray(rng.normal(size=s, scale=0.1).astype(np.float32))

    def gru_p():
        return {"wi": glorot(C, 3 * C), "bi": glorot(3 * C),
                "wh": glorot(C, 3 * C), "bh": glorot(3 * C)}

    p_fw, p_bw = gru_p(), gru_p()
    wi2, wh2, b2 = pallas_gru._pack_bidir(p_fw, p_bw, jnp.float32)
    blocks = [{
        "intra": {"packed": {"wi2": wi2, "wh2": wh2, "b2": b2},
                  "fc": {"w": glorot(2 * C, C), "b": glorot(C)},
                  "ln": {"g": glorot(C), "b": glorot(C)}},
        "inter": {"gru": gru_p(), "fc": {"w": glorot(C, C), "b": glorot(C)},
                  "ln": {"g": glorot(C), "b": glorot(C)}},
    }]
    hs = [jnp.zeros((B, Fq, C), jnp.float32)]
    x = jnp.asarray(rng.normal(size=(B, T, Fq, C)).astype(np.float32))

    monkeypatch.setenv("DPDFNET_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("DPDFNET_TPU_INTRA_TM", "1")
    ref, hs_ref = md._dprnn_fused(blocks, x, hs)
    monkeypatch.setenv("DPDFNET_TPU_ENTRY_RELAYOUT", "1")
    got, hs_got = md._dprnn_fused(blocks, x, hs)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    for a, b in zip(hs_got, hs_ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
