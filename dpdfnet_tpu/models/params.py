"""Random parameter initialisation (shape source of truth for the pytree).

Used for benchmarking, the compile-check entry points, and tests.  Real
weights come from ``dpdfnet_tpu.models.convert`` (reference checkpoints);
both produce the same schema.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..ops.erb import erb_fb_and_inverse

Params = Dict


class _KeyGen:
    def __init__(self, key):
        self._key = key

    def __call__(self):
        self._key, sub = jax.random.split(self._key)
        return sub


def _norm(kg, *shape, scale=None):
    scale = scale if scale is not None else 1.0 / np.sqrt(max(1, shape[-2] if len(shape) > 1 else shape[0]))
    return (jax.random.normal(kg(), shape, jnp.float32) * scale).astype(jnp.float32)


def _conv(kg, kt, kf, cin_g, cout, bn=True, pw=False):
    p = {"w": _norm(kg, kt, kf, cin_g, cout, scale=1.0 / np.sqrt(kt * kf * cin_g)),
         "b": None}
    if pw:
        p["pw"] = {"w": _norm(kg, cout, cout)}
    if bn:
        p["bn"] = {"scale": jnp.ones((cout,), jnp.float32),
                   "shift": jnp.zeros((cout,), jnp.float32)}
    return p


def _subpixel(kg, kf, cin_g, cout, fstride, bn=True, pw=True):
    p = {"w": _norm(kg, 1, kf, cin_g, cout * fstride,
                    scale=1.0 / np.sqrt(kf * cin_g)), "b": None}
    if pw:
        p["pw"] = {"w": _norm(kg, cout, cout)}
    if bn:
        p["bn"] = {"scale": jnp.ones((cout,), jnp.float32),
                   "shift": jnp.zeros((cout,), jnp.float32)}
    return p


def _gl(kg, i, o, g):
    return {"w": _norm(kg, g, i // g, o // g, scale=1.0 / np.sqrt(i // g)),
            "b": jnp.zeros((o,), jnp.float32)}


def _lin(kg, i, o):
    return {"w": _norm(kg, i, o), "b": jnp.zeros((o,), jnp.float32)}


def _gru(kg, i, h):
    return {
        "wi": _norm(kg, i, 3 * h), "bi": jnp.zeros((3 * h,), jnp.float32),
        "wh": _norm(kg, h, 3 * h), "bh": jnp.zeros((3 * h,), jnp.float32),
    }


def _ln(c):
    return {"g": jnp.ones((c,), jnp.float32), "b": jnp.zeros((c,), jnp.float32)}


def _dprnn_block(kg, c):
    return {
        "intra": {"fw": _gru(kg, c, c), "bw": _gru(kg, c, c),
                  "fc": _lin(kg, 2 * c, c), "ln": _ln(c)},
        "inter": {"gru": _gru(kg, c, c), "fc": _lin(kg, c, c), "ln": _ln(c)},
    }


def _squeezed(kg, i, h, o, layers, g, skip="none", group_gru=1):
    # NB: key-consumption order (lin_in before grus) is load-bearing for
    # seed reproducibility of the default configs.
    p = {"lin_in": _gl(kg, i, h, g)}
    if group_gru > 1:
        # reference quirk: group_gru>1 selects GroupedGRU, which keeps its
        # own default of 4 groups (model/modules.py:1061-1062, :1186)
        gg = 4
        p["grus"] = [
            {"groups": [_gru(kg, h // gg, h // gg) for _ in range(gg)]}
            for _ in range(layers)]
    else:
        p["grus"] = [_gru(kg, h, h) for _ in range(layers)]
    if o is not None:
        p["lin_out"] = _gl(kg, h, o, g)
    if skip == "groupedlinear":
        o_eff = o if o is not None else h
        p["skip"] = _gl(kg, o_eff, o_eff, g)   # reference declares emb_out_dim
    return p


def init_params(cfg: ModelConfig, seed: int = 0) -> Params:
    kg = _KeyGen(jax.random.PRNGKey(seed))
    C = cfg.conv_ch
    kt, kf = cfg.conv_kernel_inp
    _, kfc = cfg.conv_kernel
    nb = cfg.nb_df
    H = cfg.gru_dim
    emb_in = cfg.enc_emb_in_dim        # per-branch embedding before concat
    emb_out = cfg.emb_out_dim
    lg, elg = cfg.lin_groups, cfg.enc_lin_groups

    erb_fb, erb_inv_fb = erb_fb_and_inverse(
        cfg.n_fft, cfg.sample_rate, cfg.nb_erb, cfg.min_nb_freqs
    )

    enc = {
        "erb_conv0": _conv(kg, kt, kf, 1, C),
        "erb_conv1": _conv(kg, 1, kfc, 1, C, pw=True),
        "erb_conv2": _conv(kg, 1, kfc, 1, C, pw=True),
        "erb_conv3": _conv(kg, 1, kfc, 1, C, pw=True),
        "df_conv0": _conv(kg, kt, kf, 1, C, pw=True),
        "df_conv1": _conv(kg, 1, kfc, 1, C, pw=True),
        "dprnn_erb": [_dprnn_block(kg, C) for _ in range(cfg.dprnn_blocks)],
        "dprnn_df": [_dprnn_block(kg, C) for _ in range(cfg.dprnn_blocks)],
        "df_fc_emb": _gl(kg, C * nb // 2, emb_in, elg),
        "emb_gru": _squeezed(kg, 2 * emb_in, H, emb_out, 1, lg,
                             skip=cfg.emb_gru_skip, group_gru=cfg.group_gru),
        "lsnr": _lin(kg, emb_out, 1),
    }
    if cfg.hr:
        enc["erb_fc_emb"] = _gl(kg, C * cfg.dprnn_erb_feat, emb_in, elg)

    erb_dec = {
        "emb_gru": _squeezed(kg, emb_out, H,
                             emb_out if not cfg.hr else cfg.emb_dim, 2, lg,
                             skip=cfg.emb_gru_skip, group_gru=cfg.group_gru),
        # pathway 1x1 convs are depthwise (see models/dpdfnet.py pconv)
        "conv3p": _conv(kg, 1, 1, 1, C),
        "conv2p": _conv(kg, 1, 1, 1, C),
        "conv1p": _conv(kg, 1, 1, 1, C),
        "conv0p": _conv(kg, 1, 1, 1, C),
        "conv0_out": _conv(kg, 1, kfc, C, 1),
    }
    st3, st2, st1 = cfg.dec_fstrides

    def _up(st):
        if cfg.upsample == "transpose":
            return _conv(kg, 1, kfc, 1, C, pw=True)   # HWIO [1,kf,in/g,out]
        return _subpixel(kg, kfc, 1, C, st)

    erb_dec["convt3"] = (_conv(kg, 1, kfc, 1, C, pw=True) if st3 == 1
                         else _up(st3))
    erb_dec["convt2"] = _up(st2)
    erb_dec["convt1"] = _up(st1)
    if cfg.hr:
        erb_dec["erb_fc_emb"] = _gl(kg, cfg.emb_dim, C * cfg.dprnn_erb_feat, elg)

    df_dec = {
        # df_gru keeps the reference's default linear_groups=8
        "df_gru": _squeezed(kg, emb_out, H, None, 2, 8,
                            group_gru=cfg.group_gru),
        "df_skip": _gl(kg, emb_out, H, lg),
        "df_out": _gl(kg, H, nb * 2 * cfg.df_order, lg),
        "df_convp": _conv(kg, cfg.df_kt, 1, C // 2, 2 * cfg.df_order, pw=True),
    }

    return {
        "enc": enc,
        "erb_dec": erb_dec,
        "df_dec": df_dec,
        "erb_fb": jnp.asarray(erb_fb),
        "erb_inv_fb": jnp.asarray(erb_inv_fb),
    }


def count_params(params: Params) -> int:
    """Learned-parameter count (excludes the fixed ERB filterbank
    constants, matching the reference README's figures)."""
    total = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
        if any(k in ("erb_fb", "erb_inv_fb") for k in keys):
            continue
        total += int(np.prod(leaf.shape))
    return total


def contract_params(params: Params, factor: float = 0.7) -> Params:
    """Rescale every >=2-D weight so its (flattened) spectral norm is at
    most ``factor``.

    Trained speech-enhancement checkpoints have stable, non-amplifying
    dynamics (bounded layer gains); raw random init does not, which makes it
    an adversarial input for measuring low-precision tier deviation.  This
    produces weight statistics representative of real checkpoints for the
    tier-accuracy gate (``quality.tier_deviation``) while remaining fully
    reproducible offline.  ERB filterbank matrices are left untouched (they
    are fixed constants, not learned weights).
    """
    def clamp(path, x):
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        a = np.asarray(x)
        if a.ndim < 2 or "erb_fb" in name or "erb_inv_fb" in name:
            return x
        s = float(np.linalg.svd(a.reshape(a.shape[0], -1),
                                compute_uv=False)[0])
        if s <= factor or s == 0.0:
            return x
        return jnp.asarray(a * np.asarray(factor / s, a.dtype))

    return jax.tree_util.tree_map_with_path(clamp, params)
