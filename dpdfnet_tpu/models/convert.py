"""Convert reference PyTorch checkpoints into the JAX parameter pytree.

Accepts either the *offline* state_dict layout shipped on the model zoo
(`model_zoo/checkpoints/*.pth`, module names from
`/root/reference/model/dpdfnet.py`) or the *streaming* layout produced by
`correct_state_dict` (`/root/reference/onnx_model/dpdfnet.py:876-888` —
GRU layers renamed to per-layer GRUCells).  Streaming names are normalised
back to the offline convention first.

All weights are re-laid-out for TPU/NHWC execution:
- conv ``[O, I/g, kh, kw]`` -> HWIO ``[kh, kw, I/g, O]``;
- GRU ``weight_ih [3H, I]`` -> ``wi [I, 3H]`` (gates keep torch's r,z,n order);
- grouped-linear per-group ``nn.Linear`` stacks merge into one
  ``[G, I/G, O/G]`` einsum weight (the reference does the same at ONNX
  export, `/root/reference/onnx_model/layers.py:1053-1080`);
- sub-pixel per-stride convs merge into one grouped conv with interleaved
  output channels (see ``ops.nn.subpixel_block``);
- BatchNorm2d (eval) folds to per-channel ``scale``/``shift``.

The converter works on numpy arrays only — no torch import is required when
fed a dict of numpy arrays; ``load_torch_checkpoint`` handles ``.pth`` IO.
"""

from __future__ import annotations

import re
from typing import Dict, Mapping

import numpy as np

from ..config import ModelConfig
from ..ops.erb import erb_fb_and_inverse

Params = Dict

_BN_EPS = 1e-5


def normalize_state_dict(sd: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Map streaming (GRUCell) key names back to the offline convention."""
    out: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        m = re.search(r"\.gru\.(\d+)\.grucell\.(weight|bias)_(ih|hh)$", k)
        if m:
            layer, kind, gate = m.groups()
            k = k[: m.start()] + f".gru.{kind}_{gate}_l{layer}"
        else:
            m = re.search(r"inter_gru\.grucell\.(weight|bias)_(ih|hh)$", k)
            if m:
                kind, gate = m.groups()
                k = k[: m.start()] + f"inter_gru.{kind}_{gate}_l0"
        out[k] = np.asarray(v)
    return out


def load_torch_checkpoint(path) -> Dict[str, np.ndarray]:
    import torch  # local import: torch is only needed for .pth IO

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


# --------------------------------------------------------------------------- #
# Layer converters
# --------------------------------------------------------------------------- #

class _SD:
    """state_dict accessor that records consumed keys."""

    def __init__(self, sd: Mapping[str, np.ndarray]):
        self.sd = dict(sd)
        self.used: set = set()

    def __call__(self, key: str) -> np.ndarray:
        self.used.add(key)
        return np.asarray(self.sd[key], np.float32)

    def has(self, key: str) -> bool:
        return key in self.sd

    def unused(self):
        drop = (".num_batches_tracked", ".running_mean", ".running_var")
        return sorted(
            k for k in self.sd
            if k not in self.used and not k.endswith(drop)
        )


def _bn(sd: _SD, prefix: str) -> Dict:
    gamma, beta = sd(f"{prefix}.weight"), sd(f"{prefix}.bias")
    mean, var = sd(f"{prefix}.running_mean"), sd(f"{prefix}.running_var")
    sd.used.add(f"{prefix}.num_batches_tracked")
    scale = gamma / np.sqrt(var + _BN_EPS)
    return {"scale": scale, "shift": beta - mean * scale}


def _conv_w(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0)).copy()     # OIHW -> HWIO


def _plain_conv(sd: _SD, prefix: str, *, has_pad: bool, has_pw: bool) -> Dict:
    i = 1 if has_pad else 0
    p: Dict = {"w": _conv_w(sd(f"{prefix}.{i}.weight")), "b": None}
    if sd.has(f"{prefix}.{i}.bias"):
        p["b"] = sd(f"{prefix}.{i}.bias")
    i += 1
    if has_pw:
        p["pw"] = {"w": sd(f"{prefix}.{i}.weight")[:, :, 0, 0].T.copy()}
        i += 1
    p["bn"] = _bn(sd, f"{prefix}.{i}")
    return p


def _grouped_conv(sd: _SD, prefix: str, groups: int, *, has_pad: bool) -> Dict:
    i = 1 if has_pad else 0
    ws = [sd(f"{prefix}.{i}.convs.{g}.weight") for g in range(groups)]
    p: Dict = {"w": _conv_w(np.concatenate(ws, axis=0)), "b": None}
    if sd.has(f"{prefix}.{i}.convs.0.bias"):
        p["b"] = np.concatenate(
            [sd(f"{prefix}.{i}.convs.{g}.bias") for g in range(groups)]
        )
    i += 1
    p["pw"] = {"w": sd(f"{prefix}.{i}.weight")[:, :, 0, 0].T.copy()}
    i += 1
    p["bn"] = _bn(sd, f"{prefix}.{i}")
    return p


def _conv_transpose(sd: _SD, prefix: str, groups_hint: int) -> Dict:
    """ConvTranspose2d (+pw +bn) -> fractionally-strided conv kernel.

    torch weight [in, out/g, kh, kw] becomes HWIO [kh, kw, in/g, out] with
    the spatial taps flipped; ``ops.nn.conv_transpose_block`` then computes
    the exact transposed conv via ``lhs_dilation``.
    """
    w = sd(f"{prefix}.0.weight")                   # [in, out/g, kh, kw]
    cin, out_g, kh, kw = w.shape
    g = groups_hint
    w = w[:, :, ::-1, ::-1]                        # flip taps
    wg = w.reshape(g, cin // g, out_g, kh, kw)
    rhs = np.transpose(wg, (3, 4, 1, 0, 2)).reshape(kh, kw, cin // g,
                                                    g * out_g)
    p: Dict = {"w": np.ascontiguousarray(rhs), "b": None}
    if sd.has(f"{prefix}.0.bias"):
        p["b"] = sd(f"{prefix}.0.bias")
    p["pw"] = {"w": sd(f"{prefix}.1.weight")[:, :, 0, 0].T.copy()}
    p["bn"] = _bn(sd, f"{prefix}.2")
    return p


def _subpixel_conv(sd: _SD, prefix: str, fstride: int) -> Dict:
    # sub-convs at sequential index 0 (kernel time==1 -> no pad layer)
    ws = [sd(f"{prefix}.0.convs.{s}.weight") for s in range(fstride)]
    # [O, I/g, kh, kw] each; interleave output channels as c*fstride + s
    w = np.stack(ws, axis=1)                        # [O, s, I/g, kh, kw]
    w = w.reshape(-1, *ws[0].shape[1:])             # [(O*s) interleaved, ...]
    p: Dict = {"w": _conv_w(w), "b": None}
    if sd.has(f"{prefix}.0.convs.0.bias"):
        bs = np.stack([sd(f"{prefix}.0.convs.{s}.bias") for s in range(fstride)], 1)
        p["b"] = bs.reshape(-1)
    p["pw"] = {"w": sd(f"{prefix}.1.weight")[:, :, 0, 0].T.copy()}
    p["bn"] = _bn(sd, f"{prefix}.2")
    return p


def _gl(sd: _SD, prefix: str, groups: int) -> Dict:
    """GroupedLinear: loop form (.layers.i) or einsum form (.weight)."""
    if sd.has(f"{prefix}.weight"):
        return {"w": sd(f"{prefix}.weight"), "b": sd(f"{prefix}.bias")}
    ws = [sd(f"{prefix}.layers.{g}.weight").T for g in range(groups)]
    bs = [sd(f"{prefix}.layers.{g}.bias") for g in range(groups)]
    return {"w": np.stack(ws, axis=0), "b": np.concatenate(bs)}


def _lin(sd: _SD, prefix: str) -> Dict:
    return {"w": sd(f"{prefix}.weight").T.copy(), "b": sd(f"{prefix}.bias")}


def _gru_layer(sd: _SD, prefix: str, layer: int) -> Dict:
    sfx = f"_l{layer}"
    return {
        "wi": sd(f"{prefix}.weight_ih{sfx}").T.copy(),
        "bi": sd(f"{prefix}.bias_ih{sfx}"),
        "wh": sd(f"{prefix}.weight_hh{sfx}").T.copy(),
        "bh": sd(f"{prefix}.bias_hh{sfx}"),
    }


def _gru_reverse(sd: _SD, prefix: str) -> Dict:
    return {
        "wi": sd(f"{prefix}.weight_ih_l0_reverse").T.copy(),
        "bi": sd(f"{prefix}.bias_ih_l0_reverse"),
        "wh": sd(f"{prefix}.weight_hh_l0_reverse").T.copy(),
        "bh": sd(f"{prefix}.bias_hh_l0_reverse"),
    }


def _ln(sd: _SD, prefix: str) -> Dict:
    return {"g": sd(f"{prefix}.weight"), "b": sd(f"{prefix}.bias")}


def _dprnn(sd: _SD, prefix: str, blocks: int):
    out = []
    for k in range(blocks):
        b = f"{prefix}.blocks.{k}"
        out.append({
            "intra": {
                "fw": _gru_layer(sd, f"{b}.intra_gru", 0),
                "bw": _gru_reverse(sd, f"{b}.intra_gru"),
                "fc": _lin(sd, f"{b}.fc_intra"),
                "ln": _ln(sd, f"{b}.ln_intra"),
            },
            "inter": {
                "gru": _gru_layer(sd, f"{b}.inter_gru", 0),
                "fc": _lin(sd, f"{b}.fc_inter"),
                "ln": _ln(sd, f"{b}.ln_inter"),
            },
        })
    return out


def _squeezed(sd: _SD, prefix: str, layers: int, groups: int, has_out: bool,
              skip: str = "none") -> Dict:
    if sd.has(f"{prefix}.gru.grus.0.layers.0.weight_ih_l0"):
        # group_gru > 1: the stack is a GroupedGRU — per-layer lists of
        # per-group nn.GRUs (model/modules.py:1216-1220, 1135-1137)
        grus = []
        for k in range(layers):
            gg = 0
            while sd.has(f"{prefix}.gru.grus.{k}.layers.{gg}.weight_ih_l0"):
                gg += 1
            grus.append({"groups": [
                _gru_layer(sd, f"{prefix}.gru.grus.{k}.layers.{g}", 0)
                for g in range(gg)]})
    else:
        grus = [_gru_layer(sd, f"{prefix}.gru", k) for k in range(layers)]
    p = {
        "lin_in": _gl(sd, f"{prefix}.linear_in.0", groups),
        "grus": grus,
    }
    if has_out:
        p["lin_out"] = _gl(sd, f"{prefix}.linear_out.0", groups)
    if skip == "groupedlinear":
        p["skip"] = _gl(sd, f"{prefix}.gru_skip", groups)
    return p


# --------------------------------------------------------------------------- #
# Full model
# --------------------------------------------------------------------------- #

def convert_state_dict(
    raw_sd: Mapping[str, np.ndarray], cfg: ModelConfig, *, strict: bool = True
) -> Params:
    import jax.numpy as jnp

    sd = _SD(normalize_state_dict(raw_sd))
    lg, elg = cfg.lin_groups, cfg.enc_lin_groups
    st3, st2, st1 = cfg.dec_fstrides

    enc = {
        "erb_conv0": _plain_conv(sd, "enc.erb_conv0", has_pad=True, has_pw=False),
        "erb_conv1": _plain_conv(sd, "enc.erb_conv1", has_pad=False, has_pw=True),
        "erb_conv2": _plain_conv(sd, "enc.erb_conv2", has_pad=False, has_pw=True),
        "erb_conv3": _plain_conv(sd, "enc.erb_conv3", has_pad=False, has_pw=True),
        "df_conv0": _grouped_conv(sd, "enc.df_conv0", 2, has_pad=True),
        "df_conv1": _plain_conv(sd, "enc.df_conv1", has_pad=False, has_pw=True),
        "dprnn_erb": _dprnn(sd, "enc.dprnn_erb", cfg.dprnn_blocks),
        "dprnn_df": _dprnn(sd, "enc.dprnn_df", cfg.dprnn_blocks),
        "df_fc_emb": _gl(sd, "enc.df_fc_emb.0", elg),
        "emb_gru": _squeezed(sd, "enc.emb_gru", 1, lg, True,
                             skip=cfg.emb_gru_skip),
        "lsnr": _lin(sd, "enc.lsnr_fc.0"),
    }
    if cfg.hr:
        enc["erb_fc_emb"] = _gl(sd, "enc.erb_fc_emb.0", elg)

    erb_dec = {
        "emb_gru": _squeezed(sd, "erb_dec.emb_gru", 2, lg, True,
                             skip=cfg.emb_gru_skip),
        "conv3p": _plain_conv(sd, "erb_dec.conv3p", has_pad=False, has_pw=False),
        "conv2p": _plain_conv(sd, "erb_dec.conv2p", has_pad=False, has_pw=False),
        "conv1p": _plain_conv(sd, "erb_dec.conv1p", has_pad=False, has_pw=False),
        "conv0p": _plain_conv(sd, "erb_dec.conv0p", has_pad=False, has_pw=False),
        "conv0_out": _plain_conv(sd, "erb_dec.conv0_out", has_pad=False, has_pw=False),
    }
    C = cfg.conv_ch
    if cfg.upsample == "transpose":
        def _up(prefix, st):
            return _conv_transpose(sd, prefix, C)
    else:
        def _up(prefix, st):
            return _subpixel_conv(sd, prefix, st)
    erb_dec["convt3"] = (_plain_conv(sd, "erb_dec.convt3", has_pad=False,
                                     has_pw=True)
                         if st3 == 1 else _up("erb_dec.convt3", st3))
    erb_dec["convt2"] = _up("erb_dec.convt2", st2)
    erb_dec["convt1"] = _up("erb_dec.convt1", st1)
    if cfg.hr:
        erb_dec["erb_fc_emb"] = _gl(sd, "erb_dec.erb_fc_emb.0", elg)

    df_dec = {
        # NOTE: the reference DfDecoder leaves SqueezedGRU_S's linear_groups
        # at its default of 8 (onnx_model/dpdfnet.py:434-442).
        "df_gru": _squeezed(sd, "df_dec.df_gru", 2, 8, False),
        "df_skip": _gl(sd, "df_dec.df_skip", lg),
        "df_out": _gl(sd, "df_dec.df_out.0", lg),
        "df_convp": _grouped_conv(sd, "df_dec.df_convp", 2, has_pad=True),
    }

    erb_fb, erb_inv_fb = erb_fb_and_inverse(
        cfg.n_fft, cfg.sample_rate, cfg.nb_erb, cfg.min_nb_freqs
    )
    # Cross-check against checkpoint buffers when present.
    if sd.has("erb_fb"):
        ref_fb = sd("erb_fb")
        if not np.allclose(ref_fb, erb_fb, atol=1e-6):
            raise ValueError("checkpoint erb_fb differs from computed filterbank")
    for k in ("erb_inv_fb", "mask.erb_inv_fb", "stft.w", "istft.w_inv",
              "istft_norm.w_inv"):
        if sd.has(k):
            sd.used.add(k)

    if strict:
        leftover = sd.unused()
        if leftover:
            raise ValueError(f"unconverted checkpoint keys: {leftover[:12]}...")

    params = {
        "enc": enc, "erb_dec": erb_dec, "df_dec": df_dec,
        "erb_fb": erb_fb, "erb_inv_fb": erb_inv_fb,
    }
    import jax
    return jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.float32) if x is not None else None, params,
        is_leaf=lambda x: x is None or isinstance(x, np.ndarray),
    )


def load_params(path, cfg: ModelConfig) -> Params:
    """Load a reference ``.pth`` checkpoint into the JAX pytree."""
    return convert_state_dict(load_torch_checkpoint(path), cfg)
