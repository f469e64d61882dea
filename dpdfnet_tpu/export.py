"""Model export: serialized StableHLO artifacts + parameter bundles.

The reference ships three artifact tiers per model — PyTorch ``.pth``, ONNX
and TFLite (`README.md:166-191`), with streaming state-init metadata
embedded in the ONNX file (`onnx_model/export_dpdfnet_to_onnx.py:59-83`).
The TPU-native equivalents are:

- ``<model>.params.npz`` — the parameter pytree (``utils.serialization``),
  produced automatically by the zoo's conversion cache;
- ``<model>.stream.stablehlo`` — the single-frame streaming step
  ``(spec [B,1,F,2], flat_state [B,S]) -> (spec_e, flat_state')`` exported
  with ``jax.export`` (weights baked in), signature-compatible with the
  reference's ONNX graph including the flat state layout, plus a JSON
  sidecar carrying ``state_size`` and the norm-init segments exactly as the
  ONNX metadata does;
- ``<model>.offline.stablehlo`` — the batched whole-utterance pipeline.

A StableHLO artifact is loadable on any machine with jax via
``load_exported`` and runs without this package's model code.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from .config import ModelConfig
from .models import init_norms, state as state_lib
from .models.dpdfnet import forward_spec


def _flatten_jnp(cfg: ModelConfig, st) -> jnp.ndarray:
    """Traceable flatten of the state pytree -> [B, S] (reference layout)."""
    B = st["erb_norm"].shape[0]

    def ring(tail, capacity, perm):
        # tail [B, k, ...frame] -> [B, capacity, ...frame-permuted] with
        # zeroed oldest slots; ``perm`` orders the frame dims (reference
        # stores conv rings channel-major).
        t = jnp.transpose(tail, (0, 1) + tuple(p + 2 for p in perm))
        k = t.shape[1]
        pad = [(0, 0)] * t.ndim
        pad[1] = (capacity - k, 0)
        return jnp.pad(t, pad).reshape(B, -1)

    parts = [
        st["erb_norm"].reshape(B, -1),
        st["spec_norm"].reshape(B, -1),
        ring(st["erb_conv0_tail"], 3, (1, 0)),
    ]
    for h in st["dprnn_erb"]:
        parts.append(h.reshape(B, -1))
    parts.append(ring(st["df_conv0_tail"], 3, (1, 0)))
    for h in st["dprnn_df"]:
        parts.append(h.reshape(B, -1))
    for key in ("enc_gru", "erb_dec_gru", "df_gru"):
        for h in st[key]:
            parts.append(h.reshape(B, -1))
    parts.append(ring(st["df_convp_tail"], 5, (1, 0)))
    parts.append(ring(st["mask_spec_tail"], 3, (0, 1)))
    parts.append(ring(st["df_coefs_tail"], 3, (1, 0, 2)))
    parts.append(ring(st["df_spec_tail"], 5, (0, 1)))
    return jnp.concatenate(parts, axis=1)


def _unflatten_jnp(cfg: ModelConfig, flat: jnp.ndarray):
    """Traceable inverse of :func:`_flatten_jnp`."""
    B = flat.shape[0]
    C, F, O = cfg.conv_ch, cfg.freq_bins, cfg.df_order
    E = F if cfg.hr else cfg.nb_erb
    nb = cfg.nb_df
    pos = 0

    def take(*shape):
        nonlocal pos
        n = int(np.prod(shape))
        out = flat[:, pos: pos + n].reshape((B,) + shape)
        pos += n
        return out

    st = {}
    st["erb_norm"] = take(E)
    st["spec_norm"] = take(nb)
    r = take(3, 1, 1, E)
    st["erb_conv0_tail"] = jnp.transpose(r[:, 1:, 0], (0, 1, 3, 2))
    st["dprnn_erb"] = [take(cfg.dprnn_erb_feat, C) for _ in range(cfg.dprnn_blocks)]
    r = take(3, 1, 2, nb)
    st["df_conv0_tail"] = jnp.transpose(r[:, 1:, 0], (0, 1, 3, 2))
    st["dprnn_df"] = [take(cfg.dprnn_df_feat, C) for _ in range(cfg.dprnn_blocks)]
    st["enc_gru"] = [take(cfg.gru_dim)]
    st["erb_dec_gru"] = [take(cfg.gru_dim) for _ in range(2)]
    st["df_gru"] = [take(cfg.gru_dim) for _ in range(2)]
    r = take(5, 1, C, nb)
    st["df_convp_tail"] = jnp.transpose(r[:, 1:, 0], (0, 1, 3, 2))
    r = take(3, 1, 1, F, 2)
    st["mask_spec_tail"] = r[:, 1:, 0, 0]
    r = take(3, 1, O, nb, 2)
    st["df_coefs_tail"] = jnp.transpose(r[:, 1:, 0], (0, 1, 3, 2, 4))
    r = take(5, 1, 1, F, 2)
    st["df_spec_tail"] = r[:, 1:, 0, 0]
    return st


def make_stream_step(params, cfg: ModelConfig, precision: str = "high"):
    """Flat-state single-frame step with the reference ONNX signature."""

    def step(spec: jnp.ndarray, flat_state: jnp.ndarray):
        # spec: [B, 1, F, 2] (wnorm-scaled), flat_state: [B, S]
        with jax.default_matmul_precision(precision):
            st = _unflatten_jnp(cfg, flat_state)
            out, st, _ = forward_spec(params, cfg, spec, st)
            return out, _flatten_jnp(cfg, st)

    return step


def export_stream(
    params,
    cfg: ModelConfig,
    out_path,
    *,
    batch: int = 1,
    platforms: Optional[Tuple[str, ...]] = None,
    precision: str = "high",
) -> Path:
    """Export the streaming step as a StableHLO artifact + JSON metadata."""
    out_path = Path(out_path)
    step = make_stream_step(params, cfg, precision)
    spec = jnp.zeros((batch, 1, cfg.freq_bins, 2), jnp.float32)
    flat = jnp.zeros((batch, state_lib.state_size(cfg)), jnp.float32)
    kwargs = {"platforms": platforms} if platforms else {}
    exp = jax_export.export(jax.jit(step), **kwargs)(spec, flat)
    out_path.write_bytes(exp.serialize())

    E = cfg.freq_bins if cfg.hr else cfg.nb_erb
    erb_init = (init_norms.mag_norm_init(E) if cfg.hr
                else init_norms.erb_norm_init(E))
    spec_init = init_norms.spec_norm_init(cfg.nb_df, cfg.hr)
    meta = {
        "model": cfg.name,
        "sample_rate": cfg.sample_rate,
        "n_fft": cfg.n_fft,
        "hop": cfg.hop,
        "wnorm": cfg.wnorm,
        "batch": batch,
        "state_size": int(state_lib.state_size(cfg)),
        "erb_norm_state_size": int(E),
        "spec_norm_state_size": int(cfg.nb_df),
        "erb_norm_init": ",".join(str(float(v)) for v in erb_init),
        "spec_norm_init": ",".join(str(float(v)) for v in spec_init),
        "platforms": list(exp.platforms),
    }
    Path(str(out_path) + ".json").write_text(json.dumps(meta, indent=1))
    return out_path


def export_offline(
    params,
    cfg: ModelConfig,
    out_path,
    *,
    batch: int,
    seconds: float,
    platforms: Optional[Tuple[str, ...]] = None,
    precision: str = "high",
) -> Path:
    """Export the whole-utterance pipeline (wav in, enhanced wav out)."""
    from .runtime.engine import Engine

    out_path = Path(out_path)
    engine = Engine(cfg, params, precision=precision)
    S = int(seconds * cfg.sample_rate)
    fn = engine._offline_fn(batch, S)
    kwargs = {"platforms": platforms} if platforms else {}
    exp = jax_export.export(fn, **kwargs)(
        engine.params, jnp.zeros((batch, S), jnp.float32),
        jnp.zeros((), jnp.float32))
    out_path.write_bytes(exp.serialize())
    return out_path


def load_exported(path):
    """Load a serialized artifact; returns an object with ``.call(*args)``."""
    return jax_export.deserialize(Path(path).read_bytes())


def build_initial_flat_state(meta: dict) -> np.ndarray:
    """Reconstruct the initial flat state from exported metadata (the same
    contract as the reference's ONNX runtime,
    `package/src/dpdfnet/onnx_backend.py:52-78`)."""
    init = np.zeros(int(meta["state_size"]), np.float32)
    erb = np.array([float(v) for v in meta["erb_norm_init"].split(",")],
                   np.float32)
    spec = np.array([float(v) for v in meta["spec_norm_init"].split(",")],
                    np.float32)
    e = int(meta["erb_norm_state_size"])
    s = int(meta["spec_norm_state_size"])
    init[:e] = erb
    init[e:e + s] = spec
    return init
