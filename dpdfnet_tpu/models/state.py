"""Streaming state: pytree definition, initialisation, flat-vector adapter.

The reference threads all recurrent state through a single offset-indexed
float32 vector (`/root/reference/onnx_model/dpdfnet.py:715-806`).  Here the
state is an explicit nested-dict pytree — the natural carry for
``jax.lax.scan`` and for donation under jit — holding, per stream:

- EMA normaliser values (``erb_norm`` mu, ``spec_norm`` s),
- causal-conv time context tails (last ``k_t - 1`` input frames),
- GRU hidden vectors (embedding/decoder stacks and DPRNN inter-GRUs),
- the mask/deep-filter delay lines (raw spec x2, masked spec x4, coefs x2).

``flatten_state``/``unflatten_state`` convert to/from the reference's flat
layout for checkpointing a live stream and for state interchange with the
ONNX runtime.  Note: the reference's ring buffers each keep one slot that is
dropped before first use on the next call (the oldest frame of every
``time_steps+delay`` ring); this pytree stores only the *sufficient* frames,
so those redundant slots round-trip as zeros.  Behaviour is identical in
both directions.
"""

from __future__ import annotations

from typing import Dict, List

import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from . import init_norms


Array = jnp.ndarray
State = Dict


def _check_layout_assumptions(cfg: ModelConfig) -> None:
    """Fail fast on configs the fixed state layout cannot represent.

    The ring/tail sizes here, in ``flatten_state`` and in
    ``dpdfnet._apply_df`` are hard-pinned to the model family's shared
    hyperparameters (kt=3 input convs, df_kt=5, df_order=5, lookahead=2 —
    identical across all six shipped checkpoints and the reference's
    streaming graph, `/root/reference/onnx_model/dpdfnet.py:715-746`).  A
    config deviating from them would otherwise mis-size a tail silently
    and surface as an opaque broadcast error deep in the decoders."""
    fixed = {"conv_kernel_inp[0]": (cfg.conv_kernel_inp[0], 3),
             "df_kt": (cfg.df_kt, 5),
             "df_order": (cfg.df_order, 5),
             "lookahead": (cfg.lookahead, 2)}
    bad = {k: got for k, (got, want) in fixed.items() if got != want}
    if bad:
        raise NotImplementedError(
            f"state layout supports only the model family's fixed "
            f"hyperparameters; got {bad} (expected "
            f"{ {k: want for k, (_, want) in fixed.items()} })")


def init_state(cfg: ModelConfig, batch: int = 1, dtype=jnp.float32) -> State:
    """Fresh per-stream state for a batch of independent streams."""
    _check_layout_assumptions(cfg)
    C = cfg.conv_ch
    F = cfg.freq_bins
    E = F if cfg.hr else cfg.nb_erb       # erb/mag norm + conv0 feature width
    nb_df = cfg.nb_df
    O = cfg.df_order
    H = cfg.gru_dim

    def z(*shape):
        return jnp.zeros((batch,) + shape, dtype=dtype)

    erb_mu0 = init_norms.mag_norm_init(E) if cfg.hr else init_norms.erb_norm_init(E)
    spec_s0 = init_norms.spec_norm_init(nb_df, cfg.hr)

    dprnn_erb = [z(cfg.dprnn_erb_feat, C) for _ in range(cfg.dprnn_blocks)]
    dprnn_df = [z(cfg.dprnn_df_feat, C) for _ in range(cfg.dprnn_blocks)]

    return {
        "erb_norm": jnp.broadcast_to(jnp.asarray(erb_mu0, dtype), (batch, E)),
        "spec_norm": jnp.broadcast_to(jnp.asarray(spec_s0, dtype), (batch, nb_df)),
        "erb_conv0_tail": z(2, E, 1),            # feat_erb frames (full width)
        "dprnn_erb": dprnn_erb,
        "df_conv0_tail": z(2, nb_df, 2),         # feat_spec frames
        "dprnn_df": dprnn_df,
        "enc_gru": [z(H)],                       # encoder emb_gru (1 layer)
        "erb_dec_gru": [z(H), z(H)],
        "df_gru": [z(H), z(H)],
        "df_convp_tail": z(4, nb_df, C),         # c0 frames for the (5,1) conv
        "mask_spec_tail": z(2, F, 2),            # raw spec delay line
        "df_coefs_tail": z(2, nb_df, O, 2),      # coefs delay line
        "df_spec_tail": z(4, F, 2),              # masked-spec ring tail
    }


# --------------------------------------------------------------------------- #
# Flat-vector adapter (reference state layout)
# --------------------------------------------------------------------------- #

def state_size(cfg: ModelConfig) -> int:
    """Total floats of the reference flat state vector for this config."""
    C, F, O = cfg.conv_ch, cfg.freq_bins, cfg.df_order
    E = F if cfg.hr else cfg.nb_erb
    nb = cfg.nb_df
    n = 0
    n += E                                   # erb/mag norm
    n += nb                                  # spec norm
    n += 3 * E                               # erb_conv0 ring
    n += cfg.dprnn_blocks * cfg.dprnn_erb_feat * C
    n += 3 * 2 * nb                          # df_conv0 ring
    n += cfg.dprnn_blocks * cfg.dprnn_df_feat * C
    n += cfg.gru_dim                         # enc emb_gru
    n += 2 * cfg.gru_dim                     # erb_dec gru
    n += 2 * cfg.gru_dim                     # df gru
    n += 5 * C * nb                          # df_convp ring
    n += 3 * F * 2                           # mask spec ring
    n += 3 * O * nb * 2                      # df coefs ring
    n += 5 * F * 2                           # df spec ring
    return n


def flatten_state(cfg: ModelConfig, state: State, stream: int = 0) -> np.ndarray:
    """Serialize one stream of the pytree into the reference flat layout."""
    C, F, O = cfg.conv_ch, cfg.freq_bins, cfg.df_order
    E = F if cfg.hr else cfg.nb_erb
    nb = cfg.nb_df
    s = {k: np.asarray(v) if not isinstance(v, list) else [np.asarray(u) for u in v]
         for k, v in state.items()}
    chunks: List[np.ndarray] = []

    def ring(tail_frames: np.ndarray, capacity: int) -> np.ndarray:
        """tail [k, ...frame] -> [capacity, ...frame] with zeroed unused slots."""
        k = tail_frames.shape[0]
        out = np.zeros((capacity,) + tail_frames.shape[1:], np.float32)
        out[capacity - k:] = tail_frames
        return out

    chunks.append(s["erb_norm"][stream])
    chunks.append(s["spec_norm"][stream])
    # erb_conv0 ring: frames [3, 1, 1, E]; ours [2, E, 1] -> [2, 1, 1, E]
    t = s["erb_conv0_tail"][stream].transpose(0, 2, 1)[:, None]
    chunks.append(ring(t, 3).reshape(-1))
    for h in s["dprnn_erb"]:
        chunks.append(h[stream].reshape(-1))
    # df_conv0 ring: frames [3, 1, 2, nb]; ours [2, nb, 2] -> [2, 2, nb]
    t = s["df_conv0_tail"][stream].transpose(0, 2, 1)[:, None]
    chunks.append(ring(t, 3).reshape(-1))
    for h in s["dprnn_df"]:
        chunks.append(h[stream].reshape(-1))
    for h in s["enc_gru"]:
        chunks.append(h[stream].reshape(-1))
    for h in s["erb_dec_gru"]:
        chunks.append(h[stream].reshape(-1))
    for h in s["df_gru"]:
        chunks.append(h[stream].reshape(-1))
    # df_convp ring: frames [5, 1, C, nb]; ours [4, nb, C]
    t = s["df_convp_tail"][stream].transpose(0, 2, 1)[:, None]
    chunks.append(ring(t, 5).reshape(-1))
    # mask spec ring: frames [3, 1, 1, F, 2]; ours [2, F, 2]
    chunks.append(ring(s["mask_spec_tail"][stream], 3).reshape(-1))
    # df coefs ring: frames [3, 1, O, nb, 2]; ours [2, nb, O, 2]
    t = s["df_coefs_tail"][stream].transpose(0, 2, 1, 3)
    chunks.append(ring(t, 3).reshape(-1))
    # df spec ring: frames [5, 1, 1, F, 2]; ours [4, F, 2]
    chunks.append(ring(s["df_spec_tail"][stream], 5).reshape(-1))

    flat = np.concatenate([c.astype(np.float32).reshape(-1) for c in chunks])
    assert flat.shape[0] == state_size(cfg), (flat.shape[0], state_size(cfg))
    return flat


def unflatten_state(cfg: ModelConfig, flat: np.ndarray, batch: int = 1) -> State:
    """Rebuild the pytree from a reference-layout flat vector (broadcast to batch)."""
    C, F, O = cfg.conv_ch, cfg.freq_bins, cfg.df_order
    E = F if cfg.hr else cfg.nb_erb
    nb = cfg.nb_df
    flat = np.asarray(flat, np.float32).reshape(-1)
    assert flat.shape[0] == state_size(cfg), (flat.shape[0], state_size(cfg))
    pos = 0

    def take(*shape) -> np.ndarray:
        nonlocal pos
        n = int(np.prod(shape))
        out = flat[pos: pos + n].reshape(shape)
        pos += n
        return out

    def bcast(x: np.ndarray) -> Array:
        return jnp.broadcast_to(jnp.asarray(x), (batch,) + x.shape)

    out: State = {}
    out["erb_norm"] = bcast(take(E))
    out["spec_norm"] = bcast(take(nb))
    r = take(3, 1, 1, E)                           # keep the last 2 frames
    out["erb_conv0_tail"] = bcast(r[1:, 0].transpose(0, 2, 1))
    out["dprnn_erb"] = [bcast(take(cfg.dprnn_erb_feat, C)) for _ in range(cfg.dprnn_blocks)]
    r = take(3, 1, 2, nb)
    out["df_conv0_tail"] = bcast(r[1:, 0].transpose(0, 2, 1))
    out["dprnn_df"] = [bcast(take(cfg.dprnn_df_feat, C)) for _ in range(cfg.dprnn_blocks)]
    out["enc_gru"] = [bcast(take(cfg.gru_dim))]
    out["erb_dec_gru"] = [bcast(take(cfg.gru_dim)) for _ in range(2)]
    out["df_gru"] = [bcast(take(cfg.gru_dim)) for _ in range(2)]
    r = take(5, 1, C, nb)
    out["df_convp_tail"] = bcast(r[1:, 0].transpose(0, 2, 1))
    r = take(3, 1, 1, F, 2)
    out["mask_spec_tail"] = bcast(r[1:, 0, 0])
    r = take(3, 1, O, nb, 2)
    out["df_coefs_tail"] = bcast(r[1:, 0].transpose(0, 2, 1, 3))
    r = take(5, 1, 1, F, 2)
    out["df_spec_tail"] = bcast(r[1:, 0, 0])
    assert pos == flat.shape[0]
    return out
