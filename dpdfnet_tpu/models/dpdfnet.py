"""DPDFNet forward pass — one functional, time-vectorised code path.

The reference maintains four implementations of this network (offline torch,
streaming torch, ONNX export, TFLite).  Here there is exactly one:

    ``forward_spec(params, cfg, spec, state) -> (spec_e, new_state, lsnr)``

operating on ``spec: [B, T, F, 2]`` (wnorm-scaled STFT frames) with explicit
carried state.  Offline enhancement runs the whole utterance in a single jit
(T = all frames); streaming runs the same function on whatever frames are
buffered (any T >= 1).  Per-frame chunking (T == 1 every call) is
bit-identical regardless of how the caller slices the stream — the engine's
"exact" mode and the contract ``tests/test_stream.py`` pins.  Multi-frame
chunks carry the same state but vectorise the EMA norms with an associative
scan whose reduction tree depends on T, so different multi-frame chunkings
agree only to fp tolerance (~1e-7 per norm, ~1e-5 end-to-end).

Semantics follow the reference *streaming* graph
(`/root/reference/onnx_model/dpdfnet.py:748-806`): output frame ``t`` is the
enhanced version of input frame ``t-2`` (2-frame lookahead realised as delay
lines, which become time-axis shifts here), so the enhanced utterance is the
ISTFT advanced by ``2*win_len`` samples — exactly the reference's offline
alignment (`/root/reference/onnx_model/dpdfnet.py:854-873`).

TPU-first choices (not translations):
- convs/linears evaluate over all T at once as large NHWC convs / GEMMs;
- GRUs hoist input projections out of ``lax.scan`` so only the [B,H]x[H,3H]
  hidden recurrence is sequential;
- EMA feature norms use an associative scan (log-depth) instead of the
  reference's per-frame Python loop (`/root/reference/model/modules.py:479`).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops import nn as onn

Array = jax.Array
Params = Dict
State = Dict

_DB_EPS = 1e-10
_SPEC_EPS = 1e-12


def _pallas_enabled() -> bool:
    from ..ops import pallas_gru

    return pallas_gru.enabled()


def _to_db(x: Array) -> Array:
    return 10.0 * jnp.log10(x + _DB_EPS)


def _safe_sqrt(p: Array) -> Array:
    """sqrt with a zero (not inf) gradient at p == 0.

    Forward-identical to ``jnp.sqrt`` for p >= 0; keeps training stable on
    zero-padded frames without perturbing inference numerics.
    """
    p_safe = jnp.where(p > 0, p, 1.0)
    return jnp.where(p > 0, jnp.sqrt(p_safe), 0.0)


# --------------------------------------------------------------------------- #
# Feature extraction (ERB / complex-spec features + EMA norms)
# --------------------------------------------------------------------------- #

def _features(
    params: Params, cfg: ModelConfig, spec: Array, state: State
) -> Tuple[Array, Array, Array, Array]:
    """Returns (feat_erb [B,T,E], feat_spec [B,T,nb_df,2], mu_last, s_last)."""
    power = jnp.square(spec[..., 0]) + jnp.square(spec[..., 1])     # [B,T,F]
    if cfg.hr:
        # 48 kHz: full-band magnitude in dB (onnx_model/dpdfnet_48khz_hr.py:903)
        feat_erb_raw = _to_db(_safe_sqrt(power))
    else:
        # 16 kHz: ERB-banded power in dB (onnx_model/dpdfnet.py:831-833)
        feat_erb_raw = _to_db(power @ params["erb_fb"].astype(spec.dtype))

    # Associative (log-depth) EMA for multi-frame spans; for T == 1 both
    # forms are the identical single update, so the streaming engine's
    # per-frame scan keeps its bit-exact block-size invariance.
    ema = onn.ema_scan if spec.shape[1] == 1 else onn.ema_scan_assoc
    mu = ema(feat_erb_raw, state["erb_norm"], cfg.alpha)
    feat_erb = (feat_erb_raw - mu) / 40.0

    feat_spec_raw = spec[:, :, : cfg.nb_df, :]
    mag = _safe_sqrt(
        jnp.square(feat_spec_raw[..., 0]) + jnp.square(feat_spec_raw[..., 1])
    )
    s = ema(mag, state["spec_norm"], cfg.alpha)
    feat_spec = feat_spec_raw / jnp.sqrt(s + _SPEC_EPS)[..., None]

    return feat_erb, feat_spec, mu[:, -1], s[:, -1]


# --------------------------------------------------------------------------- #
# DPRNN
# --------------------------------------------------------------------------- #

def _dprnn_block(
    p: Params, x: Array, h_inter: Array
) -> Tuple[Array, Array]:
    """Dual-path block on x [B,T,Fq,C]; h_inter [B,Fq,C] is the time-GRU carry.

    Intra: bidirectional GRU along frequency (stateless; full axis available
    each frame).  Inter: unidirectional GRU along time with carried hidden.
    Reference: `/root/reference/onnx_model/layers.py:109-196`.
    """
    B, T, Fq, C = x.shape
    xi = x.reshape(B * T, Fq, C)
    intra = p["intra"]
    packed = intra.get("packed")
    if packed is not None and Fq >= 2 and _pallas_enabled():
        # Whole intra stage (bidir GRU + fc + LN + residual) as one Pallas
        # kernel: the row tile never leaves VMEM between the recurrence and
        # the epilogue (see ops.pallas_gru.dprnn_intra_block).
        from ..ops import pallas_gru

        x = pallas_gru.dprnn_intra_block(
            xi, packed["wi2"], packed["wh2"], packed["b2"],
            intra["fc"]["w"], intra["fc"]["b"],
            intra["ln"]["g"], intra["ln"]["b"],
            precision=onn._ambient_precision(),
            interpret=pallas_gru.interpret_default(),
        ).reshape(B, T, Fq, C)
    else:
        yi = onn.gru_bidir(intra["fw"], intra["bw"], xi, packed=packed)
        yi = onn.layer_norm(intra["ln"], onn.linear(intra["fc"], yi))
        x = x + yi.reshape(B, T, Fq, C)

    xt = jnp.swapaxes(x, 1, 2).reshape(B * Fq, T, C)         # [(B F), T, C]
    yt, h_new = onn.gru_seq(p["inter"]["gru"], xt, h0=h_inter.reshape(B * Fq, C))
    yt = onn.layer_norm(p["inter"]["ln"], onn.linear(p["inter"]["fc"], yt))
    # .astype keeps the plane at x's dtype when the carried hidden rides
    # in f32 (exact-stream bf16 tiers) — yt would otherwise promote it
    y = x + jnp.swapaxes(yt.reshape(B, Fq, T, C), 1, 2).astype(x.dtype)
    return y, h_new.reshape(B, Fq, C)


def _dprnn(
    p_blocks: List[Params], x: Array, hs: List[Array],
    stacked: Optional[Params] = None,
    out_fm: bool = False,
):
    """Run the DPRNN stack.  Returns ``(out, new_hs)``; with
    ``out_fm=True`` returns ``(out, new_hs, layout)`` where layout
    ``"fm"`` means out is the stack's native freq-leading plane
    ``[Fq, T, B, C]`` (the transpose back to batch-major was skipped —
    callers whose next op contracts the flattened ``(f c)`` axis fold
    it into that contraction, see ``ops.nn.grouped_linear_fm``) and
    ``"bt"`` means the usual ``[B, T, Fq, C]``."""
    if len(p_blocks) != len(hs):
        raise ValueError(
            f"state carries {len(hs)} DPRNN block hiddens but the model has "
            f"{len(p_blocks)} blocks — state from a different configuration?")
    if p_blocks and _pallas_enabled():
        from ..ops import pallas_gru

        if stacked is not None and pallas_gru.stack_enabled():
            # Whole stack in merged intra+inter kernels: the inter-stage
            # plane never round-trips HBM (see pallas_gru.dprnn_stack).
            xt = jnp.swapaxes(x, 0, 1)                    # [T, B, Fq, C]
            out, hl = pallas_gru.dprnn_stack(
                xt, jnp.stack(hs), stacked,
                precision=onn._ambient_precision(),
                interpret=pallas_gru.interpret_default(),
            )
            out = jnp.swapaxes(out, 0, 1)
            return (out, list(hl), "bt") if out_fm else (out, list(hl))
        if all(p["intra"].get("packed") is not None for p in p_blocks):
            return _dprnn_fused(p_blocks, x, hs, out_fm=out_fm)
    new_hs: List[Array] = []
    for p, h in zip(p_blocks, hs):
        x, h_new = _dprnn_block(p, x, h)
        new_hs.append(h_new)
    return (x, new_hs, "bt") if out_fm else (x, new_hs)


def _dprnn_fused(
    p_blocks: List[Params], x: Array, hs: List[Array],
    out_fm: bool = False,
):
    """Time-major DPRNN stack on fused Pallas kernels.

    In ``[T, B, Fq, C]`` layout the intra stage's rows ``(T*B, Fq, C)`` and
    the inter stage's rows ``(T, B*Fq, C)`` are both free reshapes, so the
    whole stack runs with ONE transpose in and one out (instead of two per
    block), and each stage is a single kernel that applies its
    GRU + fc + LayerNorm + residual without materialising intermediates
    (see ops.pallas_gru.dprnn_intra_block / dprnn_inter_block).
    """
    from ..ops import pallas_gru

    prec = onn._ambient_precision()
    interp = pallas_gru.interpret_default()
    use_v2 = pallas_gru.v2_enabled(prec)
    B, T, Fq, C = x.shape
    xt = jnp.swapaxes(x, 0, 1)                                # [T, B, Fq, C]
    # Optional bf16 plane streaming between the kernels (in-kernel math
    # stays f32; see pallas_gru.plane_io_bf16).  The casts fuse into the
    # transpose copies in/out of the time-major stack.
    io_bf16 = (not use_v2 and x.dtype == jnp.float32
               and Fq % 8 == 0 and pallas_gru.plane_io_bf16(prec))
    if io_bf16:
        xt = xt.astype(jnp.bfloat16)
    # Transpose-free freq-chained stack (DPDFNET_TPU_INTRA_TM): the
    # intra stage consumes a scan-leading [Fq, T*B, C] plane (clean
    # leading-dim loads — the row-major walk's mid-dim sublane extracts
    # were its measured step floor) and its epilogue WRITES the f-major
    # 4-D plane the inter stage reshapes for free; the inter kernel in
    # turn writes the freq-leading plane the next intra wants.  Static
    # in-kernel stores do all the relayout work, so the only XLA
    # transposes of the big plane are one in and one out of the stack.
    # B >= 32 floor: the fm kernels' epilogues emit round(tile/B) static
    # stores per step (Python-unrolled in the Mosaic program), so a tiny
    # batch inflates program size and the minutes-long remote compile for
    # no throughput win — the row-major kernels are the right tool there.
    use_tm = (not use_v2 and Fq % 8 == 0 and B % 8 == 0 and B >= 32
              and pallas_gru.intra_tm_enabled())
    new_hs: List[Array] = []
    if use_tm:
        # one transpose into the freq-leading chain; the kernels keep the
        # layout cycle closed until the stack exit.  Env-gated Pallas
        # relayout (DPDFNET_TPU_ENTRY_RELAYOUT) replaces the XLA
        # transpose with block DMAs + static sublane extracts and folds
        # the bf16 plane cast into its store (see pallas_gru.relayout_fm).
        if pallas_gru.entry_relayout_enabled():
            plane = pallas_gru.relayout_fm(
                x, out_dtype=xt.dtype, interpret=interp,
            ).reshape(Fq, T * B, C)
        else:
            plane = jnp.transpose(xt, (2, 0, 1, 3)).reshape(Fq, T * B, C)
        for p, h in zip(p_blocks, hs):
            intra, inter = p["intra"], p["inter"]
            pk = intra["packed"]
            g = inter["gru"]
            xi4 = pallas_gru.dprnn_intra_block_tm(
                plane,
                pk["wi2"], pk["wh2"], pk["b2"],
                intra["fc"]["w"], intra["fc"]["b"],
                intra["ln"]["g"], intra["ln"]["b"],
                precision=prec, interpret=interp, fm_batch=B,
            )                                          # [T, Fq, B, C]
            # h stays in its batch-major state layout: the kernel ingests
            # and emits it with static window extracts (h_bm), so neither
            # an XLA transpose copy nor (with f32 carried hiddens, see
            # Engine.init_stream_state) a dtype convert touches the
            # hidden per frame — both were profiled round 5 as the top
            # per-frame fixed costs of the exact streaming path.
            use_hbm = pallas_gru.h_ingest_enabled()
            out4, h_new = pallas_gru.dprnn_inter_block(
                xi4.reshape(T, Fq * B, C),
                h if use_hbm else jnp.swapaxes(h, 0, 1).reshape(Fq * B, C),
                g["wi"], g["bi"], g["wh"], g["bh"],
                inter["fc"]["w"], inter["fc"]["b"],
                inter["ln"]["g"], inter["ln"]["b"],
                precision=prec, interpret=interp, fm_batch=B,
                h_bm=use_hbm,
            )                                          # [Fq, T, B, C]
            plane = out4.reshape(Fq, T * B, C)
            if not use_hbm:
                h_new = jnp.swapaxes(h_new.reshape(Fq, B, C), 0, 1)
            new_hs.append(h_new.astype(h.dtype))
        if out_fm:
            # hand back the chain's native freq-leading plane — the
            # exit transpose (one of the two remaining big-plane XLA
            # relayouts) never happens; the caller contracts (f, c)
            # directly (grouped_linear_fm)
            return (plane.reshape(Fq, T, B, C).astype(x.dtype), new_hs,
                    "fm")
        out_tb = jnp.transpose(
            plane.reshape(Fq, T, B, C), (2, 1, 0, 3))  # [B, T, Fq, C]
        return out_tb.astype(x.dtype), new_hs
    for p, h in zip(p_blocks, hs):
        intra, inter = p["intra"], p["inter"]
        pk = intra["packed"]
        g = inter["gru"]
        # Intra: the v1 kernel.  (The v2 variant hoisting xp into VMEM
        # scratch — dprnn_intra_block_v2 — measured SLOWER e2e on v5e,
        # 1021 -> 981 xRT: the per-step double xp load + gate-column select
        # costs more VPU than the removed blockdiag dot saved on the MXU.
        # Env-gated via DPDFNET_TPU_PALLAS_V2; see pallas_gru.v2_enabled.)
        xi = pallas_gru.dprnn_intra_block(
            xt.reshape(T * B, Fq, C),
            pk["wi2"], pk["wh2"], pk["b2"],
            intra["fc"]["w"], intra["fc"]["b"],
            intra["ln"]["g"], intra["ln"]["b"],
            precision=prec, interpret=interp,
        )
        if use_v2 and "whfc" in inter:
            # Inter v2: xp hoisted to one big XLA GEMM; in-kernel the fc is
            # deferred one step so each step runs a single fused dot
            # h_new @ [Wh | Wfc] (exact math; see ops.pallas_gru).
            xr = xi.reshape(T, B * Fq, C)
            xp = (xr @ g["wi"].astype(xr.dtype)
                  + g["bi"].astype(xr.dtype)).astype(jnp.bfloat16)
            out, h_new = pallas_gru.dprnn_inter_block_v2(
                xp, xr, h.reshape(B * Fq, C),
                inter["whfc"], g["bh"],
                inter["fc"]["b"], inter["ln"]["g"], inter["ln"]["b"],
                precision=prec, interpret=interp,
            )
        else:
            out, h_new = pallas_gru.dprnn_inter_block(
                xi.reshape(T, B * Fq, C), h.reshape(B * Fq, C),
                g["wi"], g["bi"], g["wh"], g["bh"],
                inter["fc"]["w"], inter["fc"]["b"],
                inter["ln"]["g"], inter["ln"]["b"],
                precision=prec, interpret=interp,
            )
        xt = out.reshape(T, B, Fq, C)
        # keep the carried hidden at the STATE's dtype (the inter
        # kernel returns its f32 compute dtype under bf16 plane IO;
        # the exact-stream state carries f32 hiddens — see init_stream_state)
        new_hs.append(h_new.reshape(B, Fq, C).astype(h.dtype))
    out = jnp.swapaxes(xt, 0, 1).astype(x.dtype)
    return (out, new_hs, "bt") if out_fm else (out, new_hs)


# --------------------------------------------------------------------------- #
# Squeezed GRU stack (grouped-linear in -> GRU layers -> grouped-linear out)
# --------------------------------------------------------------------------- #

def _squeezed_gru(
    p: Params, x: Array, hs: List[Array], skip: str = "none",
    skip_position: str = "output",
) -> Tuple[Array, List[Array]]:
    """Squeezed GRU stack.

    ``skip_position`` selects between the two reference module generations:
    ``"output"`` is SqueezedGRU_S (model/modules.py:1037-1094) — the skip
    sees the RAW input and is added after linear_out; ``"inner"`` is the
    legacy SqueezedGRU (model/modules.py:980-1034) — the skip sees the
    linear_in output and is added to the GRU output BEFORE linear_out.
    No shipped checkpoint uses the legacy variant; it is provided (and
    parity-tested) for state dicts predating the _S rewrite.
    """
    h = x_in = onn.grouped_linear(p["lin_in"], x, act="relu")
    if len(p["grus"]) != len(hs):
        raise ValueError(
            f"state carries {len(hs)} GRU hiddens but this SqueezedGRU has "
            f"{len(p['grus'])} layers — state from a different configuration?")
    new_hs: List[Array] = []
    n_layers = len(p["grus"])
    for li, (gp, h0) in enumerate(zip(p["grus"], hs)):
        if "groups" in gp:
            # grouped GRU layer (cfg.group_gru > 1): independent GRUs over
            # channel groups, shuffled between layers but not after the
            # last (reference GroupedGRU, model/modules.py:1240-1252).
            # Layer state stays one [B, H] vector: group-major chunks.
            g = len(gp["groups"])
            h0s = list(jnp.split(h0, g, axis=-1))
            h, h_lasts = onn.grouped_gru_seq(
                gp["groups"], h, h0s=h0s, shuffle_out=li < n_layers - 1)
            new_hs.append(jnp.concatenate(h_lasts, axis=-1))
        else:
            h, h_last = onn.gru_seq(gp, h, h0=h0)
            new_hs.append(h_last)
    if skip_position == "inner":
        # legacy SqueezedGRU: skip(linear_in(x)) added before linear_out
        # (model/modules.py:1013-1018; gru_skip_op is Identity there)
        if skip == "identity":
            h = h + x_in
        elif skip == "groupedlinear":
            g, ig, _ = p["skip"]["w"].shape
            h = h + onn.grouped_linear(p["skip"], x_in[..., : g * ig])
        if "lin_out" in p:
            h = onn.grouped_linear(p["lin_out"], h, act="relu")
        return h, new_hs
    if "lin_out" in p:
        h = onn.grouped_linear(p["lin_out"], h, act="relu")
    # optional gru_skip applied to the raw input after linear_out
    # (reference SqueezedGRU_S — onnx_model/layers.py:1182-1184)
    if skip == "identity":
        h = h + x
    elif skip == "groupedlinear":
        # reference quirk: the loop-form GroupedLinear slices per group and
        # silently consumes only its declared input size — the encoder's
        # skip sees just the first half of the concatenated embedding
        # (model/modules.py:929-933 with input_size=emb_out_dim)
        g, ig, _ = p["skip"]["w"].shape
        h = h + onn.grouped_linear(p["skip"], x[..., : g * ig])
    return h, new_hs


# --------------------------------------------------------------------------- #
# Encoder
# --------------------------------------------------------------------------- #

def _encoder(
    params: Params, cfg: ModelConfig, feat_erb: Array, feat_spec: Array, state: State
) -> Tuple[Tuple[Array, ...], Array, Array, Array, State]:
    """Returns ((e0,e1,e2,e3), emb, c0, lsnr, state_updates)."""
    p = params["enc"]
    kt, kf = cfg.conv_kernel_inp
    _, kfc = cfg.conv_kernel
    s1, s2, s3 = cfg.erb_fstrides

    x_erb = feat_erb[..., None]                                  # [B,T,E,1]
    tail_in = state["erb_conv0_tail"]
    if cfg.hr:
        # full-band branch drops the Nyquist bin before conv0
        x_in, tail = x_erb[:, :, :-1, :], tail_in[:, :, :-1, :]
    else:
        x_in, tail = x_erb, tail_in
    new_erb_tail = jnp.concatenate([tail_in, x_erb], axis=1)[:, -2:]

    if cfg.hr and "erb_conv0_folded" in p:
        # frequency-folded 480-bin plane (see models.fuse.fold_hr_tail):
        # e0 lives as [B,T,160,3C]; erb_conv1's stride-3 becomes stride 1.
        B_, _, Fb, _ = x_in.shape
        Ff = Fb // s1
        x_f = x_in.reshape(B_, x_in.shape[1], Ff, s1)
        tail_f = tail.reshape(B_, tail.shape[1], Ff, s1)
        e0, _ = onn.conv_block(p["erb_conv0_folded"], x_f, kt=kt, kf=kf,
                               act="relu", time_tail=tail_f)
        e1, _ = onn.conv_block(p["erb_conv1_folded"], e0, kt=1, kf=2,
                               fpad=(1, 0), act="relu")
    else:
        e0, _ = onn.conv_block(p["erb_conv0"], x_in, kt=kt, kf=kf,
                               act="relu", time_tail=tail)
        e1, _ = onn.conv_block(p["erb_conv1"], e0, kt=1, kf=kfc, fstride=s1,
                               act="relu")
    e2, _ = onn.conv_block(p["erb_conv2"], e1, kt=1, kf=kfc, fstride=s2,
                           act="relu")
    e3, _ = onn.conv_block(p["erb_conv3"], e2, kt=1, kf=kfc, fstride=s3,
                           act="relu")
    # hr: e3d feeds ONLY the flattened-(f c) erb_fc_emb contraction, so
    # ask for the stack's native freq-leading plane and fold the exit
    # transpose into that contraction (grouped_linear_fm); non-hr uses
    # the flat plane directly and keeps the batch-major layout.
    if cfg.hr:
        e3d, new_dprnn_erb, e3d_layout = _dprnn(
            p["dprnn_erb"], e3, state["dprnn_erb"],
            stacked=p.get("dprnn_erb_stacked"), out_fm=True)
    else:
        e3d, new_dprnn_erb = _dprnn(
            p["dprnn_erb"], e3, state["dprnn_erb"],
            stacked=p.get("dprnn_erb_stacked"))
        e3d_layout = "bt"

    c0, new_df_tail = onn.conv_block(
        p["df_conv0"], feat_spec, kt=kt, kf=kf, act="relu",
        time_tail=state["df_conv0_tail"],
    )
    c1, _ = onn.conv_block(p["df_conv1"], c0, kt=1, kf=kfc, fstride=2,
                           act="relu")
    c1d, new_dprnn_df, c1d_layout = _dprnn(
        p["dprnn_df"], c1, state["dprnn_df"],
        stacked=p.get("dprnn_df_stacked"), out_fm=True)

    B, T = feat_erb.shape[:2]
    if c1d_layout == "fm":
        cemb = onn.grouped_linear_fm(p["df_fc_emb"], c1d, act="relu")
    else:
        cemb = onn.grouped_linear(p["df_fc_emb"], c1d.reshape(B, T, -1),
                                  act="relu")                     # [(f c)]
    if cfg.hr:
        if e3d_layout == "fm":
            emb = onn.grouped_linear_fm(p["erb_fc_emb"], e3d, act="relu")
        else:
            emb = onn.grouped_linear(p["erb_fc_emb"],
                                     e3d.reshape(B, T, -1), act="relu")
    else:
        emb = e3d.reshape(B, T, -1)
    emb = jnp.concatenate([emb, cemb], axis=-1)
    emb, new_enc_gru = _squeezed_gru(p["emb_gru"], emb, state["enc_gru"],
                                    skip=cfg.emb_gru_skip)

    lsnr = jax.nn.sigmoid(onn.linear(p["lsnr"], emb))[..., 0]
    lsnr = lsnr * (cfg.lsnr_max - cfg.lsnr_min) + cfg.lsnr_min

    updates = {
        "erb_conv0_tail": new_erb_tail,
        "df_conv0_tail": new_df_tail,
        "dprnn_erb": new_dprnn_erb,
        "dprnn_df": new_dprnn_df,
        "enc_gru": new_enc_gru,
    }
    return (e0, e1, e2, e3), emb, c0, lsnr, updates


# --------------------------------------------------------------------------- #
# Decoders
# --------------------------------------------------------------------------- #

def _erb_decoder(
    params: Params, cfg: ModelConfig, emb: Array,
    e0: Array, e1: Array, e2: Array, e3: Array, hs: List[Array],
) -> Tuple[Array, List[Array]]:
    """Predicts the gain mask m [B,T,mask_bins(+1 for hr)]."""
    p = params["erb_dec"]
    _, kfc = cfg.conv_kernel
    st3, st2, st1 = cfg.dec_fstrides
    C = cfg.conv_ch

    e, new_hs = _squeezed_gru(p["emb_gru"], emb, hs, skip=cfg.emb_gru_skip)
    if cfg.hr:
        e = onn.grouped_linear(p["erb_fc_emb"], e, act="relu")
    B, T = e.shape[:2]
    e = e.reshape(B, T, cfg.dec_f8, C)

    def up(pp, x, fstride):
        if fstride == 1:
            y, _ = onn.conv_block(pp, x, kt=1, kf=kfc, act="relu")
            return y
        if cfg.upsample == "transpose":
            return onn.conv_transpose_block(pp, x, kf=kfc, fstride=fstride,
                                            act="relu")
        return onn.subpixel_block(pp, x, kf=kfc, fstride=fstride, act="relu")

    def pconv(pp, x):
        # 1x1 pathway convs are depthwise: Conv2dNormAct computes
        # groups=gcd(in,out)=C before disabling the pointwise stage
        # (model/modules.py:685-715).
        y, _ = onn.conv_block(pp, x, kt=1, kf=1, act="relu")
        return y

    x3 = up(p["convt3"], pconv(p["conv3p"], e3) + e, st3)
    x2 = up(p["convt2"], pconv(p["conv2p"], e2) + x3, st2)
    if cfg.hr and "conv0_out_folded" in p:
        # frequency-folded tail: the last upsample stays in its pre-
        # interleave [160, 3C] form, the skip (e0 is already folded, conv0p
        # is a channel-tiled depthwise) adds in place, and the mask head
        # emits its 3 phases as channels — the [.., 480, 64] plane and the
        # [.., 480, 1] mask-head layout never materialise.
        x1z = onn.subpixel_block(p["convt1_folded"],
                                 pconv(p["conv1p"], e1) + x2,
                                 kf=kfc, fstride=st1, act="relu", fold=True)
        e0p, _ = onn.conv_block(p["conv0p_folded"], e0, kt=1, kf=1,
                                act="relu")
        mf, _ = onn.conv_block(p["conv0_out_folded"], e0p + x1z,
                               kt=1, kf=kfc, act="sigmoid")   # [B,T,160,3]
        m = mf.reshape(mf.shape[0], mf.shape[1], -1)
    else:
        x1 = up(p["convt1"], pconv(p["conv1p"], e1) + x2, st1)
        m, _ = onn.conv_block(p["conv0_out"], pconv(p["conv0p"], e0) + x1,
                              kt=1, kf=kfc, act="sigmoid")
        m = m[..., 0]                                            # [B,T,E0]
    if cfg.hr:
        # mirror-duplicate the top bin: 480 -> 481 bins
        m = jnp.concatenate([m, m[:, :, -2:-1]], axis=-1)
    return m, new_hs


def _df_decoder(
    params: Params, cfg: ModelConfig, emb: Array, c0: Array, state: State
) -> Tuple[Array, State]:
    """Predicts DF coefficients [B,T,nb_df,O,2]."""
    p = params["df_dec"]
    c, new_hs = _squeezed_gru(p["df_gru"], emb, state["df_gru"])
    c = c + onn.grouped_linear(p["df_skip"], emb)
    c0p, new_tail = onn.conv_block(
        p["df_convp"], c0, kt=cfg.df_kt, kf=1, act="relu",
        time_tail=state["df_convp_tail"],
    )                                                            # [B,T,nb_df,2O]
    c = onn.grouped_linear(p["df_out"], c, act="tanh")
    B, T = c.shape[:2]
    c = c.reshape(B, T, cfg.nb_df, 2 * cfg.df_order) + c0p
    coefs = c.reshape(B, T, cfg.nb_df, cfg.df_order, 2)
    return coefs, {"df_gru": new_hs, "df_convp_tail": new_tail}


# --------------------------------------------------------------------------- #
# Mask application + deep filtering (delay lines as time shifts)
# --------------------------------------------------------------------------- #

def _apply_df(cfg: ModelConfig, dfin: Array, coefs: Array, state: State):
    """5-frame DF window over ``dfin`` x 2-frame-delayed coefs
    (onnx_model/multiframe.py:200-232).  Returns (lower, middle_frame,
    state updates); ``middle_frame`` is dfin[t-2] (the ring's centre slot,
    used for the upper bins)."""
    T = dfin.shape[1]
    nb, O = cfg.nb_df, cfg.df_order
    y_ext = jnp.concatenate([state["df_spec_tail"], dfin], axis=1)
    win = jnp.stack([y_ext[:, n: n + T, :nb] for n in range(O)], axis=2)
    coefs_ext = jnp.concatenate([state["df_coefs_tail"], coefs], axis=1)
    cd = jnp.swapaxes(coefs_ext[:, :T], 2, 3)                     # [B,T,O,nb,2]

    wr, wi = win[..., 0], win[..., 1]
    cr, ci = cd[..., 0], cd[..., 1]
    out_r = jnp.sum(wr * cr - wi * ci, axis=2)
    out_i = jnp.sum(wr * ci + wi * cr, axis=2)
    lower = jnp.stack([out_r, out_i], axis=-1)                    # [B,T,nb,2]
    middle = y_ext[:, 2: 2 + T]                                   # dfin[t-2]
    updates = {
        "df_spec_tail": y_ext[:, -4:],
        "df_coefs_tail": coefs_ext[:, -2:],
    }
    return lower, middle, updates


def valin_post_filter(mask: Array, beta: float = 0.02,
                      eps: float = 1e-12) -> Array:
    """Valin et al. perceptual post-filter on a real gain mask.

    ``g' = (1+beta)*g / (1 + beta*(g / (g*sin(pi*g/2)))^2)`` — slightly
    deepens mid-range attenuation while leaving g≈0 and g≈1 fixed points.
    Mirrors the reference ``Mask.pf`` (model/modules.py:415-426), which is
    inference-only and off in every shipped checkpoint.
    """
    mask_sin = mask * jnp.sin(jnp.pi * mask / 2)
    ratio = mask / jnp.maximum(mask_sin, eps)
    return (1 + beta) * mask / (1 + beta * ratio * ratio)


def clamp_mask_atten_lim(mask: Array, atten_lim_db: Array) -> Array:
    """Floor the gain mask at ``10^(-atten_lim_db/20)`` per utterance.

    ``atten_lim_db`` is ``[B]`` (dB of maximum attenuation); mask is
    ``[B, T, Fe]``.  Mirrors the reference ``Mask.forward``'s clamp
    (model/modules.py:433-445) — note this is the *model-level* mask floor,
    distinct from the package-level 4-frame noisy/enhanced spectral blend
    (``audio.apply_attn_limit``).
    """
    floor = 10.0 ** (-atten_lim_db.astype(mask.dtype) / 20.0)
    return jnp.maximum(mask, floor[:, None, None])


def _mask_and_df(
    params: Params, cfg: ModelConfig, spec: Array, m: Array, coefs: Array,
    state: State, atten_lim_db: Optional[Array] = None,
) -> Tuple[Array, State]:
    """Gain-mask + deep-filter combination per ``cfg.mask_method``
    (onnx_model/dpdfnet.py:783-800; shipped checkpoints use 'before_df')."""
    B, T, F, _ = spec.shape
    nb = cfg.nb_df

    if cfg.hr:
        # The reference HR models multiply the per-bin mask directly and
        # never instantiate the ERB ``Mask`` module, so the post-filter /
        # atten-lim options have no HR analogue (model/dpdfnet_48khz_hr.py:
        # 584-593).  ``config.py`` rejects post_filter on HR configs.
        mask = m                                                  # per-bin
    else:
        if cfg.post_filter:
            m = valin_post_filter(m)
        if atten_lim_db is not None:
            m = clamp_mask_atten_lim(m, jnp.asarray(atten_lim_db))
        mask = m @ params["erb_inv_fb"].astype(m.dtype)           # [B,T,F]

    def delayed_masked(x):
        # mask the 2-frame-delayed input with the current mask (lookahead):
        # onnx_model/layers.py:414-445
        ext = jnp.concatenate([state["mask_spec_tail"], x], axis=1)
        return ext[:, :T] * mask[..., None], ext[:, -2:]

    if cfg.mask_method == "before_df":
        masked, new_mask_tail = delayed_masked(spec)
        lower, middle, updates = _apply_df(cfg, masked, coefs, state)
        spec_e = jnp.concatenate([lower, middle[:, :, nb:]], axis=2)
    elif cfg.mask_method == "separate":
        # DF over the RAW spec ring; upper bins from the masked delayed spec
        masked, new_mask_tail = delayed_masked(spec)
        lower, _middle, updates = _apply_df(cfg, spec, coefs, state)
        spec_e = jnp.concatenate([lower, masked[:, :, nb:]], axis=2)
    elif cfg.mask_method == "after_df":
        # DF over the raw spec; the mask's delay line then holds the DF
        # output (a further 2-frame delay, as in the reference)
        lower, middle, updates = _apply_df(cfg, spec, coefs, state)
        dfed = jnp.concatenate([lower, middle[:, :, nb:]], axis=2)
        spec_e, new_mask_tail = delayed_masked(dfed)
    else:
        raise ValueError(f"unknown mask_method: {cfg.mask_method!r}")

    updates["mask_spec_tail"] = new_mask_tail
    return spec_e, updates


# --------------------------------------------------------------------------- #
# Full forward
# --------------------------------------------------------------------------- #

def forward_spec(
    params: Params, cfg: ModelConfig, spec: Array, state: State,
    *, atten_lim_db: Optional[Array] = None,
) -> Tuple[Array, State, Array]:
    """Enhance ``spec: [B, T, F, 2]`` (wnorm-scaled STFT frames).

    Returns (spec_e [B,T,F,2], new_state, lsnr [B,T]).  Output frame ``t``
    is the enhanced input frame ``t-2`` (2-frame lookahead delay).
    ``atten_lim_db`` ([B], optional, 16 kHz configs only) floors the ERB
    gain mask at ``10^(-dB/20)`` per utterance before it is expanded to
    bins — the reference ``Mask``'s atten_lim semantics.
    """
    feat_erb, feat_spec, mu_last, s_last = _features(params, cfg, spec, state)
    (e0, e1, e2, e3), emb, c0, lsnr, enc_up = _encoder(
        params, cfg, feat_erb, feat_spec, state
    )
    m, new_erb_dec = _erb_decoder(params, cfg, emb, e0, e1, e2, e3,
                                  state["erb_dec_gru"])
    coefs, df_up = _df_decoder(params, cfg, emb, c0, state)
    spec_e, mask_up = _mask_and_df(params, cfg, spec, m, coefs, state,
                                   atten_lim_db=atten_lim_db)

    new_state = dict(state)
    new_state["erb_norm"] = mu_last
    new_state["spec_norm"] = s_last
    new_state.update(enc_up)
    new_state["erb_dec_gru"] = new_erb_dec
    new_state.update(df_up)
    new_state.update(mask_up)
    return spec_e, new_state, lsnr


def step(
    params: Params, cfg: ModelConfig, frame: Array, state: State
) -> Tuple[Array, State, Array]:
    """Single-frame step: ``frame [B, F, 2]`` -> enhanced ``[B, F, 2]``."""
    spec_e, new_state, lsnr = forward_spec(params, cfg, frame[:, None], state)
    return spec_e[:, 0], new_state, lsnr[:, 0]
