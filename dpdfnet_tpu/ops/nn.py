"""Neural-net primitives: convs, grouped linears, GRUs, norms.

Everything here is a pure function ``(params, x, ...) -> y`` over NHWC-style
layouts (``[B, T, F, C]`` for 2-D feature maps, ``[B, T, C]`` for sequences).
Parameters are plain nested dicts of ``jnp.ndarray`` (pytrees), produced by
``dpdfnet_tpu.models.convert`` from reference checkpoints or by the random
initialisers in ``dpdfnet_tpu.models.params``.

Reference semantics being matched (with citations):

- ``Conv2dNormAct``: causal time padding ``(k_t-1, 0)``, same-padding over
  frequency, optional depthwise/grouped conv + 1x1 pointwise, BatchNorm2d
  (eval mode -> affine scale/shift), activation
  (`/root/reference/model/modules.py:653-725`).
- ``SubPixelConv2D``: ``fstride`` parallel convs, channel blocks interleaved
  into frequency (`/root/reference/model/modules.py:786-807`).
- ``GroupedLinear(Einsum)``: block-diagonal linear
  (`/root/reference/model/modules.py:867-943`).
- torch GRU gate math with (r, z, n) packing
  (`/root/reference/model/modules.py:980-1094`,
  `/root/reference/onnx_model/layers.py:1206-1259`).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


Array = jax.Array


# --------------------------------------------------------------------------- #
# Activations
# --------------------------------------------------------------------------- #

def apply_act(x: Array, act: Optional[str]) -> Array:
    if act is None or act == "identity":
        return x
    if act == "relu":
        return jax.nn.relu(x)
    if act == "sigmoid":
        return jax.nn.sigmoid(x)
    if act == "tanh":
        return jnp.tanh(x)
    raise ValueError(f"unknown activation {act!r}")


# --------------------------------------------------------------------------- #
# Convolution blocks
# --------------------------------------------------------------------------- #

def _pconv_elementwise() -> bool:
    """Lower 1x1 depthwise convs as elementwise scales (default ON;
    DPDFNET_TPU_PCONV_ELT=0 restores the conv_general_dilated lowering
    for A/B measurement).  Read at trace time.

    Round-5 measurements (dpdfnet8_48khz_hr, one v5e): offline b384 turbo
    2890 vs 2881 xRT (+0.3%, within run variance), exact stream s512
    turbo 3.023 vs the committed 3.013 ms/hop (wash), s256 1.634 vs 1.616
    (wash) — XLA's conv emitter was already cheap for these shapes, but
    the elementwise form is bit-identical, removes four convolution HLOs,
    and fuses into the skip-add chains, so it stays the default."""
    import os

    return os.environ.get(
        "DPDFNET_TPU_PCONV_ELT", "1") not in ("0", "false", "False")


def conv_block(
    p: dict,
    x: Array,
    *,
    kt: int,
    kf: int,
    fstride: int = 1,
    act: Optional[str] = "relu",
    time_tail: Optional[Array] = None,
    fpad: Optional[Tuple[int, int]] = None,
    gemm: bool = False,
) -> Tuple[Array, Optional[Array]]:
    """Causal Conv2d + optional pointwise + BN(eval) + activation.

    The group count is inferred from the weight shape
    (``groups = Cin // w.shape[2]``), so the same forward code serves both
    the reference's separable form (depthwise/grouped conv + 1x1 pointwise)
    and the MXU-fused dense form produced by ``models.fuse`` (where the
    separable pair is collapsed into one dense kernel and ``pw`` is absent).

    Args:
        p: ``{'w': [kt,kf,Cin//groups,Cout], 'b': [Cout]?,
              'pw': {'w': [C,C]}?, 'bn': {'scale','shift'}?}``
        x: ``[B, T, F, Cin]``.
        time_tail: carried context of the last ``kt-1`` input frames
            ``[B, kt-1, F, Cin]`` (zeros == offline causal zero-pad).

    Returns:
        (y ``[B, T, F', Cout]``, new_tail) — new_tail is the last ``kt-1``
        frames of the (tail-extended) input, or None when ``kt == 1``.

    Layout note: activations are batch-major [B, T, F, C] by design.  A
    whole-forward time-major [T, B, F, C] variant was built and measured
    on v5e (b256 'default', segment scan): 1465x with per-tap shifted
    unit-time convs, 1510x with HNWC dimension_numbers, vs 1876x for this
    batch-major form — XLA's TPU conv emitters relayout non-batch-major
    operands around every conv, costing far more than the two per-segment
    transposes time-major removes (~5% 'data formatting').  Do not retry
    without new evidence; see CLAUDE.md perf ledger.
    """
    new_tail = None
    if kt > 1:
        if time_tail is None:
            time_tail = jnp.zeros(
                (x.shape[0], kt - 1) + x.shape[2:], dtype=x.dtype
            )
        x = jnp.concatenate([time_tail, x], axis=1)
        new_tail = x[:, -(kt - 1):]
    if fpad is None:
        fpad = (kf // 2, kf // 2)
    groups = x.shape[-1] // p["w"].shape[2]
    if (kt == 1 and kf == 1 and fstride == 1 and not gemm
            and p["w"].shape[2] == 1 and p["w"].shape[3] == x.shape[-1]
            and fpad == (0, 0) and _pconv_elementwise()):
        # 1x1 depthwise conv (the decoder pathway convs, reference
        # model/modules.py:653-725 with groups == C and the pointwise stage
        # disabled) is just a per-channel scale: one multiply per element,
        # so the elementwise form is bit-identical to the convolution — but
        # XLA fuses it (plus the bias/BN/act epilogue) into the surrounding
        # add/skip chain instead of emitting a standalone convolution that
        # writes and re-reads the full feature plane through HBM.
        y = x * p["w"][0, 0, 0, :].astype(x.dtype)
        return _conv_epilogue(p, y, act), new_tail
    # NOTE on lowering choice: for ordinary channel counts XLA's native conv
    # emitters win (explicit im2col for the strided C=64 convs measured 2x
    # slower in round 1).  ``gemm=True`` routes a call through the
    # patches-GEMM form instead — used for channel-starved convs (C_in or
    # C_out of ~3) where the conv emitters run at <1% MXU utilisation
    # (the folded HR mask head and erb_conv0; selected per call site).
    if gemm and groups == 1:
        assert fpad[0] == fpad[1], "patches-GEMM path assumes symmetric fpad"
        y = _conv_patches_gemm(p["w"], x, kt=kt, kf=kf, fpad=fpad[0],
                               fstride=fstride)
    else:
        y = jax.lax.conv_general_dilated(
            x,
            p["w"].astype(x.dtype),
            window_strides=(1, fstride),
            padding=[(0, 0), fpad],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
        )
    return _conv_epilogue(p, y, act), new_tail


def _conv_epilogue(p: dict, y: Array, act: Optional[str]) -> Array:
    """bias -> optional pointwise -> BN(eval) -> activation (layout-agnostic:
    operates on the trailing channel axis only)."""
    if p.get("b") is not None:
        y = y + p["b"].astype(y.dtype)
    if p.get("pw") is not None:
        y = jnp.einsum("...fc,cd->...fd", y, p["pw"]["w"].astype(y.dtype))
    if p.get("bn") is not None:
        y = y * p["bn"]["scale"].astype(y.dtype) + p["bn"]["shift"].astype(y.dtype)
    return apply_act(y, act)


def _conv_patches_gemm(
    w: Array, x: Array, *, kt: int, kf: int, fpad: int, fstride: int
) -> Array:
    """Dense conv as slice-patches + GEMM.

    x: [B, T+kt-1, F, Cin] (time already causally extended), w HWIO
    [kt, kf, Cin, Cout].  Output [B, T, F_out, Cout] with
    F_out = floor((F + 2*fpad - kf)/fstride) + 1.
    """
    B = x.shape[0]
    T = x.shape[1] - (kt - 1)
    F = x.shape[2]
    cin = x.shape[3]
    if fpad:
        x = jnp.pad(x, ((0, 0), (0, 0), (fpad, fpad), (0, 0)))
    f_out = (F + 2 * fpad - kf) // fstride + 1
    cols = []
    for dt in range(kt):
        for df in range(kf):
            stop = df + (f_out - 1) * fstride + 1
            cols.append(x[:, dt: dt + T, df: stop: fstride, :])
    patches = jnp.concatenate(cols, axis=-1)            # [B,T,F_out,kt*kf*Cin]
    wm = w.astype(x.dtype).reshape(kt * kf * cin, -1)
    if wm.shape[-1] == 1:
        # C_out == 1 heads (the mask output conv): a multiply-reduce on the
        # VPU instead of an N=1 matmul whose [.., 1] layout tiles terribly.
        return jnp.einsum("btfk,k->btf", patches, wm[:, 0])[..., None]
    return patches @ wm


def conv_transpose_block(
    p: dict,
    x: Array,
    *,
    kf: int,
    fstride: int,
    act: Optional[str] = "relu",
) -> Array:
    """Causal ConvTranspose over frequency + optional pointwise + BN + act.

    Matches ``ConvTranspose2dNormAct`` (kernel time size 1, padding
    ``kf//2``, output_padding ``kf//2`` — reference
    model/modules.py:728-783): implemented as a fractionally-strided conv
    (``lhs_dilation``) with the pre-flipped kernel stored in
    ``p['w']: [1, kf, Cin//groups(out-block), Cout-expanded]`` (see
    ``models.convert._conv_transpose``).
    """
    fpad = kf // 2
    # kernel layout already [kh, kw, in/g, out]; fgc inferred like conv_block
    groups = x.shape[-1] // p["w"].shape[2]
    y = jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=(1, 1),
        padding=[(0, 0), (kf - 1 - fpad, kf - 1 - fpad + fpad)],
        lhs_dilation=(1, fstride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    return _conv_epilogue(p, y, act)


def subpixel_block(
    p: dict,
    x: Array,
    *,
    kf: int,
    fstride: int,
    act: Optional[str] = "relu",
    fold: bool = False,
) -> Array:
    """Sub-pixel frequency upsampling block (kernel time size 1).

    ``p['w']`` is ``[1, kf, Cin//groups, fstride*Cout]`` where output channel
    ``c*fstride + i`` is sub-conv ``i``'s channel ``c`` (interleaved so that
    grouped/depthwise sub-convs map onto one conv with
    ``feature_group_count=groups``); after the conv, sub-conv index ``i``
    becomes the frequency offset: ``out[..., f*fstride + i, c]``.

    A fused weight under key ``'w_fm'`` instead packs output channels
    ``i*Cout + c`` ("freq-major", see ``models.fuse._fuse_subpixel``), which
    turns the interleave into a free reshape.
    """
    fpad = kf // 2
    freq_major = "w_fm" in p
    w = p["w_fm"] if freq_major else p["w"]
    groups = x.shape[-1] // w.shape[2]
    y = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(1, 1),
        padding=[(0, 0), (fpad, fpad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    if p.get("b") is not None:
        y = y + p["b"].astype(y.dtype)
    if fold:
        # Emit the frequency-FOLDED form [B, T, F, s*C] (freq-major packed;
        # requires 'w_fm' weights and per-folded-channel 'bn').  Used by the
        # 48 kHz decoder tail, which continues in folded layout.
        assert freq_major and p.get("pw") is None
        if p.get("bn") is not None:
            y = y * p["bn"]["scale"].astype(y.dtype) \
                + p["bn"]["shift"].astype(y.dtype)
        return apply_act(y, act)
    *lead, f, sc = y.shape
    lead = tuple(lead)
    c = sc // fstride
    if freq_major:
        # Output channels packed i*C+c: the channel->frequency interleave is
        # the identity in linear order — a plain reshape, no transpose.  On
        # TPU this removes the two giant relayout copies the c*s+i packing
        # costs per upsample (measured ~4.5 ms per 32x128-frame segment at
        # 480 bins on v5e).
        y = y.reshape(lead + (f * fstride, c))
    else:
        # reference packing: channel index c*s+i
        # [..,F,C,s] -> [..,F,s,C] -> [..,F*s,C]
        y = y.reshape(lead + (f, c, fstride))
        y = jnp.swapaxes(y, -1, -2).reshape(lead + (f * fstride, c))
    if p.get("pw") is not None:
        y = jnp.einsum("...fc,cd->...fd", y, p["pw"]["w"].astype(y.dtype))
    if p.get("bn") is not None:
        y = y * p["bn"]["scale"].astype(y.dtype) + p["bn"]["shift"].astype(y.dtype)
    return apply_act(y, act)


# --------------------------------------------------------------------------- #
# Linears
# --------------------------------------------------------------------------- #

def grouped_linear(p: dict, x: Array, act: Optional[str] = None) -> Array:
    """Block-diagonal linear: ``p['w']: [G, I/G, O/G]``, ``p['b']: [O]``."""
    g, ig, og = p["w"].shape
    lead = x.shape[:-1]
    xg = x.reshape(lead + (g, ig))
    y = jnp.einsum("...gi,gio->...go", xg, p["w"].astype(x.dtype))
    y = y.reshape(lead + (g * og,)) + p["b"].astype(x.dtype)
    return apply_act(y, act)


def grouped_linear_fm(p: dict, x_fm: Array, act: Optional[str] = None
                      ) -> Array:
    """:func:`grouped_linear` applied to a freq-leading 4-D plane.

    ``x_fm: [F, T, B, C]`` is the DPRNN stack's native output layout (see
    ``pallas_gru.dprnn_inter_block`` fm mode); the flattened feature the
    grouped linear contracts is the f-major ``(f, c)`` axis of the
    ``[B, T, F*C]`` view, so the contraction can run directly on the
    plane — contracting ``(f_local, c)`` per group with ``(t, b)`` as
    contiguous free dims — and the ``[F,T,B,C] -> [B,T,F,C]`` relayout
    of the big plane (measured ~6x over HBM bandwidth as an XLA
    transpose) never materialises.  Requires ``G | F`` (every shipped
    config: groups split whole f-ranges).  Math identical to
    ``grouped_linear(p, x_fm.transpose(2,1,0,3).reshape(B,T,F*C))`` up
    to dot-order rounding.
    """
    g, ig, og = p["w"].shape
    F, T, B, C = x_fm.shape
    if ig % C == 0:
        # group boundaries on whole f-slices: direct per-group contraction
        fg = ig // C
        if fg * g != F:
            raise ValueError(
                f"grouped_linear_fm: w {p['w'].shape} does not cover the "
                f"[{F},{T},{B},{C}] plane")
        xg = x_fm.reshape(g, fg, T, B, C)
        wg = p["w"].reshape(g, fg, C, og).astype(x_fm.dtype)
        y = jnp.einsum("gftbc,gfco->btgo", xg, wg)
    else:
        # group boundaries cut inside f-slices (e.g. df_fc_emb: ig=96,
        # C=64): contract at SUPERGROUP granularity — P = lcm(ig,C)/C
        # f-slices hold Q = lcm/ig whole groups; each group's [ig, og]
        # weight scatters into a zero-padded [P*C, Q*og] block at its
        # flat offset.  The zeros cost Q x the grouped MACs (Q = 2 for
        # every shipped config) — orders of magnitude below the big-plane
        # transpose this path exists to avoid.
        lcm = ig * C // math.gcd(ig, C)
        P, Q = lcm // C, lcm // ig
        gs = g // Q
        if gs * Q != g or gs * P != F:
            raise ValueError(
                f"grouped_linear_fm: w {p['w'].shape} does not tile the "
                f"[{F},{T},{B},{C}] plane into supergroups")
        wq = p["w"].reshape(gs, Q, ig, og)
        wpad = jnp.zeros((gs, P * C, Q * og), p["w"].dtype)
        for q in range(Q):
            wpad = wpad.at[:, q * ig:(q + 1) * ig,
                           q * og:(q + 1) * og].set(wq[:, q])
        wg = wpad.reshape(gs, P, C, Q * og).astype(x_fm.dtype)
        xg = x_fm.reshape(gs, P, T, B, C)
        y = jnp.einsum("gptbc,gpco->btgo", xg, wg)
    y = y.reshape(B, T, g * og) + p["b"].astype(x_fm.dtype)
    return apply_act(y, act)


def linear(p: dict, x: Array, act: Optional[str] = None) -> Array:
    y = x @ p["w"].astype(x.dtype)
    if p.get("b") is not None:
        y = y + p["b"].astype(x.dtype)
    return apply_act(y, act)


def layer_norm(p: dict, x: Array, eps: float = 1e-5) -> Array:
    """torch.nn.LayerNorm over the last axis with affine params."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    xn = (x - mu) * jax.lax.rsqrt(var + eps)
    return xn * p["g"].astype(x.dtype) + p["b"].astype(x.dtype)


# --------------------------------------------------------------------------- #
# GRU
# --------------------------------------------------------------------------- #
#
# Parameters per direction/layer:
#   wi [I, 3H]  (torch weight_ih_l0.T), bi [3H]
#   wh [H, 3H]  (torch weight_hh_l0.T), bh [3H]
# Gate packing along the 3H axis is torch's (r, z, n).


def gru_cell(p: dict, xp: Array, h: Array) -> Array:
    """One GRU step given the precomputed input projection ``xp = x@wi + bi``.

    xp: [..., 3H], h: [..., H] -> h': [..., H]
    """
    hh = h @ p["wh"].astype(h.dtype) + p["bh"].astype(h.dtype)
    H = h.shape[-1]
    r = jax.nn.sigmoid(xp[..., :H] + hh[..., :H])
    z = jax.nn.sigmoid(xp[..., H:2 * H] + hh[..., H:2 * H])
    n = jnp.tanh(xp[..., 2 * H:] + r * hh[..., 2 * H:])
    return (1.0 - z) * n + z * h


def gru_seq(
    p: dict, x: Array, h0: Optional[Array] = None, reverse: bool = False,
    unroll: int = 4,
) -> Tuple[Array, Array]:
    """Run a GRU over the time axis of ``x: [B, T, I]``.

    The input projection is hoisted out of the scan as one large matmul so
    the sequential part is only the [B,H]x[H,3H] hidden recurrence (the MXU
    sees big batched GEMMs, the scan body stays tiny).

    Returns (outputs [B, T, H], final hidden [B, H]).
    """
    B, T, _ = x.shape
    H = p["wh"].shape[0]
    if h0 is None:
        h0 = jnp.zeros((B, H), dtype=x.dtype)

    from . import pallas_gru

    if T >= 2 and pallas_gru.enabled():
        ys_tm, h_last = pallas_gru.gru_scan_tm(
            jnp.swapaxes(x, 0, 1), h0,
            p["wi"], p["bi"], p["wh"], p["bh"],
            reverse=reverse, precision=_ambient_precision(),
            interpret=pallas_gru.interpret_default(),
        )
        return jnp.swapaxes(ys_tm, 0, 1), h_last

    # Transpose to time-major BEFORE the 3x input projection so the [.., 3H]
    # tensor is produced directly in the scan's layout (the relayout copy
    # then moves I-sized rows instead of 3H-sized ones).
    xt = jnp.swapaxes(x, 0, 1)                                       # [T,B,I]
    ys, h_last = _gru_scan_xla(p, xt, h0, reverse, unroll)
    return jnp.swapaxes(ys, 0, 1), h_last


def _gru_scan_xla(p: dict, xt: Array, h0: Array, reverse: bool,
                  unroll: int) -> Tuple[Array, Array]:
    """lax.scan GRU over time-major ``xt [T, B, I]`` (the Pallas fallback)."""
    xp_t = xt @ p["wi"].astype(xt.dtype) + p["bi"].astype(xt.dtype)  # [T,B,3H]

    def step(h, xp):
        h_new = gru_cell(p, xp, h)
        return h_new, h_new

    h_last, ys = jax.lax.scan(step, h0, xp_t, reverse=reverse,
                              unroll=min(unroll, max(1, xt.shape[0])))
    return ys, h_last


def _ambient_precision() -> str:
    """Map the ambient jax matmul-precision context to a kernel tier."""
    try:
        value = jax.config.jax_default_matmul_precision
    except AttributeError:
        value = None
    if value in ("float32", "highest"):
        return "highest"
    if value in ("high", "bfloat16_3x", "tensorfloat32"):
        return "high"
    return "default"


def gru_bidir(p_fw: dict, p_bw: dict, x: Array,
              packed: Optional[dict] = None) -> Array:
    """Bidirectional GRU (stateless across calls); output concat [fw, bw].

    Used for the DPRNN intra (frequency-axis) RNN where the full axis is
    available every frame (`/root/reference/onnx_model/layers.py:126-177`).

    On TPU both directions run in ONE Pallas sequential walk with
    direction-blockdiag weights (see ``pallas_gru.gru_bidir_tm``): K=2I=128
    contractions fill the MXU depth that two separate H=64 walks leave half
    empty, in half the sequential cells.  ``packed`` (from
    ``models.fuse.pack_dprnn_bidir``) supplies the pre-packed weights so no
    packing ops land inside scan bodies; if absent they are packed inline
    (XLA hoists the loop-invariant packing).

    (An earlier direction-batched variant via XLA einsum batched GEMMs was
    measured slower than two plain scans; the Pallas fusion supersedes it.)
    """
    from . import pallas_gru

    if x.shape[1] >= 2 and pallas_gru.enabled():
        if packed is None:
            wi2, wh2, b2 = pallas_gru._pack_bidir(p_fw, p_bw, x.dtype)
        else:
            wi2, wh2, b2 = packed["wi2"], packed["wh2"], packed["b2"]
        ys_f, ys_b = pallas_gru.gru_bidir_tm(
            jnp.swapaxes(x, 0, 1), wi2, wh2, b2,
            precision=_ambient_precision(),
            interpret=pallas_gru.interpret_default(),
        )
        return jnp.concatenate(
            [jnp.swapaxes(ys_f, 0, 1), jnp.swapaxes(ys_b, 0, 1)], axis=-1)

    y_fw, _ = gru_seq(p_fw, x)
    y_bw, _ = gru_seq(p_bw, x, reverse=True)
    return jnp.concatenate([y_fw, y_bw], axis=-1)


def grouped_gru_seq(
    ps: list, x: Array, h0s: Optional[list] = None, shuffle_out: bool = False
) -> Tuple[Array, list]:
    """Grouped GRU layer: independent GRUs over channel groups
    (reference ``GroupedGRULayer``, model/modules.py:1097-1168).

    ``ps`` is a list of per-group GRU param dicts; the input's last axis is
    split evenly across groups; outputs concatenate (optionally shuffled
    group-major -> interleaved like ``GroupedGRU``'s shuffle stage).
    """
    g = len(ps)
    xs = jnp.split(x, g, axis=-1)
    if h0s is None:
        h0s = [None] * g
    ys, hs = [], []
    for p, xg, h0 in zip(ps, xs, h0s):
        y, h = gru_seq(p, xg, h0=h0)
        ys.append(y)
        hs.append(h)
    out = jnp.concatenate(ys, axis=-1)
    if shuffle_out:
        # reference GroupedGRU's between-layer channel shuffle:
        # view [..,C/G,G] -> transpose -> [..,G,C/G] -> flat
        # (model/modules.py:1247-1249)
        *lead, C = out.shape
        lead = tuple(lead)
        out = out.reshape(lead + (C // g, g)).swapaxes(-1, -2).reshape(
            lead + (C,))
    return out, hs


# --------------------------------------------------------------------------- #
# EMA (exponential moving average) linear recurrence
# --------------------------------------------------------------------------- #

def ema_scan(x: Array, init: Array, alpha: float) -> Array:
    """Compute ``m_t = alpha*m_{t-1} + (1-alpha)*x_t`` for all t, m_{-1}=init.

    Replaces the reference's Python per-frame loop
    (`/root/reference/model/modules.py:479-484`) with a single fused
    ``lax.scan``.  A sequential scan (not an associative one) is deliberate:
    it performs the identical float operation sequence per frame regardless
    of the chunk span, which is what makes streaming block-size invariance
    *bit*-exact (the reference ships and tests that contract).  The scan body
    is elementwise over [B, F] and is dwarfed by the GRU time scans.

    Args:
        x: [B, T, F]; init: [F] or [B, F].
    Returns:
        m: [B, T, F] (the post-update value at every frame).
    """
    init = jnp.broadcast_to(init.astype(x.dtype), (x.shape[0], x.shape[-1]))

    def step(m, x_t):
        m = alpha * m + (1.0 - alpha) * x_t
        return m, m

    _, ms = jax.lax.scan(step, init, jnp.swapaxes(x, 0, 1),
                         unroll=min(8, max(1, x.shape[1])))
    return jnp.swapaxes(ms, 0, 1)


def ema_scan_assoc(x: Array, init: Array, alpha: float) -> Array:
    """Associative (log-depth) variant of :func:`ema_scan`.

    ~1e-7-level differences vs the sequential form are possible because the
    combination tree depends on T; offered for latency-critical offline paths
    where bit-stable chunking is not required.
    """
    a = jnp.full_like(x, alpha)
    b = (1.0 - alpha) * x

    def combine(c1, c2):
        a1, b1 = c1
        a2, b2 = c2
        return a1 * a2, a2 * b1 + b2

    A, Bc = jax.lax.associative_scan(combine, (a, b), axis=1)
    init = jnp.broadcast_to(init.astype(x.dtype), (x.shape[0], x.shape[-1]))
    return A * init[:, None, :] + Bc
