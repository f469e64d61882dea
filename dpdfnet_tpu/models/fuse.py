"""Inference-time parameter fusions for MXU-friendly execution.

The reference factorises most convs as depthwise/grouped + 1x1 pointwise
(`Conv2dNormAct(separable=True)`, `/root/reference/model/modules.py:653-725`)
— a FLOP optimisation for CPUs.  On TPU the opposite holds: two tiny ops
(a VPU depthwise pass and a K=64 GEMM) cost more in overhead and layout
traffic than one dense conv whose contraction feeds the MXU properly.  Since
(depthwise -> pointwise) is a linear map, it collapses exactly into a dense
kernel:

    dense[t, f, c, d] = dw[t, f, 0, c] * pw[c, d]        (depthwise case)
    dense[t, f, c, d] = grp[t, f, 0|.., d] * [c in group(d)] . pw

``ops.nn.conv_block`` infers the group count from the weight shape, so fused
and unfused parameter trees run through identical model code.  Fusion is a
pure re-parameterisation: outputs match to fp tolerance (~1e-6).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig

Params = Dict


def _fuse_conv(p: Dict, cin: int) -> Dict:
    """Collapse {'w' (grouped/depthwise), 'pw'} into one dense 'w'."""
    if p is None or p.get("pw") is None:
        return p
    w = np.asarray(p["w"])                        # [kt, kf, cin/g, cout]
    pw = np.asarray(p["pw"]["w"])                 # [cout, cout]
    kt, kf, cin_g, cout = w.shape
    g = cin // cin_g
    # expand grouped weight to dense [kt, kf, cin, cout]
    dense = np.zeros((kt, kf, cin, cout), np.float32)
    out_per_g = cout // g
    for gi in range(g):
        dense[:, :, gi * cin_g:(gi + 1) * cin_g,
              gi * out_per_g:(gi + 1) * out_per_g] = \
            w[:, :, :, gi * out_per_g:(gi + 1) * out_per_g]
    fused = np.einsum("tfcm,md->tfcd", dense, pw)
    out = {k: v for k, v in p.items() if k != "pw"}
    out["w"] = jnp.asarray(fused)
    if out.get("b") is not None:
        # unfused epilogue order is bias -> pointwise (ops.nn._conv_epilogue):
        # (conv + b) @ pw = conv @ pw + b @ pw, so the bias transforms too
        out["b"] = jnp.asarray(
            np.asarray(p["b"], np.float32) @ pw)
    return out


def _fuse_subpixel(p: Dict, cin: int, fstride: int) -> Dict:
    """Collapse depthwise sub-pixel convs + pointwise into one dense conv.

    Input weight: [1, kf, cin/g, fstride*cout] with channel index
    c*fstride + i; pointwise mixes the c dimension after the frequency
    shuffle, so the fused dense kernel has output channel (d, i) = d*fstride+i:
        dense[., ., c, d*s + i] = w[., ., c%g.., c*s + i] * pw[c, d]
    """
    if p is None or p.get("pw") is None:
        return p
    w = np.asarray(p["w"])                        # [1, kf, cin/g, s*cout]
    pw = np.asarray(p["pw"]["w"])                 # [cout, cout]
    kt, kf, cin_g, scout = w.shape
    cout = scout // fstride
    g = cin // cin_g
    dense_g = np.zeros((kt, kf, cin, scout), np.float32)
    out_per_g = scout // g
    for gi in range(g):
        dense_g[:, :, gi * cin_g:(gi + 1) * cin_g,
                gi * out_per_g:(gi + 1) * out_per_g] = \
            w[:, :, :, gi * out_per_g:(gi + 1) * out_per_g]
    # dense_g channel index is c*s+i (c = pre-shuffle channel); apply pw over c
    dense_g = dense_g.reshape(kt, kf, cin, cout, fstride)
    fused = np.einsum("tfcms,md->tfcds", dense_g, pw)
    # Repack output channels i*C+c ("freq_major") so the sub-pixel
    # channel->frequency interleave becomes a pure reshape in the forward
    # (no transpose relayout; see ops.nn.subpixel_block).
    fused = np.moveaxis(fused, -1, -2).reshape(kt, kf, cin, cout * fstride)
    out = {k: v for k, v in p.items() if k not in ("pw", "w")}
    # "w_fm" (not "w") marks freq-major packing; pytree keys are static
    # structure, so the forward can branch on it under jit.
    out["w_fm"] = jnp.asarray(fused)
    if out.get("b") is not None:
        # unfused order: bias (on channel c*s+i) -> shuffle -> pointwise
        # over c, so for output (d, i): b_f = sum_c b[c*s+i] * pw[c, d] —
        # then repacked freq-major (i*Cout + d) to match 'w_fm'
        bvec = np.asarray(p["b"], np.float32).reshape(cout, fstride)
        bf = np.einsum("ci,cd->di", bvec, pw)
        out["b"] = jnp.asarray(np.moveaxis(bf, -1, 0).reshape(-1))
    return out


def fuse_separable(params: Params, cfg: ModelConfig) -> Params:
    """Return a new params pytree with all separable convs fused dense."""
    C = cfg.conv_ch
    st3, st2, st1 = cfg.dec_fstrides
    p = jax.tree_util.tree_map(lambda x: x, params,
                               is_leaf=lambda x: x is None)  # shallow-ish copy

    enc = dict(p["enc"])
    for name, cin in (("erb_conv1", C), ("erb_conv2", C), ("erb_conv3", C),
                      ("df_conv0", 2), ("df_conv1", C)):
        enc[name] = _fuse_conv(dict(enc[name]), cin)
    p["enc"] = enc

    dec = dict(p["erb_dec"])
    if st3 == 1:
        dec["convt3"] = _fuse_conv(dict(dec["convt3"]), C)
    elif cfg.upsample == "subpixel":
        dec["convt3"] = _fuse_subpixel(dict(dec["convt3"]), C, st3)
    if cfg.upsample == "subpixel":
        dec["convt2"] = _fuse_subpixel(dict(dec["convt2"]), C, st2)
        dec["convt1"] = _fuse_subpixel(dict(dec["convt1"]), C, st1)
    # transpose upsampling keeps its pointwise stage explicit
    p["erb_dec"] = dec

    dfd = dict(p["df_dec"])
    dfd["df_convp"] = _fuse_conv(dict(dfd["df_convp"]), C)
    p["df_dec"] = dfd
    return p


def prepare_inference_params(params: Params, cfg: ModelConfig) -> Params:
    """All inference-time re-parameterisations, in order: dense-fuse the
    separable convs, fold the 48 kHz 480-bin plane, pre-pack the DPRNN
    intra weights.  Pure re-parameterisation — forward outputs match the
    raw tree to fp tolerance."""
    params = fuse_separable(params, cfg)
    params = fold_hr_tail(params, cfg)
    if cfg.dprnn_blocks:
        params = pack_dprnn_bidir(params, cfg)
    return params


def _tile_ch(v, s: int):
    """Per-channel vector [C] -> folded [s*C] for channel index j*C+c."""
    return jnp.asarray(np.tile(np.asarray(v), s))


def fold_hr_tail(params: Params, cfg: ModelConfig) -> Params:
    """Re-express the 480-bin plane of the 48 kHz models frequency-folded.

    The full-band branch's only 480-resolution tensors are e0 (erb_conv0
    out), the last decoder upsample x1, and the mask head output.  Because
    erb_conv1's stride and convt1's upsample factor are both ``s=3``, the
    whole plane can run as ``[F/3, 3*C]`` ("folded") with pure weight
    restructures — bit-equal linear maps, no resampling:

    - erb_conv0  [3,3,1,C]   -> [3,3,3,3C]   (input folded [160,3])
    - erb_conv1  [1,3,C,C]   -> [1,2,3C,C]   stride 3 -> stride 1, pad (1,0)
    - conv0p     [1,1,1,C]   -> [1,1,1,3C]   (depthwise scale, tiled)
    - conv0_out  [1,3,C,1]   -> [1,3,3C,3]   (mask head; 3 phase outputs)
    - convt1     emits its freq-major conv output un-reshaped

    Folded channel index is j*C+c (j = position-in-fold).  In-bounds tap
    mapping: original kernel offset d = s*(dg-1) + j_in - j_out (zero
    weights elsewhere).  This removes every [.., 480, 64] relayout copy and
    the pathologically tiled [.., 480, 1] mask-head output (measured ~8 ms
    per 32x128-frame segment on v5e).
    """
    if not cfg.hr or cfg.upsample != "subpixel":
        return params
    s = cfg.erb_fstrides[0]
    assert s == cfg.dec_fstrides[2] == 3
    C = cfg.conv_ch
    # Precondition: fuse_separable already ran (erb_conv1 dense [1,3,C,C],
    # convt1 as freq-major 'w_fm').  On a raw converted tree the erb_conv1
    # fold below would silently BROADCAST a depthwise row across all C
    # input channels before dying on a misleading KeyError('w_fm').
    ec1_w = np.asarray(params["enc"]["erb_conv1"]["w"])
    if ec1_w.shape[2] != C or "w_fm" not in params["erb_dec"]["convt1"]:
        raise ValueError(
            "fold_hr_tail requires fuse_separable to run first "
            f"(erb_conv1 weight {ec1_w.shape}, convt1 keys "
            f"{sorted(params['erb_dec']['convt1'])})")

    p = dict(params)
    enc = dict(p["enc"])
    dec = dict(p["erb_dec"])

    # erb_conv0: [kt,3,1,C] -> [kt,3,3,s*C], input [160, 3]
    w = np.asarray(enc["erb_conv0"]["w"])
    kt = w.shape[0]
    w2 = np.zeros((kt, 3, s, s * C), np.float32)
    for dg in range(3):
        for jin in range(s):
            for jout in range(s):
                d = s * (dg - 1) + jin - jout
                if -1 <= d <= 1:
                    w2[:, dg, jin, jout * C:(jout + 1) * C] = w[:, d + 1, 0]
    bn = enc["erb_conv0"].get("bn")
    enc["erb_conv0_folded"] = {
        "w": jnp.asarray(w2),
        "b": (None if enc["erb_conv0"].get("b") is None
              else _tile_ch(enc["erb_conv0"]["b"], s)),
        "bn": None if bn is None else {"scale": _tile_ch(bn["scale"], s),
                                       "shift": _tile_ch(bn["shift"], s)},
    }

    # erb_conv1: [1,3,C,C] stride 3 -> [1,2,s*C,C] stride 1, pad (1,0)
    w = np.asarray(enc["erb_conv1"]["w"])
    w1 = np.zeros((1, 2, s * C, C), np.float32)
    for dg in range(2):
        for jin in range(s):
            kd = s * (dg - 1) + jin + 1
            if 0 <= kd < 3:
                w1[:, dg, jin * C:(jin + 1) * C, :] = w[:, kd]
    enc["erb_conv1_folded"] = {**{k: v for k, v in enc["erb_conv1"].items()
                                  if k != "w"}, "w": jnp.asarray(w1)}

    # conv0p: depthwise 1x1 -> depthwise over s*C (channel-tiled)
    cp = dec["conv0p"]
    bn = cp.get("bn")
    dec["conv0p_folded"] = {
        "w": jnp.asarray(np.tile(np.asarray(cp["w"])[0, 0, 0], s)
                         ).reshape(1, 1, 1, s * C),
        "b": None if cp.get("b") is None else _tile_ch(cp["b"], s),
        "bn": None if bn is None else {"scale": _tile_ch(bn["scale"], s),
                                       "shift": _tile_ch(bn["shift"], s)},
    }

    # conv0_out (mask head): [1,3,C,1] -> [1,3,s*C,s]
    co = dec["conv0_out"]
    w = np.asarray(co["w"])
    w3 = np.zeros((1, 3, s * C, s), np.float32)
    for dg in range(3):
        for jin in range(s):
            for i in range(s):
                d = s * (dg - 1) + jin - i
                if -1 <= d <= 1:
                    w3[:, dg, jin * C:(jin + 1) * C, i] = w[:, d + 1, :, 0]
    bn = co.get("bn")
    dec["conv0_out_folded"] = {
        "w": jnp.asarray(w3),
        "b": (None if co.get("b") is None
              else jnp.asarray(np.repeat(np.asarray(co["b"]), s))),
        "bn": None if bn is None else {
            "scale": jnp.asarray(np.repeat(np.asarray(bn["scale"]), s)),
            "shift": jnp.asarray(np.repeat(np.asarray(bn["shift"]), s))},
    }

    # convt1: same freq-major weights, bn tiled for the un-reshaped output
    ct = dec["convt1"]
    bn = ct.get("bn")
    dec["convt1_folded"] = {
        "w_fm": ct["w_fm"],
        "b": ct.get("b"),
        "bn": None if bn is None else {"scale": _tile_ch(bn["scale"], s),
                                       "shift": _tile_ch(bn["shift"], s)},
    }

    p["enc"] = enc
    p["erb_dec"] = dec
    return p


def pack_dprnn_bidir(params: Params, cfg: ModelConfig) -> Params:
    """Add pre-packed intra-GRU weights for the fused bidirectional Pallas
    kernel (``ops.pallas_gru.gru_bidir_tm``) to every DPRNN block.

    Packing at engine-build time keeps the (loop-invariant) packing ops out
    of the streaming per-frame scan body.  The packed tensors coexist with
    the originals; non-Pallas paths ignore them.
    """
    import jax.numpy as jnp

    from ..ops import pallas_gru

    p = dict(params)
    enc = dict(p["enc"])
    for branch in ("dprnn_erb", "dprnn_df"):
        blocks = []
        for bp in enc[branch]:
            bp = dict(bp)
            intra = dict(bp["intra"])
            wi2, wh2, b2 = pallas_gru._pack_bidir(
                intra["fw"], intra["bw"], jnp.float32)
            intra["packed"] = {"wi2": wi2, "wh2": wh2, "b2": b2}
            bp["intra"] = intra
            if pallas_gru.v2_requested():
                # v2-only duplicates (hoisted-projection kernel variants,
                # measured slower, default-off): only pack when requested —
                # same dead-HBM rationale as the stacked bundle below
                wi_cat, wh_big = pallas_gru.pack_intra_v2(
                    {"wi2": wi2, "wh2": wh2}, intra["fc"]["w"])
                intra["packed"].update(wi_cat=wi_cat, wh_big=wh_big)
                inter = dict(bp["inter"])
                inter["whfc"] = jnp.concatenate(
                    [inter["gru"]["wh"], inter["fc"]["w"]], axis=1)
                bp["inter"] = inter
            blocks.append(bp)
        enc[branch] = blocks
        if blocks and pallas_gru.stack_enabled():
            # branch-level stacked bundle for the merged DPRNN-stack kernel
            # (ops.pallas_gru.dprnn_stack): every per-block tensor stacked
            # on a leading K axis; biases/LN params as [K, 1, C] rows.
            # Only built when the (default-off) stack kernel will consume
            # it — otherwise it is a dead duplicate copy of every block's
            # weights in device HBM.  Read at pack time: flip
            # DPDFNET_TPU_STACK before building the engine/params.
            enc[branch + "_stacked"] = pallas_gru.pack_stack(blocks)
    p["enc"] = enc
    return p
