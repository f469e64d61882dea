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
        bvec = np.asarray(out["b"]).reshape(cout, fstride)
        out["b"] = jnp.asarray(np.moveaxis(bvec, -1, 0).reshape(-1))
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
            blocks.append(bp)
        enc[branch] = blocks
    p["enc"] = enc
    return p
