#!/usr/bin/env python
"""Ablate the DPRNN intra-kernel step to locate the per-step cost.

The shipped intra kernel (ops/pallas_gru.py:_intra_block_kernel) measures
~5.4 ms/call at the b384-turbo shapes — ~19% of MXU peak — and the round-2
microbenches proved the gap is neither dot throughput (int8 <= 5%) nor
transcendentals (identity-gates ~1% e2e).  This tool times wrong-math
variants of the step body with individual pieces removed, at the shipped
shapes (tile 512, T = 48 freq steps, C = 64, bf16 planes), so the next
optimisation targets the measured bottleneck instead of a guess.

Variants (cumulative ablations each remove ONE piece from `full`):
  full          mirror of the shipped body (staging stores, both dots,
                gate math, ys dynamic stores, fc+LN epilogue)
  no_epilogue   recurrence only (how much is the fc/LN tail?)
  no_ys_stores  ... and without the per-step dynamic scrf/scrb stores
  no_staging    ... and reading x2 from a prestaged [T*tile, 2C] scratch
                instead of the two per-step staging stores
  dots_only     ... gate math replaced by a single add (dependence kept)
  gates_only    recurrence with NO dots (h = gates(x-slice, h))

Every variant runs R reps inside one jit (fori_loop with a value
dependence).  ROUND-4 CAVEAT — the relay dispatch bias: one fn() call
costs a ~23 ms axon relay dispatch ON TOP of the device work, i.e. a
constant ~23/reps ms PER REP.  At the round-2/3 default --reps 30 that
is ~0.77 ms/rep = ~2000+ ns/step — LARGER than the real per-step cost,
so every absolute number from those rounds is wrong (rankings and
variant DIFFERENCES survive, the bias cancels).  Measured directly:
tm_full 1.305 ms/call at reps=30 vs 0.645 at reps=240 -> D ~= 22.6 ms,
real ~0.551 ms/call.  Use --reps 240+ and subtract ~23/reps ms.

Usage: python tools/intra_step_ablation.py [--rows 4096] [--reps 240]

Round-3 measurements at --reps 30 (ns/step, tile 512, T=48, C=64, bf16
planes, v5e) — ~2344 ns/step of the numbers below is dispatch bias;
true values are (x - 2344), differences are unbiased:
  full 3916-4031 | no_epilogue 3159 (=> fc/LN epilogue ~760, 19%)
  no_ys_stores 3179 (=> per-step scrf/scrb stores ~0)
  minimal 2676  (chunk loads + staging + add; true floor ~330)
  tm_full 3458  (freq-LEADING [T, tile, C] walk: clean leading-dim
                 chunk loads; -14% vs full — THE production lever)
  tm_prex2 3627 (XLA-prebuilt [T,tile,2C] gate input, zero staging:
                 SLOWER — 2C-wide loads cost more than staging saves)
  tm_direct 3978 (per-step direct dynamic loads, no chunking: SLOWER —
                 chunked CH=8 loads amortise the dynamic-base cost)

Round-4 measurements at --reps 240 (raw ns/step; subtract ~245 bias):
  tm_full 1679          re-baseline (true ~1435)
  tm_floor 1120         loads+staging+add (true ~875: the walk floor is
                        61% of the step and is DATA MOVEMENT, not loop
                        structure — tm_floor_static 1092 is flat)
  tm_floor_nostage 1082 staging ~free | tm_floor_bf16 1106 (upcast ~free;
                        bf16 adds are packed-op slower, a wash)
  tm_allstatic 1578     python-unrolled walk, per-step STATIC loads:
                        -6% vs tm_full -> PORTED as the production
                        default (DPDFNET_TPU_INTRA_STATIC)
  tm_ch16 1647          CH=16 chunks: -2%, superseded by allstatic
  tm_xp2dot 1872 / tm_xp2dot_bf16 1861  REJECTED: xp as two K=C dots on
                        direct slices — the extra half-depth dot costs
                        more than the (already ~free) staging saves
  tm_pg 1867 / tm_pg_ch16 1841 / tm_pg_static 2070  REJECTED: packed
                        per-direction [x_d|h_d] @ Wp_d gate dots (-33%
                        MXU MACs vs the blockdiag form) LOSE — the
                        doubled staging scratches + half-lane [tile, C]
                        gate ops eat the MXU saving; the blockdiag
                        zero-MAC "waste" is the cheaper currency
  tm_fused_epi 1749     REJECTED: fc/LN fused into the walk's second
                        half — the epilogue is already overlapped
Conclusion (round 4): freq-leading walk + fully static unroll
(tm_allstatic) is the optimum found; the remaining step cost is ~55%
x-load data movement + ~40% MXU dots at peak — no measured variant
beats it structurally.
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dpdfnet_tpu.ops.pallas_gru import _sigmoid  # noqa: E402

MM = (((1,), (0,)), ((), ()))


def _dot(a, b):
    return jax.lax.dot_general(a, b, MM,
                               preferred_element_type=jnp.float32)


def _kernel(T, C, variant, x_ref, wi_ref, wh_ref, b_ref,
            wfc_ref, bfc_ref, g_ref, bln_ref,
            out_ref, scrf, scrb, x2s, x2all):
    if variant in ("tm_minimal", "tm_prex2"):
        # tm_minimal: time-leading layout, staging stores + add only (the
        # structural floor of the tm walk).  tm_prex2: x arrives as the
        # PREBUILT per-step gate input [T, tile, 2C] = [xf_k | xb_{T-1-k}]
        # (concat+flip done by XLA outside the kernel) — the per-step body
        # has NO staging store at all: one clean leading-dim load feeds
        # the xp dot directly.  Full math including epilogue.
        tile = x_ref.shape[1]
        C2 = 2 * C
        cdt = scrf.dtype
        CH = 8

        def chunk(ci, h):
            base = pl.multiple_of(ci * CH, CH)
            xc = x_ref[pl.ds(base, CH)].astype(cdt)       # [CH, tile, 2C]
            for k in range(CH):
                if variant == "tm_minimal":
                    x2s[:, :C] = xc[k][:, :C]
                    x2s[:, C:] = xc[k][:, C:]
                    h = (h + x2s[:]).astype(cdt)
                    continue
                xp = _dot(xc[k], wi_ref[:]) + b_ref[0:1, :]
                hh = _dot(h, wh_ref[:]) + b_ref[1:2, :]
                r = _sigmoid(xp[:, :C2] + hh[:, :C2])
                z = _sigmoid(xp[:, C2:2 * C2] + hh[:, C2:2 * C2])
                n = jnp.tanh(xp[:, 2 * C2:] + r * hh[:, 2 * C2:])
                h = ((1.0 - z) * n + z * h).astype(cdt)
                scrf[pl.ds(base + k, 1)] = h[:, :C][None]
                scrb[pl.ds(base + k, 1)] = h[:, C:][None]
            return h

        jax.lax.fori_loop(0, T // CH, chunk, jnp.zeros((tile, C2), cdt))
        if variant == "tm_minimal":
            out_ref[0] = scrf[0].astype(out_ref.dtype)
            return
        for c0 in range(0, T, CH):
            x_c = x_ref[pl.ds(c0, CH)].astype(cdt)        # [CH, tile, 2C]
            for k in range(CH):
                y = _dot(scrf[c0 + k], wfc_ref[:C]) + \
                    _dot(scrb[c0 + k], wfc_ref[C:]) + bfc_ref[0:1, :]
                mu = jnp.mean(y, axis=-1, keepdims=True)
                var = jnp.mean(jnp.square(y - mu), axis=-1, keepdims=True)
                yn = (y - mu) * jax.lax.rsqrt(var + 1e-5)
                yn = (yn * g_ref[0:1, :] + bln_ref[0:1, :]).astype(cdt)
                out_ref[c0 + k] = (x_c[k][:, :C] + yn).astype(out_ref.dtype)
        return

    if variant == "tm_direct":
        # tm layout + per-step DIRECT dynamic loads (no [CH, tile, C]
        # chunk values at all — those spill to VMEM as ~256-vreg
        # temporaries and every per-step slice becomes a reload).
        # Leading-dim dynamic indexing is legal for any dtype, so this
        # form also drops the bf16 T%8 constraint.  Full math.
        tile = x_ref.shape[1]
        C2 = 2 * C
        cdt = scrf.dtype

        def step(t, h):
            x2s[:, :C] = x_ref[t].astype(cdt)
            x2s[:, C:] = x_ref[T - 1 - t].astype(cdt)
            xp = _dot(x2s[:], wi_ref[:]) + b_ref[0:1, :]
            hh = _dot(h, wh_ref[:]) + b_ref[1:2, :]
            r = _sigmoid(xp[:, :C2] + hh[:, :C2])
            z = _sigmoid(xp[:, C2:2 * C2] + hh[:, C2:2 * C2])
            n = jnp.tanh(xp[:, 2 * C2:] + r * hh[:, 2 * C2:])
            h = ((1.0 - z) * n + z * h).astype(cdt)
            scrf[pl.ds(t, 1)] = h[:, :C][None]
            scrb[pl.ds(T - 1 - t, 1)] = h[:, C:][None]
            return h

        jax.lax.fori_loop(0, T, step, jnp.zeros((tile, C2), cdt))

        def ep(t, acc):
            y = _dot(scrf[t], wfc_ref[:C]) + \
                _dot(scrb[t], wfc_ref[C:]) + bfc_ref[0:1, :]
            mu = jnp.mean(y, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(y - mu), axis=-1, keepdims=True)
            yn = (y - mu) * jax.lax.rsqrt(var + 1e-5)
            yn = (yn * g_ref[0:1, :] + bln_ref[0:1, :]).astype(cdt)
            out_ref[pl.ds(t, 1)] = (x_ref[t].astype(cdt) + yn).astype(
                out_ref.dtype)[None]
            return acc

        jax.lax.fori_loop(0, T, ep, jnp.int32(0))
        return

    if variant == "tm_full":
        # time(freq)-LEADING x/out layout [T, tile, C]: every per-step x
        # access is a clean leading-dim load (like the inter kernel's
        # x_ref[s]) instead of the mid-dim sublane-extract the row-major
        # form pays.  Full math mirror otherwise (staging lane-concat,
        # both dots, gates, ys stores, fc+LN epilogue).
        tile = x_ref.shape[1]
        C2 = 2 * C
        cdt = scrf.dtype
        CH = 8

        def chunk(ci, h):
            base = pl.multiple_of(ci * CH, CH)
            rbase = pl.multiple_of(T - CH - ci * CH, CH)
            xf_c = x_ref[pl.ds(base, CH)].astype(cdt)      # [CH, tile, C]
            xb_c = x_ref[pl.ds(rbase, CH)].astype(cdt)
            for k in range(CH):
                x2s[:, :C] = xf_c[k]
                x2s[:, C:] = xb_c[CH - 1 - k]
                xp = _dot(x2s[:], wi_ref[:]) + b_ref[0:1, :]
                hh = _dot(h, wh_ref[:]) + b_ref[1:2, :]
                r = _sigmoid(xp[:, :C2] + hh[:, :C2])
                z = _sigmoid(xp[:, C2:2 * C2] + hh[:, C2:2 * C2])
                n = jnp.tanh(xp[:, 2 * C2:] + r * hh[:, 2 * C2:])
                h = ((1.0 - z) * n + z * h).astype(cdt)
                scrf[pl.ds(base + k, 1)] = h[:, :C][None]
                scrb[pl.ds(rbase + (CH - 1 - k), 1)] = h[:, C:][None]
            return h

        jax.lax.fori_loop(0, T // CH, chunk, jnp.zeros((tile, C2), cdt))
        for c0 in range(0, T, CH):
            x_c = x_ref[pl.ds(c0, CH)].astype(cdt)         # [CH, tile, C]
            for k in range(CH):
                y = _dot(scrf[c0 + k], wfc_ref[:C]) + \
                    _dot(scrb[c0 + k], wfc_ref[C:]) + bfc_ref[0:1, :]
                mu = jnp.mean(y, axis=-1, keepdims=True)
                var = jnp.mean(jnp.square(y - mu), axis=-1, keepdims=True)
                yn = (y - mu) * jax.lax.rsqrt(var + 1e-5)
                yn = (yn * g_ref[0:1, :] + bln_ref[0:1, :]).astype(cdt)
                out_ref[c0 + k] = (x_c[k] + yn).astype(out_ref.dtype)
        return

    if variant in ("tm_allstatic", "tm_pg_static", "tm_floor_static"):
        # Fully static unrolled walk (round 4): python loop over all T
        # steps, per-step STATIC leading-dim loads x_ref[t] — no
        # [CH, tile, C] chunk temporaries (which spill ~512 vregs each),
        # no fori_loop, no dynamic bases anywhere.  Probes whether the
        # ~800 ns/step walk floor is the chunk-load/loop STRUCTURE
        # rather than data movement.  tm_pg_static combines this with
        # the packed-gate per-direction dots.
        tile = x_ref.shape[1]
        C2 = 2 * C
        cdt = scrf.dtype
        pg = variant == "tm_pg_static"
        flr = variant == "tm_floor_static"
        if pg:
            wpf = wi_ref[:, :4 * C]
            wpb = wh_ref[:, :4 * C]
            bpf = b_ref[0:1, :4 * C]
            bpb = b_ref[1:2, :4 * C]
            xhf = x2s
            xhb = x2all

            def gate(d, h):
                r = _sigmoid(d[:, :C])
                z = _sigmoid(d[:, C:2 * C])
                n = jnp.tanh(d[:, 2 * C:3 * C] + r * d[:, 3 * C:])
                return ((1.0 - z) * n + z * h).astype(cdt)

            hf = jnp.zeros((tile, C), cdt)
            hb = jnp.zeros((tile, C), cdt)
            for t in range(T):
                xhf[:, :C] = x_ref[t].astype(cdt)
                xhb[:tile, :C] = x_ref[T - 1 - t].astype(cdt)
                df = _dot(xhf[:], wpf) + bpf
                db = _dot(xhb[:tile], wpb) + bpb
                hf = gate(df, hf)
                hb = gate(db, hb)
                xhf[:, C:] = hf
                xhb[:tile, C:] = hb
                scrf[t] = hf
                scrb[T - 1 - t] = hb
        elif flr:
            hf = jnp.zeros((tile, C), cdt)
            hb = jnp.zeros((tile, C), cdt)
            for t in range(T):
                hf = (hf + x_ref[t].astype(cdt)).astype(cdt)
                hb = (hb + x_ref[T - 1 - t].astype(cdt)).astype(cdt)
            out_ref[0] = (hf + hb).astype(out_ref.dtype)
            return
        else:
            h = jnp.zeros((tile, C2), cdt)
            for t in range(T):
                x2s[:, :C] = x_ref[t].astype(cdt)
                x2s[:, C:] = x_ref[T - 1 - t].astype(cdt)
                xp = _dot(x2s[:], wi_ref[:]) + b_ref[0:1, :]
                hh = _dot(h, wh_ref[:]) + b_ref[1:2, :]
                r = _sigmoid(xp[:, :C2] + hh[:, :C2])
                z = _sigmoid(xp[:, C2:2 * C2] + hh[:, C2:2 * C2])
                n = jnp.tanh(xp[:, 2 * C2:] + r * hh[:, 2 * C2:])
                h = ((1.0 - z) * n + z * h).astype(cdt)
                scrf[t] = h[:, :C]
                scrb[T - 1 - t] = h[:, C:]
        for t in range(T):
            y = _dot(scrf[t], wfc_ref[:C]) + \
                _dot(scrb[t], wfc_ref[C:]) + bfc_ref[0:1, :]
            mu = jnp.mean(y, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(y - mu), axis=-1, keepdims=True)
            yn = (y - mu) * jax.lax.rsqrt(var + 1e-5)
            yn = (yn * g_ref[0:1, :] + bln_ref[0:1, :]).astype(cdt)
            out_ref[t] = (x_ref[t].astype(cdt) + yn).astype(out_ref.dtype)
        return

    if variant in ("tm_pg", "tm_pg_ch16"):
        # Packed-gate BIDIR step (round 4): the blockdiag wi2/wh2 dots
        # multiply zeros for the cross-direction blocks — half the MXU
        # cycles are structurally wasted.  Per direction d, fold x_d and
        # h_d into ONE dense K=2C dot [x_d | h_d] @ Wp_d [2C, 4C] with
        # columns [r_sum | z_sum | xp_n | hh_n] (the inter kernel's
        # packing, applied per direction): per-step MXU MACs drop
        # 2*(tile*2C*6C) -> 2*(tile*2C*4C) = -33%.  The [x|h] concat
        # rides a persistent per-direction staging scratch: the h half
        # is written once per step by the gate update itself.
        # Timing harness only: weights are arbitrary slices of wi/wh at
        # the right shapes (production derives Wp_d from the real
        # per-direction weights; equivalence is tested there).
        tile = x_ref.shape[1]
        cdt = scrf.dtype
        CH = 16 if variant.endswith("ch16") else 8
        wpf = wi_ref[:, :4 * C]
        wpb = wh_ref[:, :4 * C]
        bpf = b_ref[0:1, :4 * C]
        bpb = b_ref[1:2, :4 * C]
        # persistent [x | h] staging, one per direction: x2s lanes
        # [0:2C] = fw, [2C:4C]... x2s is [tile, 2C]; need two -> reuse
        # x2s for fw and x2all rows [0:tile] for bw
        xhf = x2s
        xhb = x2all

        def gate(d, h):
            r = _sigmoid(d[:, :C])
            z = _sigmoid(d[:, C:2 * C])
            n = jnp.tanh(d[:, 2 * C:3 * C] + r * d[:, 3 * C:])
            return ((1.0 - z) * n + z * h).astype(cdt)

        def chunkg(ci, hs):
            hf, hb = hs
            base = pl.multiple_of(ci * CH, CH)
            rbase = pl.multiple_of(T - CH - ci * CH, CH)
            xf_c = x_ref[pl.ds(base, CH)].astype(cdt)
            xb_c = x_ref[pl.ds(rbase, CH)].astype(cdt)
            for k in range(CH):
                xhf[:, :C] = xf_c[k]
                xhb[:tile, :C] = xb_c[CH - 1 - k]
                df = _dot(xhf[:], wpf) + bpf
                db = _dot(xhb[:tile], wpb) + bpb
                hf = gate(df, hf)
                hb = gate(db, hb)
                xhf[:, C:] = hf
                xhb[:tile, C:] = hb
                scrf[pl.ds(base + k, 1)] = hf[None]
                scrb[pl.ds(rbase + (CH - 1 - k), 1)] = hb[None]
            return (hf, hb)

        hz = jnp.zeros((tile, C), cdt)
        jax.lax.fori_loop(0, T // CH, chunkg, (hz, hz))
        for c0 in range(0, T, CH):
            x_c = x_ref[pl.ds(c0, CH)].astype(cdt)
            for k in range(CH):
                y = _dot(scrf[c0 + k], wfc_ref[:C]) + \
                    _dot(scrb[c0 + k], wfc_ref[C:]) + bfc_ref[0:1, :]
                mu = jnp.mean(y, axis=-1, keepdims=True)
                var = jnp.mean(jnp.square(y - mu), axis=-1, keepdims=True)
                yn = (y - mu) * jax.lax.rsqrt(var + 1e-5)
                yn = (yn * g_ref[0:1, :] + bln_ref[0:1, :]).astype(cdt)
                out_ref[c0 + k] = (x_c[k] + yn).astype(out_ref.dtype)
        return

    if variant in ("tm_floor", "tm_floor_nostage", "tm_floor_bf16",
                   "tm_xp2dot", "tm_xp2dot_bf16", "tm_ch16",
                   "tm_fused_epi", "tm_pair2"):
        # Round-4 probes on the freq-leading walk, decomposing the
        # ~2200 ns/step that sits between tm_full and its dots+epilogue:
        #   tm_floor         loads(+upcast) + staging stores + add — the
        #                    structural floor of the tm_full form
        #   tm_floor_nostage loads(+upcast) + split add (no x2s staging)
        #   tm_floor_bf16    bf16 loads + split add (no upcast either) —
        #                    the absolute data-movement floor
        #   tm_xp2dot        full math; xp as TWO K=C dots on the direct
        #                    chunk slices (no staging store/readback);
        #                    hh stays the packed K=2C dot on the carry
        #   tm_xp2dot_bf16   ... and the x slices feed the dots as bf16
        #                    (weights cast once; accum stays f32)
        #   tm_ch16          tm_full with CH=16 chunk loads
        #   tm_fused_epi     fc/LN/residual fused into the walk's second
        #                    half (each step there completes TWO
        #                    positions; no separate epilogue loop, no ys
        #                    stores in the second half)
        #   tm_pair2         two independent row-chains per step (latency
        #                    probe: can more ILP hide the hh-dot chain?)
        tile = x_ref.shape[1]
        C2 = 2 * C
        cdt = scrf.dtype
        CH = 16 if variant == "tm_ch16" else 8
        bf = variant.endswith("bf16")
        floor = variant.startswith("tm_floor")
        nostage = variant in ("tm_floor_nostage", "tm_floor_bf16")
        twodot = variant.startswith("tm_xp2dot")
        if twodot and bf:
            wiA = wi_ref[:C].astype(jnp.bfloat16)
            wiB = wi_ref[C:].astype(jnp.bfloat16)
        elif twodot:
            wiA = wi_ref[:C]
            wiB = wi_ref[C:]

        if variant == "tm_pair2":
            sub = tile // 2

            def chunkp(ci, hs):
                base = pl.multiple_of(ci * CH, CH)
                rbase = pl.multiple_of(T - CH - ci * CH, CH)
                xf_c = x_ref[pl.ds(base, CH)].astype(cdt)
                xb_c = x_ref[pl.ds(rbase, CH)].astype(cdt)
                for k in range(CH):
                    x2s[:, :C] = xf_c[k]
                    x2s[:, C:] = xb_c[CH - 1 - k]
                    xps = [_dot(x2s[p * sub:(p + 1) * sub], wi_ref[:])
                           + b_ref[0:1, :] for p in range(2)]
                    hhs = [_dot(hs[p], wh_ref[:]) + b_ref[1:2, :]
                           for p in range(2)]
                    new = []
                    for p in range(2):
                        xp, hh, h = xps[p], hhs[p], hs[p]
                        r = _sigmoid(xp[:, :C2] + hh[:, :C2])
                        z = _sigmoid(xp[:, C2:2 * C2] + hh[:, C2:2 * C2])
                        n = jnp.tanh(xp[:, 2 * C2:] + r * hh[:, 2 * C2:])
                        new.append(((1.0 - z) * n + z * h).astype(cdt))
                    hs = tuple(new)
                    for p in range(2):
                        scrf[pl.ds(base + k, 1),
                             p * sub:(p + 1) * sub] = hs[p][:, :C][None]
                        scrb[pl.ds(rbase + (CH - 1 - k), 1),
                             p * sub:(p + 1) * sub] = hs[p][:, C:][None]
                return hs

            jax.lax.fori_loop(0, T // CH, chunkp,
                              (jnp.zeros((sub, C2), cdt),
                               jnp.zeros((sub, C2), cdt)))
            for c0 in range(0, T, CH):
                x_c = x_ref[pl.ds(c0, CH)].astype(cdt)
                for k in range(CH):
                    y = _dot(scrf[c0 + k], wfc_ref[:C]) + \
                        _dot(scrb[c0 + k], wfc_ref[C:]) + bfc_ref[0:1, :]
                    mu = jnp.mean(y, axis=-1, keepdims=True)
                    var = jnp.mean(jnp.square(y - mu), axis=-1,
                                   keepdims=True)
                    yn = (y - mu) * jax.lax.rsqrt(var + 1e-5)
                    yn = (yn * g_ref[0:1, :] + bln_ref[0:1, :]).astype(cdt)
                    out_ref[c0 + k] = (x_c[k] + yn).astype(out_ref.dtype)
            return

        if variant == "tm_fused_epi":
            half = T // 2

            def walk1(ci, h):
                base = pl.multiple_of(ci * CH, CH)
                rbase = pl.multiple_of(T - CH - ci * CH, CH)
                xf_c = x_ref[pl.ds(base, CH)].astype(cdt)
                xb_c = x_ref[pl.ds(rbase, CH)].astype(cdt)
                for k in range(CH):
                    x2s[:, :C] = xf_c[k]
                    x2s[:, C:] = xb_c[CH - 1 - k]
                    xp = _dot(x2s[:], wi_ref[:]) + b_ref[0:1, :]
                    hh = _dot(h, wh_ref[:]) + b_ref[1:2, :]
                    r = _sigmoid(xp[:, :C2] + hh[:, :C2])
                    z = _sigmoid(xp[:, C2:2 * C2] + hh[:, C2:2 * C2])
                    n = jnp.tanh(xp[:, 2 * C2:] + r * hh[:, 2 * C2:])
                    h = ((1.0 - z) * n + z * h).astype(cdt)
                    scrf[pl.ds(base + k, 1)] = h[:, :C][None]
                    scrb[pl.ds(rbase + (CH - 1 - k), 1)] = h[:, C:][None]
                return h

            h = jax.lax.fori_loop(0, half // CH, walk1,
                                  jnp.zeros((tile, C2), cdt))

            def epi(ysf, ysb, x_res):
                y = _dot(ysf, wfc_ref[:C]) + _dot(ysb, wfc_ref[C:]) \
                    + bfc_ref[0:1, :]
                mu = jnp.mean(y, axis=-1, keepdims=True)
                var = jnp.mean(jnp.square(y - mu), axis=-1, keepdims=True)
                yn = (y - mu) * jax.lax.rsqrt(var + 1e-5)
                yn = (yn * g_ref[0:1, :] + bln_ref[0:1, :]).astype(cdt)
                return (x_res + yn).astype(out_ref.dtype)

            # second half statically unrolled: static positions make the
            # out/scr accesses plain indexed stores (no dynamic-base
            # bf16 [None]-expand patterns), and each step completes TWO
            # positions so no separate epilogue loop remains
            for ci in range(half // CH):
                base = half + ci * CH                       # fw positions
                rbase = half - CH - ci * CH                 # bw positions
                xf_c = x_ref[base:base + CH].astype(cdt)
                xb_c = x_ref[rbase:rbase + CH].astype(cdt)
                for k in range(CH):
                    x2s[:, :C] = xf_c[k]
                    x2s[:, C:] = xb_c[CH - 1 - k]
                    xp = _dot(x2s[:], wi_ref[:]) + b_ref[0:1, :]
                    hh = _dot(h, wh_ref[:]) + b_ref[1:2, :]
                    r = _sigmoid(xp[:, :C2] + hh[:, :C2])
                    z = _sigmoid(xp[:, C2:2 * C2] + hh[:, C2:2 * C2])
                    n = jnp.tanh(xp[:, 2 * C2:] + r * hh[:, 2 * C2:])
                    h = ((1.0 - z) * n + z * h).astype(cdt)
                    p1 = base + k                   # fw fresh, bw stored
                    p2 = rbase + (CH - 1 - k)       # = T-1-p1: bw fresh
                    out_ref[p1] = epi(h[:, :C], scrb[p1], xf_c[k])
                    out_ref[p2] = epi(scrf[p2], h[:, C:],
                                      xb_c[CH - 1 - k])
            return

        if floor:
            fdt = jnp.bfloat16 if bf else cdt

            def chunkf(ci, hs):
                hf, hb = hs
                base = pl.multiple_of(ci * CH, CH)
                rbase = pl.multiple_of(T - CH - ci * CH, CH)
                xf_c = x_ref[pl.ds(base, CH)]
                xb_c = x_ref[pl.ds(rbase, CH)]
                if not bf:
                    xf_c = xf_c.astype(cdt)
                    xb_c = xb_c.astype(cdt)
                for k in range(CH):
                    if nostage:
                        hf = (hf + xf_c[k]).astype(fdt)
                        hb = (hb + xb_c[CH - 1 - k]).astype(fdt)
                    else:
                        x2s[:, :C] = xf_c[k]
                        x2s[:, C:] = xb_c[CH - 1 - k]
                        hf = (hf + x2s[:, :C]).astype(fdt)
                        hb = (hb + x2s[:, C:]).astype(fdt)
                return (hf, hb)

            hf, hb = jax.lax.fori_loop(
                0, T // CH, chunkf,
                (jnp.zeros((tile, C), fdt), jnp.zeros((tile, C), fdt)))
            out_ref[0] = (hf + hb).astype(out_ref.dtype)
            return

        def chunkt(ci, h):
            base = pl.multiple_of(ci * CH, CH)
            rbase = pl.multiple_of(T - CH - ci * CH, CH)
            xf_c = x_ref[pl.ds(base, CH)]
            xb_c = x_ref[pl.ds(rbase, CH)]
            if not bf:
                xf_c = xf_c.astype(cdt)
                xb_c = xb_c.astype(cdt)
            for k in range(CH):
                xf = xf_c[k]
                xb = xb_c[CH - 1 - k]
                if twodot:
                    xp = _dot(xf, wiA) + _dot(xb, wiB) + b_ref[0:1, :]
                else:
                    x2s[:, :C] = xf
                    x2s[:, C:] = xb
                    xp = _dot(x2s[:], wi_ref[:]) + b_ref[0:1, :]
                hh = _dot(h, wh_ref[:]) + b_ref[1:2, :]
                r = _sigmoid(xp[:, :C2] + hh[:, :C2])
                z = _sigmoid(xp[:, C2:2 * C2] + hh[:, C2:2 * C2])
                n = jnp.tanh(xp[:, 2 * C2:] + r * hh[:, 2 * C2:])
                h = ((1.0 - z) * n + z * h).astype(cdt)
                scrf[pl.ds(base + k, 1)] = h[:, :C][None]
                scrb[pl.ds(rbase + (CH - 1 - k), 1)] = h[:, C:][None]
            return h

        jax.lax.fori_loop(0, T // CH, chunkt, jnp.zeros((tile, C2), cdt))
        for c0 in range(0, T, CH):
            x_c = x_ref[pl.ds(c0, CH)].astype(cdt)
            for k in range(CH):
                y = _dot(scrf[c0 + k], wfc_ref[:C]) + \
                    _dot(scrb[c0 + k], wfc_ref[C:]) + bfc_ref[0:1, :]
                mu = jnp.mean(y, axis=-1, keepdims=True)
                var = jnp.mean(jnp.square(y - mu), axis=-1, keepdims=True)
                yn = (y - mu) * jax.lax.rsqrt(var + 1e-5)
                yn = (yn * g_ref[0:1, :] + bln_ref[0:1, :]).astype(cdt)
                out_ref[c0 + k] = (x_c[k] + yn).astype(out_ref.dtype)
        return

    tile = x_ref.shape[0]
    C2 = 2 * C
    cdt = scrf.dtype
    CH = 8

    prestage = variant in ("no_staging", "dots_only", "indep_dots")
    if prestage:
        # stage the whole sequence once (timing-only stand-in: real code
        # would need this inside the chunk walk; here we want the per-step
        # staging cost OUT of the loop entirely)
        for c0 in range(0, T, CH):
            xf_c = x_ref[:, pl.ds(c0, CH), :].astype(cdt)
            for k in range(CH):
                x2all[(c0 + k) * tile:(c0 + k + 1) * tile, :C] = xf_c[:, k, :]
                x2all[(c0 + k) * tile:(c0 + k + 1) * tile, C:] = xf_c[:, k, :]

    if variant.startswith("pair"):
        # two (or four) independent row-chains interleaved per step: the
        # MXU dots of one chain can overlap the VPU gate math of the
        # other, hiding the dependent-chain latency the ablations expose.
        P = int(variant[4:]) if len(variant) > 4 else 2
        sub = tile // P

        def chunk(ci, hs):
            base = pl.multiple_of(ci * CH, CH)
            rbase = pl.multiple_of(T - CH - ci * CH, CH)
            xf_c = x_ref[:, pl.ds(base, CH), :].astype(cdt)
            xb_c = x_ref[:, pl.ds(rbase, CH), :].astype(cdt)
            for k in range(CH):
                x2s[:, :C] = xf_c[:, k, :]
                x2s[:, C:] = xb_c[:, CH - 1 - k, :]
                xps = [_dot(x2s[p * sub:(p + 1) * sub], wi_ref[:])
                       + b_ref[0:1, :] for p in range(P)]
                hhs = [_dot(hs[p], wh_ref[:]) + b_ref[1:2, :]
                       for p in range(P)]
                new = []
                for p in range(P):
                    xp, hh, h = xps[p], hhs[p], hs[p]
                    r = _sigmoid(xp[:, :C2] + hh[:, :C2])
                    z = _sigmoid(xp[:, C2:2 * C2] + hh[:, C2:2 * C2])
                    n = jnp.tanh(xp[:, 2 * C2:] + r * hh[:, 2 * C2:])
                    new.append(((1.0 - z) * n + z * h).astype(cdt))
                hs = tuple(new)
                for p in range(P):
                    scrf[pl.ds(base + k, 1), p * sub:(p + 1) * sub] = \
                        hs[p][:, :C][None]
                    scrb[pl.ds(rbase + (CH - 1 - k), 1),
                         p * sub:(p + 1) * sub] = hs[p][:, C:][None]
            return hs

        hs = jax.lax.fori_loop(
            0, T // CH, chunk,
            tuple(jnp.zeros((sub, C2), cdt) for _ in range(P)))
        out_ref[0:sub] = hs[0][:, :C].astype(out_ref.dtype)
        return

    if variant in ("minimal_nostage", "twodot"):
        # split h carry (hf, hb): no lane-concat => no x2s staging ever.
        # twodot replaces the packed K=2C xp GEMM with two K=C dots on
        # the direct chunk slices; hh stays one packed K=2C dot on the
        # (clean-layout) carried h.
        def chunk2(ci, hs):
            hf, hb = hs
            base = pl.multiple_of(ci * CH, CH)
            rbase = pl.multiple_of(T - CH - ci * CH, CH)
            xf_c = x_ref[:, pl.ds(base, CH), :].astype(cdt)
            xb_c = x_ref[:, pl.ds(rbase, CH), :].astype(cdt)
            for k in range(CH):
                xf = xf_c[:, k, :]
                xb = xb_c[:, CH - 1 - k, :]
                if variant == "minimal_nostage":
                    hf = (hf + xf).astype(cdt)
                    hb = (hb + xb).astype(cdt)
                    continue
                xp = (_dot(xf, wi_ref[:C]) + _dot(xb, wi_ref[C:])
                      + b_ref[0:1, :])
                hh = (_dot(hf, wh_ref[:C]) + _dot(hb, wh_ref[C:])
                      + b_ref[1:2, :])
                r = _sigmoid(xp[:, :C2] + hh[:, :C2])
                z = _sigmoid(xp[:, C2:2 * C2] + hh[:, C2:2 * C2])
                n = jnp.tanh(xp[:, 2 * C2:] + r * hh[:, 2 * C2:])
                hf = ((1.0 - z[:, :C]) * n[:, :C]
                      + z[:, :C] * hf).astype(cdt)
                hb = ((1.0 - z[:, C:C2]) * n[:, C:C2]
                      + z[:, C:C2] * hb).astype(cdt)
                scrf[pl.ds(base + k, 1)] = hf[None]
                scrb[pl.ds(rbase + (CH - 1 - k), 1)] = hb[None]
            return (hf, hb)

        hf, hb = jax.lax.fori_loop(
            0, T // CH, chunk2,
            (jnp.zeros((tile, C), cdt), jnp.zeros((tile, C), cdt)))
        out_ref[:] = hf.astype(out_ref.dtype)
        return

    if variant in ("minimal_static", "full_static"):
        # fully static chunk walk: python loop instead of fori_loop, so
        # every x slice has a COMPILE-TIME base.  Isolates the cost of
        # dynamic-base block slicing (the one thing every slow variant
        # shares).
        h = jnp.zeros((tile, C2), cdt)
        for ci in range(T // CH):
            base = ci * CH
            rbase = T - CH - ci * CH
            xf_c = x_ref[:, base:base + CH, :].astype(cdt)
            xb_c = x_ref[:, rbase:rbase + CH, :].astype(cdt)
            for k in range(CH):
                x2s[:, :C] = xf_c[:, k, :]
                x2s[:, C:] = xb_c[:, CH - 1 - k, :]
                if variant == "minimal_static":
                    h = (h + x2s[:]).astype(cdt)
                    continue
                xp = _dot(x2s[:], wi_ref[:]) + b_ref[0:1, :]
                hh = _dot(h, wh_ref[:]) + b_ref[1:2, :]
                r = _sigmoid(xp[:, :C2] + hh[:, :C2])
                z = _sigmoid(xp[:, C2:2 * C2] + hh[:, C2:2 * C2])
                n = jnp.tanh(xp[:, 2 * C2:] + r * hh[:, 2 * C2:])
                h = ((1.0 - z) * n + z * h).astype(cdt)
                hf = h[:, :C]
                hb = h[:, C:]
                scrf[base + k: base + k + 1] = hf[None]
                scrb[rbase + (CH - 1 - k): rbase + (CH - k)] = hb[None]
        if variant == "full_static":
            # epilogue, static too
            for c0 in range(0, T, CH):
                x_c = x_ref[:, c0:c0 + CH, :].astype(cdt)
                for k in range(CH):
                    y = _dot(scrf[c0 + k], wfc_ref[:C]) + \
                        _dot(scrb[c0 + k], wfc_ref[C:]) + bfc_ref[0:1, :]
                    mu = jnp.mean(y, axis=-1, keepdims=True)
                    var = jnp.mean(jnp.square(y - mu), axis=-1,
                                   keepdims=True)
                    yn = (y - mu) * jax.lax.rsqrt(var + 1e-5)
                    yn = (yn * g_ref[0:1, :] + bln_ref[0:1, :]).astype(cdt)
                    out_ref[:, c0 + k, :] = (x_c[:, k, :] + yn).astype(
                        out_ref.dtype)
        else:
            out_ref[:] = h[:, :C].astype(out_ref.dtype)
        return

    def chunk(ci, h):
        base = pl.multiple_of(ci * CH, CH)
        rbase = pl.multiple_of(T - CH - ci * CH, CH)
        xf_c = x_ref[:, pl.ds(base, CH), :].astype(cdt)
        xb_c = x_ref[:, pl.ds(rbase, CH), :].astype(cdt)
        for k in range(CH):
            if variant == "minimal":
                # loads + staging + one VPU add per step: the floor of
                # the step structure itself (concat of offset-layout
                # slices is unsupported — stage through x2s as the real
                # kernel does)
                x2s[:, :C] = xf_c[:, k, :]
                x2s[:, C:] = xb_c[:, CH - 1 - k, :]
                h = (h + x2s[:]).astype(cdt)
                continue
            if variant == "gates_only":
                xp = jnp.concatenate([xf_c[:, k, :]] * 6, axis=-1)
                hh = jnp.concatenate([h] * 3, axis=-1)
            elif prestage:
                x2 = x2all[pl.ds((base + k) * tile, tile)]
                xp = _dot(x2, wi_ref[:]) + b_ref[0:1, :]
                if variant == "indep_dots":
                    # break the h dependence: same dot shapes, no chain
                    hh = _dot(x2, wh_ref[:]) + b_ref[1:2, :]
                else:
                    hh = _dot(h, wh_ref[:]) + b_ref[1:2, :]
            else:
                x2s[:, :C] = xf_c[:, k, :]
                x2s[:, C:] = xb_c[:, CH - 1 - k, :]
                xp = _dot(x2s[:], wi_ref[:]) + b_ref[0:1, :]
                hh = _dot(h, wh_ref[:]) + b_ref[1:2, :]
            if variant in ("dots_only", "indep_dots"):
                h = (xp[:, :C2] + hh[:, :C2]).astype(cdt)
            else:
                r = _sigmoid(xp[:, :C2] + hh[:, :C2])
                z = _sigmoid(xp[:, C2:2 * C2] + hh[:, C2:2 * C2])
                n = jnp.tanh(xp[:, 2 * C2:] + r * hh[:, 2 * C2:])
                h = ((1.0 - z) * n + z * h).astype(cdt)
            if variant in ("full", "no_epilogue"):
                hf = h[:, :C]
                hb = h[:, C:]
                scrf[pl.ds(base + k, 1)] = hf[None]
                scrb[pl.ds(rbase + (CH - 1 - k), 1)] = hb[None]
        return h

    h = jax.lax.fori_loop(0, T // CH, chunk, jnp.zeros((tile, C2), cdt))

    if variant == "full":
        for c0 in range(0, T, CH):
            x_c = x_ref[:, pl.ds(c0, CH), :].astype(cdt)
            for k in range(CH):
                y = _dot(scrf[c0 + k], wfc_ref[:C]) + \
                    _dot(scrb[c0 + k], wfc_ref[C:]) + bfc_ref[0:1, :]
                mu = jnp.mean(y, axis=-1, keepdims=True)
                var = jnp.mean(jnp.square(y - mu), axis=-1, keepdims=True)
                yn = (y - mu) * jax.lax.rsqrt(var + 1e-5)
                yn = (yn * g_ref[0:1, :] + bln_ref[0:1, :]).astype(cdt)
                out_ref[:, c0 + k, :] = (x_c[:, k, :] + yn).astype(
                    out_ref.dtype)
    else:
        # ablation variants use a 2-D out block: a [tile, C] -> [tile, 1, C]
        # bf16 vector reshape after the fori_loop is an unsupported shape
        # cast in this Mosaic version
        out_ref[:] = h[:, :C].astype(out_ref.dtype)


def build(variant, rows, T, C, tile, dtype, interpret=False):
    cdt = jnp.float32
    kern = functools.partial(_kernel, T, C, variant)
    if variant in ("tm_full", "tm_direct", "tm_floor", "tm_floor_nostage",
                   "tm_floor_bf16", "tm_xp2dot", "tm_xp2dot_bf16",
                   "tm_ch16", "tm_fused_epi", "tm_pair2", "tm_pg",
                   "tm_pg_ch16", "tm_allstatic", "tm_pg_static",
                   "tm_floor_static"):
        x_spec = pl.BlockSpec((T, tile, C), lambda i: (0, i, 0),
                              memory_space=pltpu.VMEM)
        out_spec = x_spec
        out_shape = jax.ShapeDtypeStruct((T, rows, C), dtype)
    elif variant in ("tm_minimal", "tm_prex2"):
        x_spec = pl.BlockSpec((T, tile, 2 * C), lambda i: (0, i, 0),
                              memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((T, tile, C), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((T, rows, C), dtype)
    else:
        x_spec = pl.BlockSpec((tile, T, C), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
        out_spec = (pl.BlockSpec((tile, T, C), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
                    if variant in ("full", "full_static") else
                    pl.BlockSpec((tile, C), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM))
        out_shape = (jax.ShapeDtypeStruct((rows, T, C), dtype)
                     if variant in ("full", "full_static") else
                     jax.ShapeDtypeStruct((rows, C), dtype))
    call = pl.pallas_call(
        kern,
        grid=(rows // tile,),
        in_specs=[x_spec] +
                 [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((T, tile, C), cdt),
            pltpu.VMEM((T, tile, C), cdt),
            pltpu.VMEM((tile, 2 * C), cdt),
            pltpu.VMEM((T * tile, 2 * C) if variant in
                       ("no_staging", "dots_only", "indep_dots")
                       else (tile, 2 * C) if variant.startswith("tm_pg")
                       else (8, 128), cdt),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )
    return call


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=4096)
    ap.add_argument("--T", type=int, default=48)
    ap.add_argument("--C", type=int, default=64)
    ap.add_argument("--tile", type=int, default=512)
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--variants", default="full,no_epilogue,no_ys_stores,"
                                          "no_staging,dots_only,gates_only")
    ap.add_argument("--interpret", action="store_true",
                    help="CPU interpret-mode smoke test: run each full-math"
                         " tm variant once and diff its output vs tm_full"
                         " (no timing)")
    args = ap.parse_args()
    if args.interpret:
        import jax as _jax
        _jax.config.update("jax_platforms", "cpu")

    rows, T, C, tile = args.rows, args.T, args.C, args.tile
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(rows, T, C)).astype(np.float32),
                    dtype=dtype)
    # 1/sqrt(fan-in) weight scale: std-1 recurrent weights are chaotic
    # (a 1e-6 dot-order difference amplifies ~2x/step), which would make
    # the --interpret equivalence check meaningless
    ws = 1.0 / np.sqrt(2 * C)
    wi = jnp.asarray(ws * rng.normal(size=(2 * C, 6 * C)).astype(np.float32))
    wh = jnp.asarray(ws * rng.normal(size=(2 * C, 6 * C)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(2, 6 * C)).astype(np.float32))
    wfc = jnp.asarray(rng.normal(size=(2 * C, C)).astype(np.float32))
    bfc = jnp.asarray(rng.normal(size=(1, C)).astype(np.float32))
    g = jnp.ones((1, C), jnp.float32)
    bln = jnp.zeros((1, C), jnp.float32)

    if args.interpret:
        xv = jnp.swapaxes(x, 0, 1)
        ref = np.asarray(build("tm_full", rows, T, C, tile, dtype,
                               interpret=True)(
            xv, wi, wh, b, wfc, bfc, g, bln), np.float32)
        for variant in args.variants.split(","):
            if not variant.startswith("tm_") or variant in (
                    "tm_full", "tm_minimal", "tm_prex2") or \
                    "floor" in variant or "pg" in variant:
                continue
            out = np.asarray(build(variant, rows, T, C, tile, dtype,
                                   interpret=True)(
                xv, wi, wh, b, wfc, bfc, g, bln), np.float32)
            err = np.max(np.abs(out - ref))
            print(f"{variant:>16}: max |out - tm_full| = {err:.3e}",
                  flush=True)
        return

    results = {}
    steps_per_rep = (rows // tile) * T
    for variant in args.variants.split(","):
        call = build(variant, rows, T, C, tile, dtype)
        if variant.startswith("tm_") and variant not in ("tm_minimal",
                                                         "tm_prex2"):
            xv = jnp.swapaxes(x, 0, 1)
        elif variant in ("tm_minimal", "tm_prex2"):
            xtm = jnp.swapaxes(x, 0, 1)                   # [T, rows, C]
            xv = jnp.concatenate([xtm, jnp.flip(xtm, 0)], axis=-1)
        else:
            xv = x

        def run(x, _call=call):
            def body(i, acc):
                out = _call((x * (1.0 + acc * 0.0)).astype(dtype),
                            wi, wh, b, wfc, bfc, g, bln)
                return acc + out[..., 0, 0].astype(jnp.float32).sum()
            return jax.lax.fori_loop(0, args.reps, body,
                                     jnp.float32(0.0))

        fn = jax.jit(run)
        t0 = time.perf_counter()
        float(fn(xv))                                  # compile + warm
        compile_s = time.perf_counter() - t0
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(xv))
            best = min(best, time.perf_counter() - t0)
        per_rep_ms = best / args.reps * 1e3
        per_step_ns = best / args.reps / steps_per_rep * 1e9
        results[variant] = (per_rep_ms, per_step_ns)
        print(f"{variant:>14}: {per_rep_ms:8.3f} ms/call "
              f"{per_step_ns:8.0f} ns/step  (compile {compile_s:.0f}s)",
              flush=True)

    if "full" in results:
        base = results["full"][0]
        print("\ndeltas vs full:")
        for k, (ms, _) in results.items():
            print(f"{k:>14}: {ms - base:+8.3f} ms ({100 * (ms - base) / base:+6.1f}%)")


if __name__ == "__main__":
    main()
