#!/usr/bin/env python
"""Ablate the DPRNN inter-kernel step (packed-gate form) like
tools/intra_step_ablation.py does for the intra walk.

Shapes mirror the b384-turbo fm chain (tile 1536 = 4 f-slices x B 384,
TS = 8, C = H = 64, bf16 planes) scaled to a harness-sized row count.
Reps run inside one jit; NOTE the axon relay adds a ~23 ms dispatch
cost PER CALL, i.e. ~23/reps ms of constant bias per rep — use
--reps >= 240 and read DIFFERENCES between variants (they cancel the
bias).  Round-4 discovery: the round-2/3 intra ablations at --reps 30
carried a ~2.3 us/step bias; magnitudes there are wrong, rankings hold.

Variants:
  full      mirror of the shipped packed kernel: per step one
            [x_t | h] @ Wp K=2C dot (staged through a persistent
            scratch), gates, fc dot + LayerNorm + residual, out store
  floor     x loads + staging store + add (no dots/gates/fc)
  nofc      full minus the fc/LN/residual tail (stores h instead)
  nogates   full with the gate math replaced by one add
  fcfused   the fc dot FOLDED into the packed gate dot as C extra
            columns against the h half (computing fc(h_{s-1}) one step
            deferred, written to out[s-1]; the cell's last position
            gets an immediate tail dot).  Removes the separate
            half-depth fc dot from the per-step critical path:
            effective MXU per step 2C*4H + 2*C*C -> 2C*(4H+C) (-11%)
            and one less dot issue.

Round-5 additive decomposition of the band above floor, each variant one
ingredient more than the previous, all on the shipped fcfused form so the
deltas attribute the post-fcfuse step cost (run at --reps 240+):

  floor0    x load + add + out store only (no staging scratch)
  floor     + the [x | h] staging stores            (staging cost)
  dotonly   + the packed [2H, 5H] dot + bias,
            h = d[:,:H] + h, out = h                (MXU issue+latency)
  dotgates  + full r/z/n gate math, out = h         (gate VPU cost)
  noln      fcfused with LN replaced by y + residual (tail minus LN)
  fcfused   the shipped form                        (LN cost = vs noln)

ROUND-5 MEASURED LEDGER (v5e, rows 6144 tile 1536 TS 8 reps 240,
ns/step; magnitudes carry ~95 ns relay bias, differences are clean):

  floor0 1701 | floor 1700 | dotonly 1699   <- staging AND the packed
                 [2H,5H] gate dot are FREE (hidden under the pipeline's
                 load/store floor)
  dotgates 1884-1945                        <- gate transcendentals +185
  noln     1796-1844                        <- fc slice/residual/store ~free
  fcfused  3013-3051 (shipped)              <- the LN mean/var lane
                 reductions alone are ~1.2 us/step = 39% of the step
  full     3236                             <- separate fc dot +0.2 us
  ln1pass  3193  REJECTED (one-pass moments: slower AND changes bits)
  lnmxu    4596  REJECTED (LN reductions as HIGHEST MXU dots against
                 ones[H,128]/H: 6-pass dots on the critical path cost
                 far more than the VPU trees they replace)
  lnmxu1   2691  REJECTED (-12% with 1-pass bf16 LN dots — but bf16
                 statistics break the f32-grade tier contract)

The follow-up e2e probe (DPDFNET_TPU_INTER_DEFER: emit raw h, run
fc+LN+residual as a vectorised XLA pass outside the kernel) measured
**1732 vs 2890 xRT turbo b384 / 1206 vs 2321 fast b256 — REJECTED
hard**: outside the kernel the tail's HBM round-trip (h plane out,
h + x planes back in, the [T,Fq]-transposed residual read) plus its
serial position between chained kernels costs ~3x what the in-kernel
VPU reductions do.  CONCLUSION: the fused in-kernel tail is the
measured optimum; the ~1.2 us LN band is structural on this VPU (its
cost is the price of keeping the tail inside the pipelined walk, and
every lift-out loses more).

Usage: python tools/inter_step_ablation.py [--rows 6144] [--T 56]
       [--reps 240]
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


def _kernel(TS, H, variant, eps,
            h0_ref, x_ref, wp_ref, bp_ref, wfc_ref, bfc_ref,
            g_ref, bln_ref, jm_ref, out_ref, hl_ref, h_scr, xh_scr):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scr[:] = h0_ref[0]

    h = h_scr[:]
    H2 = 2 * H
    cdt = h_scr.dtype

    def ln_res(y, x):
        if variant == "noln":
            # tail minus the normalisation: scale/shift + residual only
            yn = y * g_ref[0:1, :] + bln_ref[0:1, :]
            return (x + yn.astype(cdt)).astype(out_ref.dtype)
        if variant in ("lnmxu", "lnmxu1"):
            lnprec = (jax.lax.Precision.DEFAULT if variant == "lnmxu1"
                      else jax.lax.Precision.HIGHEST)
            # both LN reductions as MXU dots against ones[H,128]/H: the
            # [tile, 128] results carry the row statistic replicated
            # across all lanes, so the broadcast back is free and the VPU
            # never runs a lane-reduction tree.  Two-pass (mu first, then
            # var of the centered values) — no cancellation.  HIGHEST so
            # the statistics stay f32-grade.
            mu = jax.lax.dot_general(
                y, jm_ref[:], MM, precision=lnprec,
                preferred_element_type=jnp.float32)
            yc = y - mu[:, :H]
            var = jax.lax.dot_general(
                yc * yc, jm_ref[:], MM, precision=lnprec,
                preferred_element_type=jnp.float32)
            yn = yc * jax.lax.rsqrt(var[:, :H] + eps)
            yn = yn * g_ref[0:1, :] + bln_ref[0:1, :]
            return (x + yn.astype(cdt)).astype(out_ref.dtype)
        if variant == "ln1pass":
            # one-pass moments: var = E[y^2] - mu^2 (changes bits)
            mu = jnp.mean(y, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(y), axis=-1, keepdims=True) - mu * mu
        else:
            mu = jnp.mean(y, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(y - mu), axis=-1, keepdims=True)
        yn = (y - mu) * jax.lax.rsqrt(var + eps)
        yn = yn * g_ref[0:1, :] + bln_ref[0:1, :]
        return (x + yn.astype(cdt)).astype(out_ref.dtype)

    if variant == "floor0":
        for s in range(TS):
            x = x_ref[s].astype(cdt)
            h = (h + x).astype(cdt)
            out_ref[s] = h.astype(out_ref.dtype)
        h_scr[:] = h
        hl_ref[0] = h
        return

    if variant == "floor":
        for s in range(TS):
            x = x_ref[s].astype(cdt)
            xh_scr[:, :H] = x
            xh_scr[:, H:] = h
            h = (h + xh_scr[:, :H]).astype(cdt)
            out_ref[s] = h.astype(out_ref.dtype)
        h_scr[:] = h
        hl_ref[0] = h
        return

    if variant in ("dotonly", "dotgates"):
        # The fcfused dot shape ([2H, 5H]) without the tail: isolates the
        # packed-dot MXU cost (dotonly) and then the gate VPU cost on top
        # (dotgates).  out stores h so the HBM write traffic matches.
        for s in range(TS):
            x = x_ref[s].astype(cdt)
            xh_scr[:, :H] = x
            xh_scr[:, H:] = h
            d = _dot(xh_scr[:], wp_ref[:]) + bp_ref[0:1, :]
            if variant == "dotonly":
                h = (d[:, :H] + h).astype(cdt)
            else:
                r = _sigmoid(d[:, :H])
                z = _sigmoid(d[:, H:H2])
                n = jnp.tanh(d[:, H2:H2 + H] + r * d[:, H2 + H:4 * H])
                h = ((1.0 - z) * n + z * h).astype(cdt)
            out_ref[s] = h.astype(out_ref.dtype)
        h_scr[:] = h
        hl_ref[0] = h
        return

    if variant in ("fcfused", "noln", "ln1pass", "lnmxu", "lnmxu1"):
        # wp_ref is [2H, 4H + H]: the last H columns hold [0; Wfc] so the
        # gate dot also emits fc(h_{s-1}) (the h staged from the PREVIOUS
        # step).  s == 0's fc output belongs to the previous cell's last
        # position, already written by that cell's tail dot — discard.
        for s in range(TS):
            x = x_ref[s].astype(cdt)
            xh_scr[:, :H] = x
            xh_scr[:, H:] = h
            d = _dot(xh_scr[:], wp_ref[:]) + bp_ref[0:1, :]
            if s > 0:
                y = d[:, 4 * H:] + bfc_ref[0:1, :]
                out_ref[s - 1] = ln_res(y, x_ref[s - 1].astype(cdt))
            r = _sigmoid(d[:, :H])
            z = _sigmoid(d[:, H:H2])
            n = jnp.tanh(d[:, H2:H2 + H] + r * d[:, H2 + H:4 * H])
            h = ((1.0 - z) * n + z * h).astype(cdt)
        y = _dot(h, wfc_ref[:]) + bfc_ref[0:1, :]
        out_ref[TS - 1] = ln_res(y, x_ref[TS - 1].astype(cdt))
        h_scr[:] = h
        hl_ref[0] = h
        return

    for s in range(TS):
        x = x_ref[s].astype(cdt)
        xh_scr[:, :H] = x
        xh_scr[:, H:] = h
        d = _dot(xh_scr[:], wp_ref[:, :4 * H]) + bp_ref[0:1, :4 * H]
        if variant == "nogates":
            h = (d[:, :H] + h).astype(cdt)
        else:
            r = _sigmoid(d[:, :H])
            z = _sigmoid(d[:, H:H2])
            n = jnp.tanh(d[:, H2:H2 + H] + r * d[:, H2 + H:])
            h = ((1.0 - z) * n + z * h).astype(cdt)
        if variant == "nofc":
            out_ref[s] = h.astype(out_ref.dtype)
        else:
            y = _dot(h, wfc_ref[:]) + bfc_ref[0:1, :]
            out_ref[s] = ln_res(y, x)
    h_scr[:] = h
    hl_ref[0] = h


def build(variant, rows, T, H, tile, TS, dtype, interpret=False):
    cdt = jnp.float32
    kern = functools.partial(_kernel, TS, H, variant, 1e-5)
    tmap = lambda i, t: (t, i, 0)
    return pl.pallas_call(
        kern,
        grid=(rows // tile, T // TS),
        in_specs=[
            pl.BlockSpec((1, tile, H), lambda i, t: (0, i, 0),
                         memory_space=pltpu.VMEM),                # h0
            pl.BlockSpec((TS, tile, H), tmap,
                         memory_space=pltpu.VMEM),                # x
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=[
            pl.BlockSpec((TS, tile, H), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, H), lambda i, t: (0, i, 0),
                         memory_space=pltpu.VMEM),                # h_last
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, rows, H), dtype),
            jax.ShapeDtypeStruct((1, rows, H), cdt),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile, H), cdt),                           # h carry
            pltpu.VMEM((tile, 2 * H), cdt),                       # [x | h]
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=6144)
    ap.add_argument("--T", type=int, default=56)
    ap.add_argument("--H", type=int, default=64)
    ap.add_argument("--tile", type=int, default=1536)
    ap.add_argument("--TS", type=int, default=8)
    ap.add_argument("--reps", type=int, default=240)
    ap.add_argument(
        "--variants",
        default="full,floor0,floor,dotonly,dotgates,noln,fcfused")
    ap.add_argument("--interpret", action="store_true",
                    help="CPU equivalence check: fcfused vs full")
    args = ap.parse_args()
    if args.interpret:
        jax.config.update("jax_platforms", "cpu")

    rows, T, H, tile, TS = args.rows, args.T, args.H, args.tile, args.TS
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    ws = 1.0 / np.sqrt(2 * H)
    x = jnp.asarray(rng.normal(size=(T, rows, H)).astype(np.float32),
                    dtype=dtype)
    h0 = jnp.asarray(rng.normal(size=(1, rows, H)).astype(np.float32))
    # wp: [2H, 5H] — first 4H the packed gate columns, last H = [0; Wfc]
    wp = (ws * rng.normal(size=(2 * H, 5 * H))).astype(np.float32)
    wfc = wp[H:, 4 * H:].copy()          # fc must match the fused columns
    wp[:H, 4 * H:] = 0.0
    wp = jnp.asarray(wp)
    wfc = jnp.asarray(wfc)
    bp = (ws * rng.normal(size=(1, 5 * H))).astype(np.float32)
    bp[:, 4 * H:] = 0.0                  # fc bias lives in bfc only
    bp = jnp.asarray(bp)
    bfc = jnp.asarray(ws * rng.normal(size=(1, H)).astype(np.float32))
    g = jnp.ones((1, H), jnp.float32)
    bln = jnp.zeros((1, H), jnp.float32)
    jm = jnp.asarray(np.full((H, 128), 1.0 / H, np.float32))
    wargs = (wp, bp, wfc, bfc, g, bln, jm)

    if args.interpret:
        ref = build("full", rows, T, H, tile, TS, dtype, interpret=True)(
            h0, x, *wargs)
        for variant in ("fcfused", "lnmxu", "nofc"):
            out = build(variant, rows, T, H, tile, TS, dtype,
                        interpret=True)(h0, x, *wargs)
            if variant == "nofc":
                err = float(jnp.max(jnp.abs(
                    out[1].astype(jnp.float32) - ref[1].astype(jnp.float32))))
                print(f"{variant:>8}: max |h_last - full| = {err:.3e}")
                continue
            for i, (o, r) in enumerate(zip(out, ref)):
                err = float(jnp.max(jnp.abs(
                    o.astype(jnp.float32) - r.astype(jnp.float32))))
                print(f"{variant:>8}[{i}]: max |out - full| = {err:.3e}")
        return

    results = {}
    steps_per_rep = (rows // tile) * T
    for variant in args.variants.split(","):
        call = build(variant, rows, T, H, tile, TS, dtype)

        def run(x, _call=call):
            def body(i, acc):
                out, hl = _call(
                    h0 + acc * 0.0, x, *wargs)
                return acc + hl[0, 0, 0].astype(jnp.float32)
            return jax.lax.fori_loop(0, args.reps, body, jnp.float32(0.0))

        fn = jax.jit(run)
        t0 = time.perf_counter()
        float(fn(x))
        compile_s = time.perf_counter() - t0
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(x))
            best = min(best, time.perf_counter() - t0)
        per_rep_ms = best / args.reps * 1e3
        per_step_ns = best / args.reps / steps_per_rep * 1e9
        results[variant] = (per_rep_ms, per_step_ns)
        print(f"{variant:>10}: {per_rep_ms:8.3f} ms/call "
              f"{per_step_ns:8.0f} ns/step  (compile {compile_s:.0f}s)",
              flush=True)

    for base_name in ("full", "fcfused"):
        if base_name in results:
            base = results[base_name][0]
            print(f"\ndeltas vs {base_name}:")
            for k, (ms, _) in results.items():
                print(f"{k:>10}: {ms - base:+8.3f} ms "
                      f"({100 * (ms - base) / base:+6.1f}%)")


if __name__ == "__main__":
    main()
