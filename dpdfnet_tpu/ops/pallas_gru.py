"""Fused GRU sequence scan as a Pallas TPU kernel.

The GRU time recurrences are the sequential core of DPDFNet (SURVEY.md §7
"hard parts"): XLA lowers each `lax.scan` step to a while-loop iteration
with HBM round-trips for the carry, per-step dynamic slices of the input,
and layout copies at the loop boundary — measured at ~55% of the whole
model's runtime on v5e.

This kernel instead walks the sequence on a ``(row_tiles, T)`` grid with
the time axis marked "arbitrary" (sequential): the hidden state lives in a
VMEM scratch that persists across time steps, weights stay resident, and
Pallas' pipeline machinery double-buffers the x/y block DMAs against the
MXU GEMMs.  Per step it computes

    xp = x_t @ Wi + bi;  hh = h @ Wh + bh
    r = sigmoid(xp_r + hh_r); z = sigmoid(xp_z + hh_z)
    n = tanh(xp_n + r * hh_n);  h' = (1-z)*n + z*h

which is exactly torch's GRU cell (gates packed (r,z,n)), matching
`ops.nn.gru_cell`.

Layout contract: x is time-major [T, N, I]; outputs ys [T, N, H]; rows are
independent streams (batch x whatever axis the model scans over).
"""

from __future__ import annotations

import contextlib
import contextvars
import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# Mosaic supports only DEFAULT/HIGHEST dot precision.  'high' (bf16_3x,
# XLA's three-pass f32-grade mode) is implemented manually by _kdot:
# split both operands into hi/lo bf16 halves and accumulate three native
# bf16 MXU passes in f32 — same decomposition XLA uses outside kernels.
# (Historical: mapping 'high' to HIGHEST (6-pass) measured 660 xRT at
# b256 vs 1653 for 'default'; the GEMMs are NOT free behind the DMA
# stream at the tuned tile sizes.)
_PRECISIONS = {
    "default": jax.lax.Precision.DEFAULT,
    "high": "bf16_3x",
    "highest": jax.lax.Precision.HIGHEST,
}

_MM_DIMS = (((1,), (0,)), ((), ()))


def _kdot(a, b, precision):
    """In-kernel matmul honouring the tier semantics (see _PRECISIONS)."""
    if precision == "bf16_3x":
        if a.dtype == jnp.bfloat16 and b.dtype == jnp.bfloat16:
            # low halves are exactly zero for native-bf16 operands: one
            # pass is bit-identical to three
            return jax.lax.dot_general(
                a, b, _MM_DIMS, precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32)
        af = a.astype(jnp.float32)
        bf = b.astype(jnp.float32)
        ah = af.astype(jnp.bfloat16)
        al = (af - ah.astype(jnp.float32)).astype(jnp.bfloat16)
        bh = bf.astype(jnp.bfloat16)
        bl = (bf - bh.astype(jnp.float32)).astype(jnp.bfloat16)

        def d(x, y):
            return jax.lax.dot_general(
                x, y, _MM_DIMS, precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32)

        return d(ah, bh) + (d(ah, bl) + d(al, bh))
    return jax.lax.dot_general(
        a, b, _MM_DIMS, precision=precision,
        preferred_element_type=jnp.float32)

# Rows per grid cell.  Grid cells execute sequentially on the TensorCore,
# so the tile should cover as many rows as VMEM allows — smaller tiles
# multiply the sequential step count.  Budget: x block (2 pipeline buffers)
# + ys block (2) + h0/h_last/h-scratch, each tile*max(I,H)*4B.
_TILE_N = 2048


def _sigmoid(x):
    """Gate sigmoid as 0.5*(tanh(x/2)+1) — mathematically the same
    function, but lowered as a single tanh instead of exp+divide, which
    trims the per-step VPU transcendental cost that bounds these kernels
    (measured: 1808 -> 1878 xRT on the b256 flagship bench; outputs differ
    from jax.nn.sigmoid only in last-bit rounding, ~6e-8).
    DPDFNET_TPU_SIGMOID_TANH=0 restores the exp form (read at trace time).

    Gate-math ceiling, measured (round 2, b256 flagship 'default'): with
    ALL gate transcendentals AND the sigmoid pre/post scales replaced by
    identity (wrong math, timing only) the bench moves 1873 -> 1893 xRT,
    i.e. the entire gate-function budget is ~1% e2e.  The kernels are
    bound by the per-step MXU dots / pipeline, not VPU gate math — do not
    invest in cheaper tanh approximations or gate algebra."""
    if os.environ.get("DPDFNET_TPU_SIGMOID_TANH", "1") in ("0", "false"):
        return jax.nn.sigmoid(x)
    return 0.5 * (jnp.tanh(0.5 * x) + 1.0)




def _inter_ts() -> int:
    """Recurrence steps per grid cell in the DPRNN inter kernel
    (override: DPDFNET_TPU_INTER_TS).

    TS>1 amortises the pipeline's per-cell bookkeeping; measured on v5e
    (dpdfnet8_48khz_hr 'default', intra tile 256): at seg 128/b32 TS 4
    and 8 tie (1156/1151); at the seg-112 default/b256 TS=8 wins
    (1806 vs 1747 at TS=4).  TS=16 now compiles (the self-sized vmem
    limit covers its ~70M need when the env cap is unset) but measured
    SLOWER: 1856 at 96M f32/b256, 2080 at turbo/b384."""
    return int(os.environ.get("DPDFNET_TPU_INTER_TS", "8"))


def _inter_hoist() -> bool:
    """In-kernel TS-block x-projection hoist in the inter kernel
    (DPDFNET_TPU_INTER_HOIST=1, read at trace time).

    The inter GRU's per-step dots contract over K=C=64 — half the MXU's
    128 sublanes idle.  Hoisting xp for the whole TS block into one
    [TS*tile, C] GEMM keeps only the hh dot in the sequential walk.
    Unlike the rejected v2 variant (xp via HBM) this stays in VMEM; the
    cost is a TS*tile*3C f32 scratch.

    MEASURED SLOWER on v5e (b384 turbo: 2100 vs 2140 xRT) — the pipeline
    already overlaps the per-step xp dot with the gate VPU work, so the
    hoist only adds scratch traffic.  Same conclusion as every other
    hoist variant (intra v3, v2); kept for hardware with a different
    MXU:VPU balance."""
    return os.environ.get(
        "DPDFNET_TPU_INTER_HOIST", "0") not in ("0", "false", "False")


def _inter_pack() -> bool:
    """Packed-gate inter kernel (DPDFNET_TPU_INTER_PACK, read at trace
    time): fold the per-step ``xp = x@Wi`` and ``hh = h@Wh`` dots into ONE
    ``[x_t | h] @ Wp`` dot with K = C+H = 128 (full MXU depth) and
    N = 4H = 256 columns laid out ``[r_sum | z_sum | xp_n | hh_n]`` —
    r/z only ever use xp+hh summed, so their columns stack both weight
    blocks; the n gate needs the two halves separately (torch's
    linear-before-reset form), so it keeps split columns.

    MXU passes per step drop from 5 (xp 2 + hh 2 + fc 1, the gate dots
    contracting over only K=64 of the MXU's 128 depth) to 3, all at full
    depth.  Cost: a [tile, C+H] staging scratch written per step (same
    pattern the intra kernel uses for its direction concat).

    MEASURED FASTER on v5e and DEFAULT ON: b384 turbo 2154 -> 2269 xRT
    (+5.4% e2e ~= -17% inter-kernel time, consistent with the pass
    count); numerics differ from the two-dot form only by the r/z
    xp+hh accumulation order (~1e-6 f32)."""
    return os.environ.get(
        "DPDFNET_TPU_INTER_PACK", "1") not in ("0", "false", "False")


def _inter_fcfuse() -> bool:
    """Fold the inter fc dot into the packed gate dot
    (DPDFNET_TPU_INTER_FCFUSE, read at trace time; requires the packed
    kernel and TS > 1) — see _inter_block_kernel_packed.  Default set by
    round-4 measurement (tools/inter_step_ablation.py)."""
    return os.environ.get(
        "DPDFNET_TPU_INTER_FCFUSE", "1") not in ("0", "false", "False")


def _inter_defer() -> bool:
    """Defer the inter fc + LayerNorm + residual tail to a vectorised XLA
    pass outside the kernel (DPDFNET_TPU_INTER_DEFER, read at trace time;
    requires the packed kernel and TS > 1 — T==1 exact streaming keeps
    the fused in-kernel tail, so its per-frame op sequence is untouched).

    Round-5 step ablation motivated this (the LN lane reductions are
    ~1.2 µs of the ~3.0 µs inter step while the MXU dots and staging
    hide under the pipeline floor), but the e2e probe REJECTED it
    decisively: **1732 vs 2890 xRT (turbo b384) / 1206 vs 2321 (fast
    b256)** — the lifted tail pays an h-plane HBM round-trip, a
    [T, Fq]-transposed residual re-read of x, and sits serially between
    chained kernels where the in-kernel form overlapped the walk.
    Default OFF; kept for the ledger and future hardware."""
    return os.environ.get(
        "DPDFNET_TPU_INTER_DEFER", "0") not in ("0", "false", "False")


def _pack_inter(wi: Array, bi: Array, wh: Array, bh: Array, dtype):
    """Pack inter-GRU weights for the packed-gate kernel.

    Returns (wp [(C+H), 4H], bp [1, 4H]) with columns
    ``[r: Wi_r over Wh_r | z: Wi_z over Wh_z | n_x: Wi_n over 0 |
    n_h: 0 over Wh_n]`` and biases summed where the columns sum.
    """
    C, H3 = wi.shape
    H = H3 // 3
    wp = jnp.zeros((C + H, 4 * H), dtype)
    wp = wp.at[:C, :2 * H].set(wi[:, :2 * H].astype(dtype))
    wp = wp.at[C:, :2 * H].set(wh[:, :2 * H].astype(dtype))
    wp = wp.at[:C, 2 * H:3 * H].set(wi[:, 2 * H:].astype(dtype))
    wp = wp.at[C:, 3 * H:].set(wh[:, 2 * H:].astype(dtype))
    bp = jnp.concatenate([
        (bi[:2 * H] + bh[:2 * H]), bi[2 * H:], bh[2 * H:]]).astype(dtype)
    return wp, bp.reshape(1, -1)


def _store_inter_out(out_ref, s, v, FM):
    """Store one inter step's [tile, C] output.  FM == 0: time-leading
    ``out_ref[s]``.  FM > 0: the tile is FM whole f-slices of B rows and
    the out block is the freq-leading 4-D ``[FM, TS, B, C]`` — static
    rank-preserving [B, C] window stores hand the NEXT intra stage its
    scan-leading layout for free (see the fm chain in models._dprnn_fused)."""
    if not FM:
        out_ref[s] = v
        return
    Brows = v.shape[0] // FM
    for j in range(FM):
        out_ref[j, s] = v[j * Brows:(j + 1) * Brows]


def _inter_block_kernel_packed(TS: int, H: int, FM: int, fcfuse: bool,
                               defer: bool, h_bm: bool,
                               precision, eps: float,
                               h0_ref, x_ref, wp_ref, bp_ref,
                               wfc_ref, bfc_ref, g_ref, bln_ref,
                               out_ref, hl_ref, h_scr, xh_scr):
    """Packed-gate variant of :func:`_inter_block_kernel` — see
    :func:`_inter_pack`.  Same math, same output, one full-depth gate dot
    per step instead of two half-depth ones.

    ``fcfuse`` (round 4): the fc dot FOLDS into the packed gate dot as C
    extra columns against the h half (wp_ref is [(C+H), 4H + C] with the
    tail columns [0; Wfc]) — each step's dot also emits ``fc(h_{s-1})``
    from the h staged for the gates, written to ``out[s-1]`` one step
    deferred; the cell's last position gets an immediate tail dot after
    the loop.  Removes the separate half-depth fc dot from the per-step
    critical path (effective MXU/step 2C·4H + 2·C·C → 2C·(4H+C), −11%)
    at identical math: s == 0's fc output duplicates the previous cell's
    tail dot and is discarded.

    ``defer`` (round 5): the kernel emits the raw h-sequence and the
    whole fc + LayerNorm + residual tail moves to a vectorised XLA pass
    OUTSIDE the kernel (see dprnn_inter_block) — the round-5 step
    ablation (tools/inter_step_ablation.py) showed the LN lane
    reductions alone are ~1.2 µs of the ~3.0 µs step (the dot and
    staging are free under the pipeline), and unlike the gates the tail
    is NOT part of the recurrence, so it parallelises perfectly once
    lifted out of the serial walk.

    ``h_bm`` (round 5, fm mode only): h0/h_last ride in the STATE's
    batch-major ``[B, Fq, C]`` layout and the kernel permutes them to its
    f-major row order with FM static ``[B, C]`` window extracts at t==0
    (ingest) / the last t (emit) — the same static-store machinery the
    out relayout uses.  Removes the two per-frame XLA transpose copies
    of every block's hidden state from the exact streaming path."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        if h_bm:
            Brows = h_scr.shape[0] // FM
            for j in range(FM):
                h_scr[j * Brows:(j + 1) * Brows] = h0_ref[0, :, j]
        else:
            h_scr[:] = h0_ref[0]

    h = h_scr[:]
    H2 = 2 * H
    H4 = 4 * H

    def _ln_res(y, x):
        mu = jnp.mean(y, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(y - mu), axis=-1, keepdims=True)
        yn = (y - mu) * jax.lax.rsqrt(var + eps)
        yn = yn * g_ref[0:1, :] + bln_ref[0:1, :]
        return (x + yn.astype(h_scr.dtype)).astype(out_ref.dtype)

    x_prev = None
    for s in range(TS):
        x = x_ref[s].astype(h_scr.dtype)
        # lane-staged [x_t | h] (jnp.concatenate of offset-layout vector
        # values is unsupported in Mosaic; stores relayout their value)
        xh_scr[:, :H] = x
        xh_scr[:, H:] = h
        d = _kdot(xh_scr[:], wp_ref[:], precision) + bp_ref[0:1, :]
        if fcfuse and s > 0:
            _store_inter_out(
                out_ref, s - 1,
                _ln_res(d[:, H4:] + bfc_ref[0:1, :], x_prev), FM)
        # one full-lane sigmoid for both gates (r|z are adjacent columns;
        # H == 64 is half a lane register, so separate per-gate calls run
        # the transcendental twice at 50% lane use) — bit-identical math.
        # Measured e2e (round 4): FLAT — offline b384 turbo 2889 vs 2885,
        # thr s256h4 1.215 vs 1.207, exact s128 0.804 vs 0.798 (noise) —
        # the gate VPU work overlaps the MXU pipeline at every shipped
        # shape, confirming _sigmoid's round-2 identity-gate ceiling.
        # Kept: fewer VPU passes at identical math costs nothing.
        rz = _sigmoid(d[:, :H2])
        r = rz[:, :H]
        z = rz[:, H:]
        n = jnp.tanh(d[:, H2:H2 + H] + r * d[:, H2 + H:H4])
        h = ((1.0 - z) * n + z * h).astype(h_scr.dtype)

        if defer:
            _store_inter_out(out_ref, s, h.astype(out_ref.dtype), FM)
        elif not fcfuse:
            y = _kdot(h, wfc_ref[:], precision) + bfc_ref[0:1, :]
            _store_inter_out(out_ref, s, _ln_res(y, x), FM)
        x_prev = x
    if fcfuse and not defer:
        y = _kdot(h, wfc_ref[:], precision) + bfc_ref[0:1, :]
        _store_inter_out(out_ref, TS - 1, _ln_res(y, x_prev), FM)
    h_scr[:] = h
    if h_bm:
        @pl.when(t == pl.num_programs(1) - 1)
        def _():
            Brows = h_scr.shape[0] // FM
            for j in range(FM):
                hl_ref[0, :, j] = h[j * Brows:(j + 1) * Brows]
    else:
        hl_ref[0] = h


_FORCE_DISABLED = contextvars.ContextVar("dpdfnet_force_disabled", default=0)


@contextlib.contextmanager
def force_disabled():
    """Trace-time context that routes model dispatch off the Pallas
    kernels regardless of backend/env — the kernels are inference-only
    (no VJP), so differentiating code (train steps) wraps its trace in
    this to take the XLA scan path.  ContextVar-scoped so a concurrent
    trace in another thread keeps its kernels."""
    token = _FORCE_DISABLED.set(_FORCE_DISABLED.get() + 1)
    try:
        yield
    finally:
        _FORCE_DISABLED.reset(token)


def enabled() -> bool:
    """Use the Pallas kernel? Overridable via DPDFNET_TPU_PALLAS=0/1."""
    if _FORCE_DISABLED.get():
        return False
    env = os.environ.get("DPDFNET_TPU_PALLAS")
    if env is not None:
        return env not in ("0", "false", "False")
    return jax.default_backend() == "tpu"


def v2_enabled(precision: str) -> bool:
    """Use the hoisted-projection v2 DPRNN kernels? (opt-in experiment)

    Both v2 restructurings MEASURED SLOWER e2e than v1 on v5e
    (dpdfnet8_48khz_hr b32 'default': v1 1021 xRT, intra+inter v2 981,
    inter v2 only 988): the intra hoist trades one blockdiag MXU dot for a
    per-step double xp load + gate-column select on the VPU, and the inter
    hoist adds an HBM round-trip for the 3x-wider xp stream.  Kept behind
    DPDFNET_TPU_PALLAS_V2=1 for future hardware where the VPU:MXU balance
    differs; also only sound for the 'fast' tier (bf16 xp storage).
    When enabled, the fused stack takes the inter-v2 path; intra v2 is
    exercised directly by tests/benchmarks only.
    """
    if precision != "default":
        # the v2 path stores the hoisted xp in bf16 — enabling it under
        # the f32-grade 'high'/'highest' tiers would silently break
        # their accuracy contract
        return False
    return v2_requested()


def v2_requested() -> bool:
    """Raw DPDFNET_TPU_PALLAS_V2 env truthiness (no precision gate) —
    used at parameter-pack time, where the run precision is unknown."""
    env = os.environ.get("DPDFNET_TPU_PALLAS_V2")
    return env is not None and env not in ("0", "false", "False")


def plane_io_bf16(precision: str) -> bool:
    """Stream the DPRNN activation planes between kernels as bf16
    (DPDFNET_TPU_PLANE_IO=bf16; read at trace time).

    Only the HBM-facing x/out planes compress — every in-kernel value
    (h carries, gates, fc, LayerNorm) stays f32; loads upcast and stores
    downcast.  Restricted to the 'default' tier: its MXU dots already
    round operands to bf16, so the storage rounding adds error of the
    same order the tier carries anyway; 'high'/'highest' keep f32-grade
    planes by definition.

    MEASURED SLOWER on v5e as a DPRNN-only option (b256 flagship
    'default': 1803 vs 1878 xRT).  Per-kernel profile: the intra kernel
    pays +16% for the (2,1)-packed bf16 dynamic loads in its chunked
    walk, and the inter kernel is compute-bound at b256/TS=8 (161 ms
    either way — the round-1 "DMA-bound ~2x compute" note was a b32
    profile).  Kept env-gated for small-batch/streaming experiments.
    The same kernel capability is what makes the full-bf16 'turbo' tier
    win end-to-end (1481 -> 2062 xRT): there the convs' and transposes'
    halved HBM traffic pays, and the kernels no longer upcast the plane
    in a separate XLA pass per block.
    """
    if precision != "default":
        return False
    return os.environ.get(
        "DPDFNET_TPU_PLANE_IO", "0") not in ("0", "false", "False", "f32", "")


def _pick_tile(N: int, cap: int) -> int:
    """Row tile <= cap minimising padding: split N into ceil(N/cap)
    near-equal chunks rounded up to a sublane multiple (8).

    (The naive ``min(cap, N)`` pads e.g. N=2560 up to 2*2048 = 60% wasted
    rows; this picks 2x1280 instead.)
    """
    n_tiles = -(-N // cap)
    tile = -(-(-(-N // n_tiles)) // 8) * 8
    return max(8, min(cap, tile))


def interpret_default() -> bool:
    """Run kernels in interpreter mode (DPDFNET_TPU_PALLAS_INTERPRET=1).

    Lets the fused model paths execute on CPU for testing; read at trace
    time."""
    return os.environ.get(
        "DPDFNET_TPU_PALLAS_INTERPRET", "0") not in ("0", "false", "False")


def _kernel(TS: int, H: int, reverse: bool, precision,
            h0_ref, x_ref, wi_ref, wh_ref, b_ref, ys_ref, hl_ref, h_scr):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scr[:] = h0_ref[0]

    h = h_scr[:]
    # TS time steps per grid cell (statically unrolled) — amortises the
    # pipeline's per-cell block-DMA bookkeeping over several recurrence steps.
    for s in range(TS):
        idx = (TS - 1 - s) if reverse else s
        xp = _kdot(
            x_ref[idx], wi_ref[:], precision) + b_ref[0:1, :]
        hh = _kdot(
            h, wh_ref[:], precision) + b_ref[1:2, :]
        # full-lane paired gates: one add + one sigmoid over [r|z]'s 2H
        # adjacent columns instead of two half-lane passes each
        rz = _sigmoid(xp[:, :2 * H] + hh[:, :2 * H])
        r = rz[:, :H]
        z = rz[:, H:]
        n = jnp.tanh(xp[:, 2 * H:] + r * hh[:, 2 * H:])
        h = ((1.0 - z) * n + z * h).astype(h_scr.dtype)
        ys_ref[idx] = h
    h_scr[:] = h
    hl_ref[0] = h


def _bidir_kernel(H: int, precision,
                  xf_ref, xb_ref, wi_ref, wh_ref, b_ref,
                  ysf_ref, ysb_ref, h_scr):
    """Both GRU directions in one sequential walk.

    The carry scratch holds [h_fw | h_bw] on the lane axis ([tile, 2H]); the
    weights are direction-blockdiag, gate-major packed (see
    ``_pack_bidir``), so every gate op runs on full 2H=128 lanes and each
    GEMM contracts over K=2I=128 — twice the MXU depth utilisation of two
    separate H=64 walks, in half the sequential cells.
    """
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)

    h = h_scr[:]
    x2 = jnp.concatenate([xf_ref[0], xb_ref[0]], axis=-1)       # [tile, 2I]
    xp = _kdot(
        x2, wi_ref[:], precision) + b_ref[0:1, :]
    hh = _kdot(
        h, wh_ref[:], precision) + b_ref[1:2, :]
    H2 = 2 * H
    r = _sigmoid(xp[:, :H2] + hh[:, :H2])
    z = _sigmoid(xp[:, H2:2 * H2] + hh[:, H2:2 * H2])
    n = jnp.tanh(xp[:, 2 * H2:] + r * hh[:, 2 * H2:])
    h = ((1.0 - z) * n + z * h).astype(h_scr.dtype)
    h_scr[:] = h
    ysf_ref[0] = h[:, :H]
    ysb_ref[0] = h[:, H:]


def _pack_bidir(p_fw: dict, p_bw: dict, dtype):
    """Stack two GRU parameter sets direction-blockdiag, gate-major.

    Returns (wi2 [2I, 6H], wh2 [2H, 6H], b2 [2, 6H]) where the 6H column
    axis is [r_f r_b z_f z_b n_f n_b] and the row axis is [fw-rows | bw-rows]
    with zero cross-direction blocks.
    """
    wi_f, wh_f = p_fw["wi"], p_fw["wh"]
    wi_b, wh_b = p_bw["wi"], p_bw["wh"]
    I, H3 = wi_f.shape
    H = H3 // 3

    def pack(wf, wb):
        rows = wf.shape[0]
        out = jnp.zeros((2 * rows, 6 * H), dtype)
        for g in range(3):                       # r, z, n gate blocks
            out = out.at[:rows, (2 * g) * H:(2 * g + 1) * H].set(
                wf[:, g * H:(g + 1) * H].astype(dtype))
            out = out.at[rows:, (2 * g + 1) * H:(2 * g + 2) * H].set(
                wb[:, g * H:(g + 1) * H].astype(dtype))
        return out

    def packb(bf, bb):
        out = jnp.zeros((6 * H,), dtype)
        for g in range(3):
            out = out.at[(2 * g) * H:(2 * g + 1) * H].set(
                bf[g * H:(g + 1) * H].astype(dtype))
            out = out.at[(2 * g + 1) * H:(2 * g + 2) * H].set(
                bb[g * H:(g + 1) * H].astype(dtype))
        return out

    wi2 = pack(wi_f, wi_b)
    wh2 = pack(wh_f, wh_b)
    b2 = jnp.stack([packb(p_fw["bi"], p_bw["bi"]),
                    packb(p_fw["bh"], p_bw["bh"])])
    return wi2, wh2, b2


@functools.partial(jax.jit, static_argnames=("precision", "interpret"))
def gru_bidir_tm(
    x_tm: Array,
    wi2: Array,
    wh2: Array,
    b2: Array,
    *,
    precision: str = "high",
    interpret: bool = False,
) -> Tuple[Array, Array]:
    """Fused bidirectional GRU over ``x_tm: [T, N, I]`` from zero state.

    Weights must be packed by :func:`_pack_bidir`.  Returns
    (ys_fw [T, N, H], ys_bw [T, N, H]); callers concatenate on the feature
    axis to match ``nn.gru_bidir``.
    """
    T, N, I = x_tm.shape
    H = wh2.shape[0] // 2
    dtype = x_tm.dtype

    tile = _pick_tile(N, _TILE_N)
    n_pad = (-N) % tile
    if n_pad:
        x_tm = jnp.pad(x_tm, ((0, 0), (0, n_pad), (0, 0)))
    Np = N + n_pad
    n_tiles = Np // tile

    fwd = lambda i, t: (t, i, 0)
    bwd = lambda i, t: (T - 1 - t, i, 0)
    kern = functools.partial(_bidir_kernel, H, _PRECISIONS[precision])

    ys_f, ys_b = pl.pallas_call(
        kern,
        grid=(n_tiles, T),
        in_specs=[
            pl.BlockSpec((1, tile, I), fwd, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, I), bwd, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),                # wi2
            pl.BlockSpec(memory_space=pltpu.VMEM),                # wh2
            pl.BlockSpec(memory_space=pltpu.VMEM),                # biases
        ],
        out_specs=[
            pl.BlockSpec((1, tile, H), fwd, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, H), bwd, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, Np, H), dtype),
            jax.ShapeDtypeStruct((T, Np, H), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile, 2 * H), dtype),                     # [h_fw|h_bw]
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_kernel_vmem(),
        ),
        interpret=interpret,
    )(x_tm, x_tm, wi2.astype(dtype), wh2.astype(dtype), b2.astype(dtype))

    if n_pad:
        ys_f = ys_f[:, :N]
        ys_b = ys_b[:, :N]
    return ys_f, ys_b


def _intra_block_kernel(T: int, C: int, hoist: bool, CH: int,
                        fc_chunk: bool, precision, eps: float,
                        x_ref, wi_ref, wh_ref, b_ref,
                        wfc_ref, bfc_ref, g_ref, bln_ref,
                        out_ref, scrf, scrb, x2s, xp_scr):
    """One DPRNN intra pass, fully VMEM-resident per row tile.

    x block is [tile, T, C] in the model's natural row-major layout (rows =
    independent (b, t) frames, T = the frequency axis being scanned).  Both
    GRU directions advance together per step (packed weights as in
    ``_bidir_kernel``); hidden pairs land in the ``scr`` concat buffer, and
    the fc + LayerNorm + residual epilogue runs before anything leaves VMEM.
    HBM traffic: read x once, write the residual output once — the separate
    ys materialisation, concat, fc and LN passes (and their relayout copies)
    all disappear.
    """
    tile = x_ref.shape[0]
    C2 = 2 * C
    # Compute dtype comes from the scratches (f32 when the wrapper streams
    # bf16 planes): bf16 touches only the x loads and out stores, so the
    # bf16 vector-op pitfalls of this Mosaic version (offset-layout
    # concats, lane-slice staging) never see a bf16 value.
    cdt = scrf.dtype
    # Sequence chunk CH (passed by the wrapper — the scratch shapes and
    # the vmem estimate depend on the same value): all dynamic x/out
    # accesses on the (tiled) middle dim happen at provably 8-aligned
    # bases so bf16's (2,1) sublane packing is legal; offsets within a
    # chunk are static.  CH=1 falls back to the per-step form (f32
    # planes only — the wrapper upcasts bf16 inputs when T % 8 != 0).

    # Recurrence via fori_loop over chunks (compact code, reused stack
    # slots — a full static unroll was measured to leak one [tile, 6C]
    # stack slot per iteration and blow the scoped-vmem limit).  The
    # hidden-pair history lands in the time-leading scratches; dynamic
    # stores are supported on the leading dim for any dtype.
    def chunk(ci, h):
        base = pl.multiple_of(ci * CH, CH)
        rbase = pl.multiple_of(T - CH - ci * CH, CH)
        xf_c = x_ref[:, pl.ds(base, CH), :].astype(cdt)       # [tile, CH, C]
        xb_c = x_ref[:, pl.ds(rbase, CH), :].astype(cdt)
        if hoist:
            # v3: stage the whole chunk's x2 rows, then ONE [CH*tile, 2C]
            # x-projection GEMM off the recurrence's critical path (8x the
            # M of the per-step dots; the sequential loop keeps only the
            # hh dot + gate VPU work).
            for k in range(CH):
                x2s[k * tile:(k + 1) * tile, :C] = xf_c[:, k, :]
                x2s[k * tile:(k + 1) * tile, C:] = xb_c[:, CH - 1 - k, :]
            xp_scr[:] = _kdot(
                x2s[:], wi_ref[:], precision) + b_ref[0:1, :]
        for k in range(CH):
            if hoist:
                xp = xp_scr[k * tile:(k + 1) * tile]
            else:
                # Stage the two chunk slices through a tiny scratch instead
                # of jnp.concatenate: concat of offset-layout vector slices
                # is "offset mismatch on non-concat dimension" in Mosaic;
                # stores relayout their value, so the read-back is a clean
                # [tile, 2C].
                x2s[:, :C] = xf_c[:, k, :]
                x2s[:, C:] = xb_c[:, CH - 1 - k, :]
                xp = _kdot(
                    x2s[:], wi_ref[:], precision) + b_ref[0:1, :]
            hh = _kdot(
                h, wh_ref[:], precision) + b_ref[1:2, :]
            r = _sigmoid(xp[:, :C2] + hh[:, :C2])
            z = _sigmoid(xp[:, C2:2 * C2] + hh[:, C2:2 * C2])
            n = jnp.tanh(xp[:, 2 * C2:] + r * hh[:, 2 * C2:])
            h = ((1.0 - z) * n + z * h).astype(cdt)
            # leading-dim dynamic stores are legal for any dtype.  Slice
            # the 2-D carry BEFORE expanding dims: a lane slice of a 3-D
            # value lowers as an (unsupported) gather inside the loop.
            hf = h[:, :C]
            hb = h[:, C:]
            scrf[pl.ds(base + k, 1)] = hf[None]
            scrb[pl.ds(rbase + (CH - 1 - k), 1)] = hb[None]
        return h

    jax.lax.fori_loop(0, T // CH, chunk, jnp.zeros((tile, C2), cdt))

    # Epilogue per chunk of (static) time steps so live temporaries stay
    # ~[tile, CH, C] (a single whole-buffer fc was measured to blow the
    # scoped-vmem stack): fc over the concat [ys_fw | ys_bw] as two
    # half-dots, LayerNorm, residual with the x block still resident.
    for c0 in range(0, T, CH):
        x_c = x_ref[:, pl.ds(c0, CH), :].astype(cdt)          # [tile, CH, C]
        if fc_chunk and CH > 1:
            # Batch the chunk's fc into ONE dot pair of M = CH*tile rows
            # (the per-step form issues 2 tiny K=C dots per time step —
            # 2T MXU passes for the whole epilogue vs 2T/CH here; the
            # scratches are already time-leading, so the chunk rows merge
            # for free).  LN is per-row, so it batches unchanged.
            yf = scrf[c0:c0 + CH].reshape(CH * tile, C)
            yb = scrb[c0:c0 + CH].reshape(CH * tile, C)
            y = _kdot(yf, wfc_ref[:C], precision) + _kdot(
                yb, wfc_ref[C:], precision) + bfc_ref[0:1, :]
            mu = jnp.mean(y, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(y - mu), axis=-1, keepdims=True)
            yn = (y - mu) * jax.lax.rsqrt(var + eps)
            yn = (yn * g_ref[0:1, :] + bln_ref[0:1, :]).astype(cdt)
            for k in range(CH):
                out_ref[:, c0 + k, :] = (
                    x_c[:, k, :] + yn[k * tile:(k + 1) * tile]
                ).astype(out_ref.dtype)
        else:
            for k in range(CH):
                y = _kdot(
                    scrf[c0 + k], wfc_ref[:C], precision) + _kdot(
                    scrb[c0 + k], wfc_ref[C:], precision) + bfc_ref[0:1, :]
                mu = jnp.mean(y, axis=-1, keepdims=True)
                var = jnp.mean(jnp.square(y - mu), axis=-1, keepdims=True)
                yn = (y - mu) * jax.lax.rsqrt(var + eps)
                yn = (yn * g_ref[0:1, :] + bln_ref[0:1, :]).astype(cdt)
                out_ref[:, c0 + k, :] = (
                    x_c[:, k, :] + yn).astype(out_ref.dtype)


def _intra_tile(default: int | None = None) -> int:
    """Row tile of the intra kernel (override: DPDFNET_TPU_INTRA_TILE).

    The built-in default is dtype-dependent (see dprnn_intra_block):
    256 for f32 planes, 512 for bf16 planes — bf16 halves the pipeline's
    x/out block buffers, and the larger tile then wins (b384 turbo:
    2156 vs 2107 xRT; 768 regresses to 2076, 1024 exceeds 100M scoped
    vmem)."""
    return int(os.environ.get(
        "DPDFNET_TPU_INTRA_TILE", str(_INTRA_TILE if default is None
                                      else default)))


def _intra_fc_chunk() -> bool:
    """Chunk-batched fc epilogue in the intra kernel
    (DPDFNET_TPU_INTRA_FCCHUNK, read at trace time): one [CH*tile, C] dot
    pair per 8-step chunk instead of two tiny K=C dots per time step —
    the epilogue's MXU instruction count drops 8x and each dot's M rows
    amortise the per-dot fixed cost.  Unlike the rejected hoist variants
    this adds NO staging traffic: the ys scratches are already
    time-leading, so the chunk rows merge as a free reshape.

    MEASURED A WASH on v5e (b384 turbo: 2141 vs 2154 alone; 2253 vs 2269
    stacked on the packed inter kernel) — the per-step epilogue dots
    were already overlapped with the walk, and the batched form's
    [CH*tile, C] temporaries add stack pressure.  Default OFF.

    RE-MEASURED round 4 on the freq-leading tm walk (the staging
    economics changed with the restructure, so the round-2 verdict did
    not transfer automatically): b384 turbo 2741.75 vs 2741.53 — an
    exact wash there too.  The ~780 ns/step between the tm walk and its
    structural floor (tools/intra_step_ablation.py) is NOT recoverable
    by batching the fc dots; the epilogue is already fully overlapped."""
    return os.environ.get(
        "DPDFNET_TPU_INTRA_FCCHUNK", "0") not in ("0", "false", "False")


def _intra_hoist() -> bool:
    """Chunk-hoisted x projection in the intra kernel (v3 experiment,
    DPDFNET_TPU_INTRA_HOIST=1): one [CH*tile, 2C] GEMM per chunk off the
    recurrence's critical path instead of a per-step dot.

    MEASURED SLOWER e2e on v5e (b256 'default': 1606 vs 1652 xRT) — the
    chunk staging stores + xp scratch round-trip cost more than the
    batched GEMM saves, i.e. the kernel is bound by the per-step VPU gate
    math (sigmoid/tanh on [tile, 6C]), not by MXU dot latency.  Same
    conclusion as the v2 whole-sequence hoist.  Kept for future hardware
    with a different VPU:MXU balance."""
    return os.environ.get(
        "DPDFNET_TPU_INTRA_HOIST", "0") not in ("0", "false", "False")


# Measured on v5e (dpdfnet8_48khz_hr b32 'default', inter TS=4/8):
# tile 64 -> 893, 128 -> 1046, 256 -> 1156, 384 -> 926 (!), 512 -> 1156 xRT.
# 256 is the sweet spot that still fits the stock 40M scoped-vmem limit
# (384 needs 54M and measures anomalously slow; 512 needs 72M for parity
# with 256 — not worth the limit raise).
_INTRA_TILE = 256


@functools.partial(
    jax.jit, static_argnames=(
        "precision", "interpret", "tile", "hoist", "fc_chunk"))
def dprnn_intra_block(
    x: Array,
    wi2: Array,
    wh2: Array,
    b2: Array,
    wfc: Array,
    bfc: Array,
    g: Array,
    bln: Array,
    *,
    precision: str = "high",
    interpret: bool = False,
    tile: int | None = None,
    hoist: bool | None = None,
    fc_chunk: bool | None = None,
) -> Array:
    """Fused DPRNN intra stage: ``x + LN(FC(bidirGRU(x)))``.

    x: [N, T, C] (N independent rows, recurrence along T).  Weights: packed
    bidir GRU (``_pack_bidir``), fc ``[2C, C]``/``[C]``, LayerNorm gain/bias
    ``[C]``.  Matches ``nn.gru_bidir`` + ``nn.linear`` + ``nn.layer_norm``
    + residual as used by ``models.dpdfnet._dprnn_block``.
    """
    N, T, C = x.shape
    if x.dtype == jnp.bfloat16 and not interpret and T % 8 != 0:
        # bf16 planes need the 8-aligned chunked walk (the (2,1) sublane
        # packing makes unaligned dynamic slices illegal); T % 8 != 0
        # falls back to f32 planes.  All shipped configs have Fq % 8 == 0.
        return dprnn_intra_block(
            x.astype(jnp.float32), wi2, wh2, b2, wfc, bfc, g, bln,
            precision=precision, interpret=interpret,
            tile=tile, hoist=hoist, fc_chunk=fc_chunk).astype(x.dtype)
    # bf16 input streams the x/out planes compressed (half the kernel's
    # HBM traffic) while ALL in-kernel values stay f32: loads upcast,
    # stores downcast (see plane_io_bf16).  The earlier all-bf16 in-kernel
    # attempt hit Mosaic miscompiles (offset-layout concats, lane-slice
    # staging "unsupported shape cast") — those ops never see bf16 here.
    dtype = x.dtype
    cdt = jnp.float32 if dtype == jnp.bfloat16 else dtype

    # NB: None means "read the env knob at trace time" — pass explicit
    # values to make the choice part of the jit cache key (an env change
    # after a shape is traced is otherwise ignored for that shape).
    if tile is None:
        default = None
        if dtype == jnp.bfloat16:
            # tile 512 needs ~64M scoped vmem; when an EXPLICIT
            # DPDFNET_TPU_KERNEL_VMEM caps below that (self-sizing is
            # then disabled — see _sized_vmem), degrade to the f32
            # default instead of hard-failing the compile.
            explicit = os.environ.get("DPDFNET_TPU_KERNEL_VMEM")
            if explicit is None or _kernel_vmem() >= 64 * 1024 * 1024:
                default = 512
        tile = _intra_tile(default)
    tile = _pick_tile(N, tile)
    n_pad = (-N) % tile
    if n_pad:
        x = jnp.pad(x, ((0, n_pad), (0, 0), (0, 0)))
    Np = N + n_pad

    hoist = _intra_hoist() if hoist is None else hoist
    CH = 8 if T % 8 == 0 else 1
    fc_chunk = _intra_fc_chunk() if fc_chunk is None else fc_chunk
    kern = functools.partial(
        _intra_block_kernel, T, C, hoist and CH > 1, CH, fc_chunk,
        _PRECISIONS[precision], 1e-5)
    # Scoped-vmem self-sizing: the x/out pipeline blocks and the ys
    # scratches scale with the tile, so large tiles (or f32 planes at
    # tile 512) exceed the 48M global default; size from the buffer sum
    # + 35% Mosaic slack, never below the global knob.  (Measured: bf16
    # tile 512 wants 48.26M under a 64M cap but 57.25M under a 55.77M
    # cap — Mosaic's stack sizing grows with the headroom it is given,
    # so a thin margin chases itself; 1.35x lands in the measured-good
    # 64M region.  f32 tile 512 -> 72M; f32 tile 256 fits 48M.)
    lanes = max(C, 128)                  # C < 128 pads to the lane tile
    l2c = -(-2 * C // 128) * 128         # padded widths of the staging
    l6c = -(-6 * C // 128) * 128         # scratches (cf. inter xp_lanes)
    isz = 2 if dtype == jnp.bfloat16 else 4
    est = (4 * tile * T * lanes * isz            # x + out, 2 bufs each
           + 2 * T * tile * lanes * 4            # ys_fw / ys_bw
           + (CH if hoist and CH > 1 else 1) * tile * l2c * 4
           + (CH * tile * l6c * 4 if hoist and CH > 1 else 0)
           + (2 * CH * tile * lanes * 4 if fc_chunk and CH > 1 else 0))
    vmem = _sized_vmem(est, 1.35)

    out = pl.pallas_call(
        kern,
        grid=(Np // tile,),
        in_specs=[
            pl.BlockSpec((tile, T, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),                # x
            pl.BlockSpec(memory_space=pltpu.VMEM),                # wi2
            pl.BlockSpec(memory_space=pltpu.VMEM),                # wh2
            pl.BlockSpec(memory_space=pltpu.VMEM),                # b2
            pl.BlockSpec(memory_space=pltpu.VMEM),                # wfc
            pl.BlockSpec(memory_space=pltpu.VMEM),                # bfc
            pl.BlockSpec(memory_space=pltpu.VMEM),                # ln gain
            pl.BlockSpec(memory_space=pltpu.VMEM),                # ln bias
        ],
        out_specs=pl.BlockSpec((tile, T, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Np, T, C), dtype),
        scratch_shapes=[
            pltpu.VMEM((T, tile, C), cdt),                        # ys_fw
            pltpu.VMEM((T, tile, C), cdt),                        # ys_bw
            # x2 staging: whole chunk when hoisting, one step otherwise
            pltpu.VMEM(((CH if hoist and CH > 1 else 1) * tile, 2 * C),
                       cdt),
            # hoisted x-projection chunk (f32 accumulators); minimal when
            # unused
            pltpu.VMEM(((CH * tile, 6 * C) if hoist and CH > 1 else (8, 128)),
                       jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=vmem,
        ),
        interpret=interpret,
    )(x, wi2.astype(cdt), wh2.astype(cdt), b2.astype(cdt),
      wfc.astype(cdt), bfc.reshape(1, -1).astype(cdt),
      g.reshape(1, -1).astype(cdt), bln.reshape(1, -1).astype(cdt))

    return out[:N] if n_pad else out


def _intra_block_kernel_tm(T: int, C: int, CH: int, FM: int, fc_chunk: bool,
                           static_walk: bool,
                           precision, eps: float,
                           x_ref, wi_ref, wh_ref, b_ref,
                           wfc_ref, bfc_ref, g_ref, bln_ref,
                           out_ref, scrf, scrb, x2s):
    """Freq-LEADING variant of ``_intra_block_kernel``.

    x block is ``[T, tile, C]`` with the scanned (frequency) axis leading,
    so every per-step chunk load is a clean leading-dim slice — the
    row-major form's ``[:, k, :]`` mid-dim sublane extract was measured
    (tools/intra_step_ablation.py, round 3) to be ~55% of its step cost
    (full 4031 vs tm_full 3458 ns/step; dots ~480, gates ~0).  The
    epilogue WRITES the row-major plane the inter stage consumes (free
    reshape to ``[T_time, B*Fq, C]``) through a 2-D ``[tile, T*C]`` out
    block: stores relayout their value for free and lane-slice stores
    are rank-preserving (the 3-D ``[tile, 1, C]`` mid-dim form is an
    unsupported bf16 shape cast), so emitting the consumer's layout
    costs nothing — only the producer side of the block boundary (an
    XLA transpose feeding this kernel) remains.
    """
    tile = x_ref.shape[1]
    C2 = 2 * C
    cdt = scrf.dtype

    if static_walk:
        # Fully static unrolled walk (round 4): a python loop over all T
        # steps with per-step STATIC leading-dim loads ``x_ref[t]`` — no
        # [CH, tile, C] chunk temporaries (those spill ~2*CH*tile*C/2048
        # vregs per chunk and every per-step slice becomes a refill) and
        # no fori_loop.  Measured -6% kernel step time vs the chunked
        # fori walk at the shipped shapes (tm_allstatic 1578 vs tm_full
        # 1679 ns/step raw at 240 reps, tools/intra_step_ablation.py);
        # this also mirrors the inter kernel's (static TS-block)
        # structure.  Static leading-dim indexing is legal for bf16 at
        # ANY t, so this form has no T % 8 constraint of its own.
        h = jnp.zeros((tile, C2), cdt)
        for t in range(T):
            x2s[:, :C] = x_ref[t].astype(cdt)
            x2s[:, C:] = x_ref[T - 1 - t].astype(cdt)
            xp = _kdot(x2s[:], wi_ref[:], precision) + b_ref[0:1, :]
            hh = _kdot(h, wh_ref[:], precision) + b_ref[1:2, :]
            r = _sigmoid(xp[:, :C2] + hh[:, :C2])
            z = _sigmoid(xp[:, C2:2 * C2] + hh[:, C2:2 * C2])
            n = jnp.tanh(xp[:, 2 * C2:] + r * hh[:, 2 * C2:])
            h = ((1.0 - z) * n + z * h).astype(cdt)
            scrf[t] = h[:, :C]
            scrb[T - 1 - t] = h[:, C:]
    else:
        def chunk(ci, h):
            base = pl.multiple_of(ci * CH, CH)
            rbase = pl.multiple_of(T - CH - ci * CH, CH)
            xf_c = x_ref[pl.ds(base, CH)].astype(cdt)      # [CH, tile, C]
            xb_c = x_ref[pl.ds(rbase, CH)].astype(cdt)
            for k in range(CH):
                # stage the lane concat [xf | xb] as in the row-major
                # kernel (offset-layout concats are unsupported; tm_prex2
                # proved an XLA-prebuilt 2C input is slower than this
                # store)
                x2s[:, :C] = xf_c[k]
                x2s[:, C:] = xb_c[CH - 1 - k]
                xp = _kdot(x2s[:], wi_ref[:], precision) + b_ref[0:1, :]
                hh = _kdot(h, wh_ref[:], precision) + b_ref[1:2, :]
                r = _sigmoid(xp[:, :C2] + hh[:, :C2])
                z = _sigmoid(xp[:, C2:2 * C2] + hh[:, C2:2 * C2])
                n = jnp.tanh(xp[:, 2 * C2:] + r * hh[:, 2 * C2:])
                h = ((1.0 - z) * n + z * h).astype(cdt)
                hf = h[:, :C]
                hb = h[:, C:]
                scrf[pl.ds(base + k, 1)] = hf[None]
                scrb[pl.ds(rbase + (CH - 1 - k), 1)] = hb[None]
            return h

        jax.lax.fori_loop(0, T // CH, chunk, jnp.zeros((tile, C2), cdt))

    # Epilogue: fc + LayerNorm + residual, x reloaded with clean leading
    # slices.  The out block is the row-major plane viewed as 2-D
    # [tile, T*C]: a per-step [tile, C] value then stores as a LANE slice
    # (no rank change — the 3-D [tile, 1, C] form is an unsupported bf16
    # shape cast in this Mosaic version).  Adjacent steps pair up through
    # the [tile, 2C] staging scratch so every store writes a full
    # 128-lane tile when C == 64.
    pair = CH % 2 == 0
    Brows = tile // FM if FM else 0
    for c0 in range(0, T, CH):
        if static_walk:
            # per-step static loads (no spilled [CH, tile, C] chunk value)
            def _xres(j):
                return x_ref[j].astype(cdt)
        else:
            x_c = x_ref[pl.ds(c0, CH)].astype(cdt)         # [CH, tile, C]

            def _xres(j, _x_c=x_c, _c0=c0):
                return _x_c[j - _c0]

        if fc_chunk and CH > 1:
            # Chunk-batched fc (round-4 probe on the tm walk — the round-2
            # wash verdict was measured on the row-major walk): ONE dot
            # pair of M = CH*tile rows per chunk; the scratches are
            # time-leading so the chunk rows merge as a free reshape.
            yf = scrf[c0:c0 + CH].reshape(CH * tile, C)
            yb = scrb[c0:c0 + CH].reshape(CH * tile, C)
            yc = _kdot(yf, wfc_ref[:C], precision) + _kdot(
                yb, wfc_ref[C:], precision) + bfc_ref[0:1, :]
            mu = jnp.mean(yc, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(yc - mu), axis=-1, keepdims=True)
            ync = (yc - mu) * jax.lax.rsqrt(var + eps)
            ync = (ync * g_ref[0:1, :] + bln_ref[0:1, :]).astype(cdt)

            def _res(j):
                k = j - c0
                return _xres(j) + ync[k * tile:(k + 1) * tile]
        else:
            def _res(j):
                y = _kdot(
                    scrf[j], wfc_ref[:C], precision) + _kdot(
                    scrb[j], wfc_ref[C:], precision) + bfc_ref[0:1, :]
                mu = jnp.mean(y, axis=-1, keepdims=True)
                var = jnp.mean(jnp.square(y - mu), axis=-1, keepdims=True)
                yn = (y - mu) * jax.lax.rsqrt(var + eps)
                yn = yn * g_ref[0:1, :] + bln_ref[0:1, :]
                return _xres(j) + yn.astype(cdt)

        if FM:
            # f-major 4-D out block [FM, T, B, C]: the tile's rows are FM
            # whole time-frames of B batch rows each, so the store targets
            # are static rank-preserving [B, C] windows — this hands the
            # NEXT stage (inter, f-major rows) its layout for free.
            for k in range(CH):
                v = _res(c0 + k)
                for j in range(FM):
                    out_ref[j, c0 + k] = (
                        v[j * Brows:(j + 1) * Brows].astype(out_ref.dtype))
            continue
        for k in range(0, CH, 2 if pair else 1):
            if pair:
                x2s[:, :C] = _res(c0 + k)
                x2s[:, C:] = _res(c0 + k + 1)
                out_ref[:, (c0 + k) * C:(c0 + k + 2) * C] = (
                    x2s[:].astype(out_ref.dtype))
            else:
                out_ref[:, (c0 + k) * C:(c0 + k + 1) * C] = (
                    _res(c0 + k).astype(out_ref.dtype))


def intra_tm_enabled() -> bool:
    """Transpose-free freq-chained DPRNN stack (DPDFNET_TPU_INTRA_TM,
    read at trace time; default ON).

    The intra kernel walks a scan-leading [Fq, T*B, C] plane (clean
    leading-dim loads — the row-major walk's mid-dim sublane extracts
    were ~55% of its step cost, tools/intra_step_ablation.py) and its
    epilogue writes the f-major 4-D plane the inter stage reshapes for
    free; the inter kernel writes the freq-leading plane the next intra
    wants.  All relayout work rides static in-kernel stores (~free);
    the big plane is transposed only once in and once out of the stack.

    MEASURED on v5e b384 turbo: 2743 xRT vs 2265 for the row-major
    kernels (+21%).  The intermediate step — freq-leading intra alone
    with an XLA transpose per block — measured 2143: the kernels saved
    23% of their time but the [T,B,Fq,C]->[Fq,T*B,C] XLA transpose runs
    ~6x over bandwidth (~3.9 ms per 264 MB plane), which is why the
    layout cycle must close inside the kernels.  Engages when
    Fq % 8 == 0 and B % 8 == 0 (all shipped configs; engine buckets
    pad batches to multiples of 8); falls back to the row-major kernels
    otherwise."""
    return os.environ.get(
        "DPDFNET_TPU_INTRA_TM", "1") not in ("0", "false", "False")


def _intra_static() -> bool:
    """Fully static unrolled tm walk (DPDFNET_TPU_INTRA_STATIC, read at
    trace time; default ON **for k <= 1 tiles only** — see the k gate in
    dprnn_intra_block_tm): python-unrolled per-step static leading-dim
    loads instead of the CH-chunked fori_loop walk.  The [CH, tile, C]
    chunk temporaries spill to VMEM (~512 f32 vregs each at tile 512)
    and every per-step slice becomes a refill; the static form lets
    Mosaic schedule each step's single [tile, C] load directly.
    MEASURED: tm_allstatic 1578 vs tm_full 1679 ns/step raw (-6%, 240
    reps, tile 512 T 48 bf16; floors are identical — the win is all in
    the math path's load scheduling).  NB the round-2/3 ablation
    magnitudes carried a ~23 ms/call relay-dispatch bias at --reps 30
    (~2.3 us/step); rankings held but absolute numbers from those rounds
    are wrong — see tools/intra_step_ablation.py."""
    return os.environ.get(
        "DPDFNET_TPU_INTRA_STATIC", "1") not in ("0", "false", "False")


@functools.partial(
    jax.jit, static_argnames=("precision", "interpret", "tile", "fm_batch",
                              "fc_chunk", "static_walk"))
def dprnn_intra_block_tm(
    x_fm: Array,
    wi2: Array,
    wh2: Array,
    b2: Array,
    wfc: Array,
    bfc: Array,
    g: Array,
    bln: Array,
    *,
    precision: str = "high",
    interpret: bool = False,
    tile: int | None = None,
    fm_batch: int | None = None,
    fc_chunk: bool | None = None,
    static_walk: bool | None = None,
) -> Array:
    """Fused DPRNN intra stage on a freq-leading plane.

    Same math as ``dprnn_intra_block`` (``x + LN(FC(bidirGRU(x)))``) but
    consumes ``x_fm: [T, N, C]`` with the scanned axis LEADING and
    returns the row-major ``[N, T, C]`` the inter stage wants.  See
    ``_intra_block_kernel_tm`` for why the layouts are asymmetric.

    ``fm_batch=B`` (requires ``N = T_time * B`` with t-major rows)
    instead returns the f-major 4-D plane ``[T_time, T, B, C]`` whose
    ``[T_time, T*B, C]`` reshape is the f-major-rows inter input — the
    layout handoff of the transpose-free DPRNN chain.  The row tile
    becomes a whole number of time-frames (``k*B``), so the epilogue's
    stores stay static [B, C] windows.

    Caveats for direct callers (the model path gates these away):
    - fm mode emits ``T * round(tile/fm_batch)`` Python-unrolled stores
      per Mosaic program, so a small ``fm_batch`` (< 32) inflates program
      size and remote-compile time; prefer ``dprnn_intra_block`` there
      (``models.dpdfnet._dprnn_fused`` floors the chain at B >= 32).
    - the non-fm f32 path with ``T % 8 != 0`` (CH == 1) stores odd
      64-lane slices — a Mosaic lowering pattern validated in interpret
      mode only (every shipped config has T % 8 == 0 on hardware); keep
      T a multiple of 8 for hardware use.
    """
    T, N, C = x_fm.shape
    if x_fm.dtype == jnp.bfloat16 and not interpret and T % 8 != 0:
        # keep the same 8-aligned-chunk constraint as the row-major
        # kernel: the epilogue's static mid-dim bf16 stores want the
        # (2, 1) sublane packing's alignment guarantees
        return dprnn_intra_block_tm(
            x_fm.astype(jnp.float32), wi2, wh2, b2, wfc, bfc, g, bln,
            precision=precision, interpret=interpret,
            tile=tile, fm_batch=fm_batch, fc_chunk=fc_chunk,
            static_walk=static_walk,
        ).astype(x_fm.dtype)
    dtype = x_fm.dtype
    cdt = jnp.float32 if dtype == jnp.bfloat16 else dtype

    if tile is None:
        default = None
        if dtype == jnp.bfloat16:
            explicit = os.environ.get("DPDFNET_TPU_KERNEL_VMEM")
            if explicit is None or _kernel_vmem() >= 64 * 1024 * 1024:
                default = 512
        tile = _intra_tile(default)
    if fm_batch:
        B = fm_batch
        Tt = N // B
        if N != Tt * B:
            raise ValueError(f"fm_batch={B} does not divide N={N}")
        # whole time-frames per tile, nearest to the tuned row tile
        k = max(1, min(Tt, round(tile / B) or 1))
        while Tt % k:
            k -= 1
        tile = k * B
        n_pad = 0
        Np = N
    else:
        k = 0
        tile = _pick_tile(N, tile)
        n_pad = (-N) % tile
        if n_pad:
            x_fm = jnp.pad(x_fm, ((0, 0), (0, n_pad), (0, 0)))
        Np = N + n_pad

    CH = 8 if T % 8 == 0 else 1
    fc_chunk = _intra_fc_chunk() if fc_chunk is None else fc_chunk
    if static_walk is None:
        # k gate (round 4, measured on v5e streaming points): the static
        # walk wins only at k <= 1 (one time-frame per tile — offline
        # b384 2855 vs 2743, exact s128 0.802 vs 0.848 ms/hop, thr
        # s512h8 2.051 vs 2.102); at k > 1 it LOSES (thr s256h4 k=2:
        # 1.279 vs 1.215; thr s128h4 k=4: 0.678 vs 0.667) — the k>1
        # epilogue's FM sub-stores per step interleave badly with the
        # static form's per-step reloads.  The chunked fori walk stays
        # the default there.
        static_walk = _intra_static() and k <= 1
    kern = functools.partial(
        _intra_block_kernel_tm, T, C, CH, k, fc_chunk and CH > 1,
        static_walk, _PRECISIONS[precision], 1e-5)
    lanes = max(C, 128)
    l2c = -(-2 * C // 128) * 128
    isz = 2 if dtype == jnp.bfloat16 else 4
    est = (4 * tile * T * lanes * isz            # x + out, 2 bufs each
           + 2 * T * tile * lanes * 4            # ys_fw / ys_bw
           + tile * l2c * 4                      # x2 staging
           + (2 * CH * tile * lanes * 4 if fc_chunk and CH > 1 else 0))
    vmem = _sized_vmem(est, 1.35)

    out = pl.pallas_call(
        kern,
        grid=(Np // tile,),
        in_specs=[
            pl.BlockSpec((T, tile, C), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),                # x (fm)
            pl.BlockSpec(memory_space=pltpu.VMEM),                # wi2
            pl.BlockSpec(memory_space=pltpu.VMEM),                # wh2
            pl.BlockSpec(memory_space=pltpu.VMEM),                # b2
            pl.BlockSpec(memory_space=pltpu.VMEM),                # wfc
            pl.BlockSpec(memory_space=pltpu.VMEM),                # bfc
            pl.BlockSpec(memory_space=pltpu.VMEM),                # ln gain
            pl.BlockSpec(memory_space=pltpu.VMEM),                # ln bias
        ],
        # 2-D [N, T*C] out: same bytes as the row-major [N, T, C] plane
        # (the caller reshape is free); the flat lane axis is what lets
        # the kernel's per-step stores stay rank-preserving (see kernel).
        # fm mode: the f-major 4-D plane, one cell = k whole time-frames.
        out_specs=(pl.BlockSpec((k, T, fm_batch, C),
                                lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM)
                   if fm_batch else
                   pl.BlockSpec((tile, T * C), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((Np // fm_batch, T, fm_batch, C),
                                        dtype)
                   if fm_batch else
                   jax.ShapeDtypeStruct((Np, T * C), dtype)),
        scratch_shapes=[
            pltpu.VMEM((T, tile, C), cdt),                        # ys_fw
            pltpu.VMEM((T, tile, C), cdt),                        # ys_bw
            pltpu.VMEM((tile, 2 * C), cdt),                       # x2 staging
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=vmem,
        ),
        interpret=interpret,
    )(x_fm, wi2.astype(cdt), wh2.astype(cdt), b2.astype(cdt),
      wfc.astype(cdt), bfc.reshape(1, -1).astype(cdt),
      g.reshape(1, -1).astype(cdt), bln.reshape(1, -1).astype(cdt))

    if fm_batch:
        return out                                         # [Tt, T, B, C]
    out = out.reshape(Np, T, C)
    return out[:N] if n_pad else out


def _inter_block_kernel(TS: int, H: int, hoist: bool, FM: int, precision,
                        eps: float,
                        h0_ref, x_ref, wi_ref, wh_ref, b_ref,
                        wfc_ref, bfc_ref, g_ref, bln_ref,
                        out_ref, hl_ref, h_scr, xp_scr):
    """``TS`` DPRNN inter steps per grid cell with the epilogue fused:
    ``out[t] = x[t] + LN(FC(h_t))``.  Unlike the intra stage the GRU is
    unidirectional, so the epilogue applies as soon as ``h_t`` exists and
    the hidden sequence never touches HBM.  TS > 1 amortises the
    pipeline's per-cell bookkeeping over several recurrence steps (the
    inter rows are B*Fq ~ 1-3k, so even TS=8 blocks stay far below the
    scoped-vmem budget).

    ``hoist``: compute the input projection for the whole TS block as ONE
    [TS*tile, H] GEMM into scratch before the walk, so the sequential
    loop runs only the K=H hh dot per step.  Unlike the rejected v2
    variant this never round-trips xp through HBM, and unlike the intra
    v3 hoist there is no staging: the x block is already contiguous."""
    t = pl.program_id(1)
    tile = h_scr.shape[0]

    @pl.when(t == 0)
    def _():
        h_scr[:] = h0_ref[0]

    h = h_scr[:]
    if hoist:
        xall = x_ref[:].reshape(TS * tile, H).astype(h_scr.dtype)
        xp_scr[:] = _kdot(xall, wi_ref[:], precision) + b_ref[0:1, :]
    for s in range(TS):
        # loads upcast / stores downcast when the wrapper streams bf16
        # planes (plane_io_bf16); every in-kernel value is h_scr.dtype.
        x = x_ref[s].astype(h_scr.dtype)
        if hoist:
            xp = xp_scr[s * tile:(s + 1) * tile]
        else:
            xp = _kdot(
                x, wi_ref[:], precision) + b_ref[0:1, :]
        hh = _kdot(
            h, wh_ref[:], precision) + b_ref[1:2, :]
        # full-lane paired gates: one add + one sigmoid over [r|z]'s 2H
        # adjacent columns instead of two half-lane passes each
        rz = _sigmoid(xp[:, :2 * H] + hh[:, :2 * H])
        r = rz[:, :H]
        z = rz[:, H:]
        n = jnp.tanh(xp[:, 2 * H:] + r * hh[:, 2 * H:])
        h = ((1.0 - z) * n + z * h).astype(h_scr.dtype)

        y = _kdot(
            h, wfc_ref[:], precision) + bfc_ref[0:1, :]
        mu = jnp.mean(y, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(y - mu), axis=-1, keepdims=True)
        yn = (y - mu) * jax.lax.rsqrt(var + eps)
        yn = yn * g_ref[0:1, :] + bln_ref[0:1, :]
        _store_inter_out(out_ref, s,
                         (x + yn.astype(h_scr.dtype)).astype(out_ref.dtype),
                         FM)
    h_scr[:] = h
    hl_ref[0] = h


@functools.partial(jax.jit,
                   static_argnames=("precision", "interpret", "ts", "pack",
                                    "fm_batch", "fcfuse", "h_bm"))
def dprnn_inter_block(
    x_tm: Array,
    h0: Array,
    wi: Array,
    bi: Array,
    wh: Array,
    bh: Array,
    wfc: Array,
    bfc: Array,
    g: Array,
    bln: Array,
    *,
    precision: str = "high",
    interpret: bool = False,
    ts: int | None = None,
    pack: bool | None = None,
    fm_batch: int | None = None,
    fcfuse: bool | None = None,
    h_bm: bool = False,
) -> Tuple[Array, Array]:
    """Fused DPRNN inter stage over time-major ``x_tm: [T, N, C]``.

    ``h_bm=True`` (requires ``fm_batch``): ``h0`` arrives and ``h_last``
    returns in the state's batch-major ``[B, Fq, C]`` layout; the packed
    kernel permutes to/from its f-major row order with static in-VMEM
    window extracts (see ``_inter_block_kernel_packed``), removing the
    two per-call XLA transpose copies of the hidden.  Falls back to an
    explicit transpose when the packed kernel is disabled.

    Returns (out_tm [T, N, C], h_last [N, C]) where
    ``out[t] = x[t] + LN(FC(GRUstep(h, x[t])))`` — matching
    ``nn.gru_seq`` + ``nn.linear`` + ``nn.layer_norm`` + residual as used
    by ``models.dpdfnet._dprnn_block``.

    ``fm_batch=B`` (requires f-major rows, ``N = Fq * B``): the out
    becomes the freq-leading 4-D plane ``[Fq, T, B, C]`` whose
    ``[Fq, T*B, C]`` reshape is the next intra stage's scan-leading
    input — the other half of the transpose-free DPRNN chain.  The row
    tile becomes a whole number of f-slices (``c*B`` with ``c | Fq``).
    ``h_last`` stays ``[N, C]`` in the same f-major row order as ``h0``.
    """
    T, N, C = x_tm.shape
    dtype = x_tm.dtype
    # bf16 planes stream compressed; all in-kernel math runs f32 (the h
    # carry, gates, fc and LN never see bf16 — see plane_io_bf16).
    cdt = jnp.float32 if dtype == jnp.bfloat16 else dtype

    tile = _pick_tile(N, int(os.environ.get(
        "DPDFNET_TPU_INTER_TILE", str(_TILE_N))))
    if fm_batch:
        B = fm_batch
        Fq = N // B
        if N != Fq * B:
            raise ValueError(f"fm_batch={B} does not divide N={N}")
        # whole f-slices per tile, nearest divisor of Fq to the tuned tile
        c = max(1, min(Fq, round(tile / B) or 1))
        while Fq % c:
            c -= 1
        tile = c * B
        n_pad = 0
    else:
        c = 0
        n_pad = (-N) % tile
        if n_pad:
            x_tm = jnp.pad(x_tm, ((0, 0), (0, n_pad), (0, 0)))
            h0 = jnp.pad(h0, ((0, n_pad), (0, 0)))
    Np = N + n_pad

    # steps per grid cell: largest power of two <= ts dividing T
    # (T is a segment/bucket size — a power of two in every engine path)
    want = max(1, _inter_ts() if ts is None else ts)
    TS = 1
    while TS * 2 <= want and T % (TS * 2) == 0:
        TS *= 2

    tmap = lambda i, t: (t, i, 0)
    hoist = _inter_hoist() and TS > 1
    pack = (_inter_pack() if pack is None else pack) and not hoist
    h_bm_req = h_bm and bool(fm_batch)
    h_bm = h_bm_req and pack
    if h_bm_req and not h_bm:
        # packed kernel off: take the explicit-transpose form and hand
        # h_last back in the caller's batch-major layout below
        h0 = jnp.swapaxes(h0, 0, 1).reshape(Np, C)
    # Scoped-vmem self-sizing (cf. dprnn_intra_block): the x/out pipeline
    # blocks scale with TS*tile and the hoisted xp scratch adds
    # TS*tile*3C f32.
    lanes = max(C, 128)
    isz = 2 if dtype == jnp.bfloat16 else 4
    xp_lanes = -(-3 * C // 128) * 128
    est = (4 * TS * tile * lanes * isz           # x + out, 2 bufs each
           + 3 * tile * lanes * 4                # h0 + h_last + h carry
           + (TS * tile * xp_lanes * 4 if hoist else 0)
           + (tile * max(2 * C, 128) * 4 if pack else 0))
    vmem = _sized_vmem(est, 1.35)

    if pack:
        wp, bp = _pack_inter(wi, bi, wh, bh, cdt)
        defer = _inter_defer() and TS > 1
        fcfuse = ((_inter_fcfuse() if fcfuse is None else fcfuse)
                  and TS > 1 and not defer)
        if fcfuse:
            # extend wp with the fc columns [0; Wfc] (see fcfuse in
            # _inter_block_kernel_packed); fc bias stays in bfc
            wpx = jnp.zeros((2 * C, 4 * C + C), cdt)
            wpx = wpx.at[:, :4 * C].set(wp)
            wpx = wpx.at[C:, 4 * C:].set(wfc.astype(cdt))
            wp = wpx
            bp = jnp.pad(bp, ((0, 0), (0, C)))
        kern = functools.partial(
            _inter_block_kernel_packed, TS, C, c, fcfuse, defer, h_bm,
            _PRECISIONS[precision], 1e-5)
        w_args = (wp, bp)
        scratch = [pltpu.VMEM((tile, 2 * C), cdt)]               # [x_t | h]
    else:
        defer = False
        kern = functools.partial(
            _inter_block_kernel, TS, C, hoist, c, _PRECISIONS[precision],
            1e-5)
        w_args = (wi.astype(cdt), wh.astype(cdt),
                  jnp.stack([bi, bh]).astype(cdt))
        # hoisted xp block (minimal when unused)
        scratch = [pltpu.VMEM((TS * tile, 3 * C) if hoist else (8, 128),
                              cdt)]

    out_spec = (pl.BlockSpec((c, TS, fm_batch, C),
                             lambda i, t: (i, t, 0, 0),
                             memory_space=pltpu.VMEM)
                if fm_batch else
                pl.BlockSpec((TS, tile, C), tmap, memory_space=pltpu.VMEM))
    out_shape = (jax.ShapeDtypeStruct((Np // fm_batch, T, fm_batch, C),
                                      dtype)
                 if fm_batch else
                 jax.ShapeDtypeStruct((T, Np, C), dtype))
    if h_bm:
        # h0/h_last stay in the state's [B, Fq, C] layout; blocks carry
        # the tile's c f-slices across the middle axis
        h_spec = pl.BlockSpec((1, fm_batch, c, C), lambda i, t: (0, 0, i, 0),
                              memory_space=pltpu.VMEM)
        hl_shape = jax.ShapeDtypeStruct(
            (1, fm_batch, Np // fm_batch, C), cdt)
    else:
        h_spec = pl.BlockSpec((1, tile, C), lambda i, t: (0, i, 0),
                              memory_space=pltpu.VMEM)
        hl_shape = jax.ShapeDtypeStruct((1, Np, C), cdt)
    out, h_last = pl.pallas_call(
        kern,
        grid=(Np // tile, T // TS),
        in_specs=[
            h_spec,                                               # h0
            pl.BlockSpec((TS, tile, C), tmap,
                         memory_space=pltpu.VMEM),                # x block
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (len(w_args) + 4),
        out_specs=[
            out_spec,
            h_spec,                                               # h_last
        ],
        out_shape=[
            out_shape,
            hl_shape,
        ],
        scratch_shapes=[
            pltpu.VMEM((tile, C), cdt),                           # h carry
        ] + scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=vmem,
        ),
        interpret=interpret,
    )(h0[None].astype(cdt), x_tm, *w_args,
      wfc.astype(cdt), bfc.reshape(1, -1).astype(cdt),
      g.reshape(1, -1).astype(cdt), bln.reshape(1, -1).astype(cdt))

    h_last = h_last[0]
    if h_bm_req and not h_bm:
        h_last = jnp.swapaxes(
            h_last.reshape(Np // fm_batch, fm_batch, C), 0, 1)
    if defer:
        # Deferred tail: out holds the raw h-sequence (in the out layout —
        # the kernel's static-store relayout applies to h just as it did
        # to the fused result).  One fused, fully parallel XLA pass runs
        # fc + LayerNorm + scale/shift + residual over the whole plane;
        # the fc GEMM inherits the ambient matmul precision like the
        # non-Pallas fallback path does.  x is re-read [T, Fq] transposed
        # in the fm case — minor dims (B, C) stay contiguous, so the read
        # fuses as strided runs rather than a materialised transpose.
        y = (jnp.einsum("...c,cd->...d", out.astype(cdt), wfc.astype(cdt))
             + bfc.astype(cdt))
        mu = jnp.mean(y, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(y - mu), axis=-1, keepdims=True)
        yn = (y - mu) * jax.lax.rsqrt(var + 1e-5)
        yn = yn * g.astype(cdt) + bln.astype(cdt)
        if fm_batch:
            x4 = jnp.transpose(
                x_tm.reshape(T, Np // fm_batch, fm_batch, C), (1, 0, 2, 3))
        else:
            x4 = x_tm
        out = (x4.astype(cdt) + yn).astype(dtype)
    if n_pad:
        out = out[:, :N]
        h_last = h_last[:N]
    return out, h_last


@functools.partial(
    jax.jit, static_argnames=("reverse", "precision", "interpret"))
def gru_scan_tm(
    x_tm: Array,
    h0: Array,
    wi: Array,
    bi: Array,
    wh: Array,
    bh: Array,
    *,
    reverse: bool = False,
    precision: str = "high",
    interpret: bool = False,
) -> Tuple[Array, Array]:
    """Run the fused GRU over ``x_tm: [T, N, I]`` with ``h0: [N, H]``.

    Returns (ys [T, N, H], h_last [N, H]).  Rows are padded to a tile
    multiple internally; weights are VMEM-resident for the whole sequence.
    """
    T, N, I = x_tm.shape
    H = wh.shape[0]
    dtype = x_tm.dtype

    tile = _pick_tile(N, _TILE_N)
    n_pad = (-N) % tile
    if n_pad:
        x_tm = jnp.pad(x_tm, ((0, 0), (0, n_pad), (0, 0)))
        h0 = jnp.pad(h0, ((0, n_pad), (0, 0)))
    Np = N + n_pad
    n_tiles = Np // tile

    # Time steps per grid cell.  TS > 1 amortises pipeline bookkeeping but
    # multiplies the pipeline's VMEM block buffers, so scale it to the
    # block size: keep each x/ys block under ~4 MB (the 16M-era sweet spot
    # was TS=1 at tile 2048; with the 40M limit, small-row scans — the
    # emb/decoder GRU stacks have only N=B rows — take TS=8 and large-row
    # ones fall back).  T is a power-of-two segment/bucket size.
    TS = 8
    while TS > 1 and (T % TS or TS * tile * max(I, H) * 4 >= (4 << 20)):
        TS //= 2

    b2 = jnp.stack([bi, bh]).astype(dtype)               # [2, 3H]

    def tmap(i, t):
        return ((T // TS - 1 - t) if reverse else t, i, 0)

    kern = functools.partial(_kernel, TS, H, reverse, _PRECISIONS[precision])

    ys, h_last = pl.pallas_call(
        kern,
        grid=(n_tiles, T // TS),
        in_specs=[
            pl.BlockSpec((1, tile, H), lambda i, t: (0, i, 0),
                         memory_space=pltpu.VMEM),                # h0
            pl.BlockSpec((TS, tile, I), tmap,
                         memory_space=pltpu.VMEM),                # x block
            pl.BlockSpec(memory_space=pltpu.VMEM),                # wi
            pl.BlockSpec(memory_space=pltpu.VMEM),                # wh
            pl.BlockSpec(memory_space=pltpu.VMEM),                # biases
        ],
        out_specs=[
            pl.BlockSpec((TS, tile, H), tmap,
                         memory_space=pltpu.VMEM),                # ys block
            pl.BlockSpec((1, tile, H), lambda i, t: (0, i, 0),
                         memory_space=pltpu.VMEM),                # h_last
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, Np, H), dtype),
            jax.ShapeDtypeStruct((1, Np, H), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile, H), dtype),                         # h carry
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_kernel_vmem(),
        ),
        interpret=interpret,
    )(h0[None], x_tm, wi.astype(dtype), wh.astype(dtype), b2)

    h_last = h_last[0]
    if n_pad:
        ys = ys[:, :N]
        h_last = h_last[:N]
    return ys, h_last


# --------------------------------------------------------------------------- #
# Merged DPRNN-stack kernel: K blocks' intra+inter stages in one walk
# --------------------------------------------------------------------------- #
#
# The separate intra/inter kernels round-trip the full activation plane
# [T, N, Fq, C] through HBM at every stage boundary: per block that is one
# write (intra out) + one read (inter in), plus the block-boundary
# write/read between consecutive blocks — ~10x the stack's unavoidable
# traffic (read x once, write out once).  The profile shows the inter
# kernel DMA-bound (~2x compute), so that traffic is exposed wall time.
#
# This kernel walks the time axis sequentially (grid (row_tiles, T)) and,
# per time step, runs K whole blocks back to back in VMEM:
#
#     cur = x[t]                                  # [tile, Fq, C]
#     for k in 0..K-1:
#         cur += LN(fc(bidirGRU_Fq(cur)))         # intra, walk along Fq
#         h[k] = GRUstep(h[k], cur)               # inter, one step of t
#         cur += LN(fc(h[k]))
#     out[t] = cur
#
# The only HBM traffic is x in and out once, plus the h0/h_last carries at
# the tile boundary.  The per-step dot shapes at the default tile are
# identical to the separate kernels' (intra M=tile, inter M=tile*Fq), so
# MXU utilisation is unchanged — the win is purely the removed stream.
# K (blocks per call) trades VMEM footprint (h carries are
# K*tile*Fq*C floats) against boundary traffic; both it and the row tile
# are env-tunable (DPDFNET_TPU_STACK_K / DPDFNET_TPU_STACK_TILE).


def _stack_kernel(K: int, Fq: int, C: int, precision, eps: float,
                  h0_ref, x_ref,
                  wi2_ref, wh2_ref, b2_ref, wfci_ref, bfci_ref,
                  gi_ref, blni_ref,
                  wit_ref, wht_ref, b2t_ref, wfct_ref, bfct_ref,
                  gt_ref, blnt_ref,
                  out_ref, hl_ref,
                  cur_scr, scrf, scrb, x2s, h_scr):
    t = pl.program_id(1)
    tile = cur_scr.shape[0]
    C2 = 2 * C
    CH = 8 if Fq % 8 == 0 else 1
    dtype = cur_scr.dtype

    @pl.when(t == 0)
    def _():
        h_scr[:] = h0_ref[:]

    cur_scr[:] = x_ref[0]

    for k in range(K):
        # ---- intra: bidirectional GRU along Fq + fc/LN/residual, in place.
        # Same walk as _intra_block_kernel (chunked, 8-aligned dynamic
        # slices on the sublane dim), reading/writing the cur scratch.
        wi2k = wi2_ref[k]
        wh2k = wh2_ref[k]
        bik = b2_ref[k, 0:1, :]
        bhk = b2_ref[k, 1:2, :]

        def chunk(ci, h):
            base = pl.multiple_of(ci * CH, CH)
            rbase = pl.multiple_of(Fq - CH - ci * CH, CH)
            xf_c = cur_scr[:, pl.ds(base, CH), :]            # [tile, CH, C]
            xb_c = cur_scr[:, pl.ds(rbase, CH), :]
            for s in range(CH):
                x2s[:, :C] = xf_c[:, s, :]
                x2s[:, C:] = xb_c[:, CH - 1 - s, :]
                xp = _kdot(x2s[:], wi2k, precision) + bik
                hh = _kdot(h, wh2k, precision) + bhk
                r = _sigmoid(xp[:, :C2] + hh[:, :C2])
                z = _sigmoid(xp[:, C2:2 * C2] + hh[:, C2:2 * C2])
                n = jnp.tanh(xp[:, 2 * C2:] + r * hh[:, 2 * C2:])
                h = ((1.0 - z) * n + z * h).astype(dtype)
                hf = h[:, :C]
                hb = h[:, C:]
                scrf[pl.ds(base + s, 1)] = hf[None]
                scrb[pl.ds(rbase + (CH - 1 - s), 1)] = hb[None]
            return h

        jax.lax.fori_loop(0, Fq // CH, chunk,
                          jnp.zeros((tile, C2), dtype))

        for c0 in range(0, Fq, CH):
            x_c = cur_scr[:, c0:c0 + CH, :]
            for s in range(CH):
                y = _kdot(scrf[c0 + s], wfci_ref[k, :C, :], precision) + \
                    _kdot(scrb[c0 + s], wfci_ref[k, C:, :], precision) + \
                    bfci_ref[k, 0:1, :]
                mu = jnp.mean(y, axis=-1, keepdims=True)
                var = jnp.mean(jnp.square(y - mu), axis=-1, keepdims=True)
                yn = (y - mu) * jax.lax.rsqrt(var + eps)
                yn = (yn * gi_ref[k, 0:1, :] + blni_ref[k, 0:1, :]).astype(
                    dtype)
                cur_scr[:, c0 + s, :] = x_c[:, s, :] + yn

        # ---- inter: one GRU step of the time recurrence over the
        # flattened [tile*Fq, C] rows, + fc/LN/residual.
        xi = cur_scr[:].reshape(tile * Fq, C)
        h = h_scr[k].reshape(tile * Fq, C)
        xp = _kdot(xi, wit_ref[k], precision) + b2t_ref[k, 0:1, :]
        hh = _kdot(h, wht_ref[k], precision) + b2t_ref[k, 1:2, :]
        rz = _sigmoid(xp[:, :2 * C] + hh[:, :2 * C])
        r = rz[:, :C]
        z = rz[:, C:]
        n = jnp.tanh(xp[:, 2 * C:] + r * hh[:, 2 * C:])
        h_new = ((1.0 - z) * n + z * h).astype(dtype)
        h_scr[k] = h_new.reshape(tile, Fq, C)
        y = _kdot(h_new, wfct_ref[k], precision) + bfct_ref[k, 0:1, :]
        mu = jnp.mean(y, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(y - mu), axis=-1, keepdims=True)
        yn = (y - mu) * jax.lax.rsqrt(var + eps)
        yn = (yn * gt_ref[k, 0:1, :] + blnt_ref[k, 0:1, :]).astype(dtype)
        cur_scr[:] = (xi + yn).reshape(tile, Fq, C)

    out_ref[0] = cur_scr[:]

    @pl.when(t == pl.num_programs(1) - 1)
    def _():
        hl_ref[:] = h_scr[:]


def pack_stack(blocks: list) -> dict:
    """Stack K DPRNN block parameter dicts for :func:`dprnn_stack`.

    Each block dict needs ``intra.packed`` (``_pack_bidir`` output),
    ``intra.fc/ln`` and ``inter.gru/fc/ln`` — the layout produced by
    ``models.fuse.pack_dprnn_bidir``.  Biases/LN vectors are stored as
    ``[K, 1, C]`` rows so the kernel can address them per block.
    """
    def stk(get):
        return jnp.stack([jnp.asarray(get(b), jnp.float32) for b in blocks])

    def row(get):
        return jnp.stack(
            [jnp.asarray(get(b), jnp.float32).reshape(1, -1)
             for b in blocks])

    return {
        "wi2": stk(lambda b: b["intra"]["packed"]["wi2"]),
        "wh2": stk(lambda b: b["intra"]["packed"]["wh2"]),
        "b2": stk(lambda b: b["intra"]["packed"]["b2"]),
        "wfc_i": stk(lambda b: b["intra"]["fc"]["w"]),
        "bfc_i": row(lambda b: b["intra"]["fc"]["b"]),
        "g_i": row(lambda b: b["intra"]["ln"]["g"]),
        "bln_i": row(lambda b: b["intra"]["ln"]["b"]),
        "wi_t": stk(lambda b: b["inter"]["gru"]["wi"]),
        "wh_t": stk(lambda b: b["inter"]["gru"]["wh"]),
        "b2_t": stk(lambda b: jnp.stack(
            [b["inter"]["gru"]["bi"], b["inter"]["gru"]["bh"]])),
        "wfc_t": stk(lambda b: b["inter"]["fc"]["w"]),
        "bfc_t": row(lambda b: b["inter"]["fc"]["b"]),
        "g_t": row(lambda b: b["inter"]["ln"]["g"]),
        "bln_t": row(lambda b: b["inter"]["ln"]["b"]),
    }


def _stack_k() -> int:
    """Blocks per merged-stack kernel call (DPDFNET_TPU_STACK_K).

    Bounds the kernel's VMEM footprint: the h0/h_last windows and the
    carry scratch each cost K*tile*Fq*128 lanes of f32 (C=64 pads to the
    128-lane tile), so K=4 at tile 256 already exceeds the chip's 128M
    scoped vmem (measured 130.7M); K=2 at tile 256 fits."""
    return int(os.environ.get("DPDFNET_TPU_STACK_K", "2"))


def _stack_tile() -> int:
    """Row tile of the merged-stack kernel (DPDFNET_TPU_STACK_TILE)."""
    return int(os.environ.get("DPDFNET_TPU_STACK_TILE", "256"))


def stack_enabled() -> bool:
    """Use the merged DPRNN-stack kernel? (DPDFNET_TPU_STACK=0/1).

    Default OFF: measured SLOWER than the separate fused kernels on v5e
    (dpdfnet8_48khz_hr b256 'default': 1629 xRT at K=2/tile=256, 1668 at
    K=1, vs 1876 for the per-stage kernels).  The separate inter kernel
    amortises its pipeline bookkeeping over TS=8 time steps per cell; the
    merged kernel must advance every block's inter recurrence at every t,
    so it pays that bookkeeping (and the h-carry VMEM pressure) per step.
    The removed inter-stage HBM round-trip doesn't come close to paying
    for it.  Kept env-gated for smaller-footprint configs/experiments."""
    return os.environ.get(
        "DPDFNET_TPU_STACK", "0") not in ("0", "false", "False")


@functools.partial(
    jax.jit, static_argnames=("precision", "interpret", "k_max", "tile"))
def dprnn_stack(
    x_tm: Array,
    h0: Array,
    stacked: dict,
    *,
    precision: str = "high",
    interpret: bool = False,
    k_max: int | None = None,
    tile: int | None = None,
) -> Tuple[Array, Array]:
    """Run a whole DPRNN block stack over time-major ``x_tm: [T, N, Fq, C]``.

    ``h0: [K, N, Fq, C]`` carries every block's inter-GRU hidden;
    ``stacked`` holds the per-block weights stacked on a leading K axis
    (see ``models.fuse.pack_dprnn_bidir``).  Returns (out_tm, h_last) with
    the same shapes — matching K applications of
    ``dprnn_intra_block`` + ``dprnn_inter_block`` exactly (same per-step
    op sequence; the intermediate plane just never leaves VMEM).
    """
    T, N, Fq, C = x_tm.shape
    K = h0.shape[0]
    if x_tm.dtype == jnp.bfloat16 and not interpret:
        # Same Mosaic bf16 limitation as dprnn_intra_block: run f32.
        out, hl = dprnn_stack(
            x_tm.astype(jnp.float32), h0.astype(jnp.float32), stacked,
            precision=precision, interpret=interpret, k_max=k_max, tile=tile)
        return out.astype(x_tm.dtype), hl.astype(h0.dtype)
    dtype = x_tm.dtype

    k_max = _stack_k() if k_max is None else k_max
    if K > max(1, k_max):
        # split the stack into ceil(K/k_max) sequential kernel calls —
        # bounds VMEM; only the split boundaries round-trip HBM.
        ks = max(1, k_max)
        out, hls = x_tm, []
        for k0 in range(0, K, ks):
            sub = {name: w[k0:k0 + ks] for name, w in stacked.items()}
            out, hl = dprnn_stack(
                out, h0[k0:k0 + ks], sub, precision=precision,
                interpret=interpret, k_max=ks, tile=tile)
            hls.append(hl)
        return out, jnp.concatenate(hls, axis=0)

    tile = _pick_tile(N, _stack_tile() if tile is None else tile)
    n_pad = (-N) % tile
    if n_pad:
        x_tm = jnp.pad(x_tm, ((0, 0), (0, n_pad), (0, 0), (0, 0)))
        h0 = jnp.pad(h0, ((0, 0), (0, n_pad), (0, 0), (0, 0)))
    Np = N + n_pad

    kern = functools.partial(
        _stack_kernel, K, Fq, C, _PRECISIONS[precision], 1e-5)
    # Scoped-vmem: the h0/h_last pipeline blocks and the carry scratch are
    # K-proportional, so size the limit from the buffer sum (x/out double-
    # buffered; h0/hl conservatively double-buffered too) plus Mosaic
    # slack, never below the global knob.  Measured actuals: K=4/tile=256
    # wants 130.7M (OOM over the 128M ceiling); K=1/tile=256 wants 51.07M
    # where the buffer sum x1.5 gave 50.13M — hence the 1.7 multiplier.
    plane = tile * Fq * max(C, 128) * 4   # C < 128 pads to the lane tile
    est = (4 * plane                      # x in + out, 2 bufs each
           + 3 * K * plane                # h0 + hl (single-buf) + h scratch
           + 3 * plane + tile * 2 * C * 4  # cur + ys_fw/bw + x2 staging
           + sum(int(np.prod(w.shape)) * 4 for w in stacked.values()))
    vmem = _sized_vmem(est, 1.7)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    carry_spec = pl.BlockSpec((K, tile, Fq, C), lambda i, t: (0, i, 0, 0),
                              memory_space=pltpu.VMEM)

    out, h_last = pl.pallas_call(
        kern,
        grid=(Np // tile, T),
        in_specs=[
            carry_spec,                                           # h0
            pl.BlockSpec((1, tile, Fq, C), lambda i, t: (t, i, 0, 0),
                         memory_space=pltpu.VMEM),                # x block
            full, full, full, full, full, full, full,             # intra w
            full, full, full, full, full, full, full,             # inter w
        ],
        out_specs=[
            pl.BlockSpec((1, tile, Fq, C), lambda i, t: (t, i, 0, 0),
                         memory_space=pltpu.VMEM),
            carry_spec,                                           # h_last
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, Np, Fq, C), dtype),
            jax.ShapeDtypeStruct((K, Np, Fq, C), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile, Fq, C), dtype),                     # cur
            pltpu.VMEM((Fq, tile, C), dtype),                     # ys_fw
            pltpu.VMEM((Fq, tile, C), dtype),                     # ys_bw
            pltpu.VMEM((tile, 2 * C), dtype),                     # x2 staging
            pltpu.VMEM((K, tile, Fq, C), dtype),                  # h carries
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=vmem,
        ),
        interpret=interpret,
    )(h0, x_tm,
      stacked["wi2"].astype(dtype), stacked["wh2"].astype(dtype),
      stacked["b2"].astype(dtype), stacked["wfc_i"].astype(dtype),
      stacked["bfc_i"].astype(dtype), stacked["g_i"].astype(dtype),
      stacked["bln_i"].astype(dtype),
      stacked["wi_t"].astype(dtype), stacked["wh_t"].astype(dtype),
      stacked["b2_t"].astype(dtype), stacked["wfc_t"].astype(dtype),
      stacked["bfc_t"].astype(dtype), stacked["g_t"].astype(dtype),
      stacked["bln_t"].astype(dtype))

    if n_pad:
        out = out[:, :N]
        h_last = h_last[:, :N]
    return out, h_last


# --------------------------------------------------------------------------- #
# v2 DPRNN kernels: hoisted input projections + fc folded into the recurrence
# --------------------------------------------------------------------------- #
#
# Profiling the v1 kernels on v5e showed the sequential walks spending ~half
# their MXU cycles on work that need not be sequential at all:
#
# - the input projection x_t @ Wi runs inside the walk every step (for the
#   intra kernel through direction-blockdiag weights that are half zeros);
# - the fc epilogue runs as separate small K=64 dots.
#
# v2 restructures both:
#
# - intra: xp for EVERY bin is computed up front as a few large chunked GEMMs
#   into a bf16 VMEM scratch; the walk's single dot per step is
#   h @ [Wh2 | blockdiag(Wfc)] — gate pre-activations AND the fc partial
#   products of the PREVIOUS step's hidden pair in one [tile,2C]x[2C,8C] pass.
#   The epilogue (LN + residual) becomes pure VPU work.
# - inter: xp is hoisted OUT of the kernel entirely (one XLA GEMM over the
#   whole [T, N] plane); each step computes h_new, then one dot
#   h_new @ [Wh | Wfc] yields the next step's gate pre-activations and this
#   step's fc output together.
#
# Both kernels keep the same math as nn.gru_bidir/gru_seq + linear +
# layer_norm + residual; the only numerical deviation from v1 is the bf16
# rounding of the stored xp (within the 'fast' tier's bf16-MXU contract).


def _intra_v2_kernel(T: int, C: int, precision, eps: float,
                     x_ref, wic_ref, whb_ref, b_ref,
                     bfc_ref, g_ref, bln_ref,
                     out_ref, xp_scr, pf_scr, pb_scr):
    tile = x_ref.shape[0]
    C2 = 2 * C
    H6 = 6 * C

    # 1) hoist xp for every bin: both directions' projections share the same
    #    input rows, so one dense [C, 6C] weight (gate-major columns) covers
    #    them.  Per-bin dots are independent — the MXU pipelines them back to
    #    back, unlike the walk's dependent chain.  The scratch is time-
    #    leading because Mosaic only supports dynamic (walk-indexed) VMEM
    #    addressing on the leading dim (sublane alignment on the others).
    for t in range(T):
        proj = _kdot(x_ref[:, t, :], wic_ref[:], precision) + b_ref[0:1, :]
        xp_scr[t] = proj.astype(xp_scr.dtype)

    # gate-major column mask: [r_f r_b z_f z_b n_f n_b] -> f-direction cols
    col = jax.lax.broadcasted_iota(jnp.int32, (1, H6), 1)
    is_f = (col // C) % 2 == 0

    # 2) sequential walk: one dot per step computes the gate pre-activations
    #    (blockdiag Wh2) AND the fc partials of the previous hidden pair
    #    (blockdiag Wfc columns).  Step 0's partials are of h=0 and land in
    #    clamped slots that later steps overwrite.
    def step(s, h):
        dot = _kdot(
            h, whb_ref[:], precision)
        hh = dot[:, :H6] + b_ref[1:2, :]
        p = dot[:, H6:]
        sf = jnp.maximum(s - 1, 0)
        sb = jnp.minimum(T - s, T - 1)
        pf_scr[pl.ds(sf, 1)] = p[:, :C][None]
        pb_scr[pl.ds(sb, 1)] = p[:, C:][None]

        xp_s = xp_scr[pl.ds(s, 1)].reshape(tile, H6).astype(jnp.float32)
        xp_r = xp_scr[pl.ds(T - 1 - s, 1)].reshape(
            tile, H6).astype(jnp.float32)
        xp2 = jnp.where(is_f, xp_s, xp_r)

        r = _sigmoid(xp2[:, :C2] + hh[:, :C2])
        z = _sigmoid(xp2[:, C2:2 * C2] + hh[:, C2:2 * C2])
        n = jnp.tanh(xp2[:, 2 * C2:] + r * hh[:, 2 * C2:])
        return ((1.0 - z) * n + z * h).astype(jnp.float32)

    h_fin = jax.lax.fori_loop(0, T, step, jnp.zeros((tile, C2), jnp.float32))
    p_last = _kdot(h_fin, whb_ref[:, H6:], precision)
    pf_scr[pl.ds(T - 1, 1)] = p_last[:, :C][None]
    pb_scr[pl.ds(0, 1)] = p_last[:, C:][None]

    # 3) epilogue: LN + residual, no dots (fc already accumulated)
    for s in range(T):
        y = pf_scr[s] + pb_scr[s] + bfc_ref[0:1, :]
        mu = jnp.mean(y, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(y - mu), axis=-1, keepdims=True)
        yn = (y - mu) * jax.lax.rsqrt(var + eps)
        yn = (yn * g_ref[0:1, :] + bln_ref[0:1, :]).astype(x_ref.dtype)
        out_ref[:, s, :] = x_ref[:, s, :] + yn


def pack_intra_v2(packed: dict, wfc: Array, dtype=jnp.float32):
    """Derive the v2 intra weights from the v1 packed set + fc weight.

    Returns (wi_cat [C, 6C], wh_big [2C, 8C]): wi_cat collapses the blockdiag
    wi2's two row blocks (their nonzero columns are disjoint); wh_big appends
    blockdiag(wfc_fw_half, wfc_bw_half) columns to wh2.
    """
    wi2, wh2 = packed["wi2"], packed["wh2"]
    I2, H6 = wi2.shape
    I = I2 // 2
    C = wh2.shape[0] // 2
    wi_cat = (wi2[:I] + wi2[I:]).astype(dtype)
    fc_blk = jnp.zeros((2 * C, 2 * C), dtype)
    fc_blk = fc_blk.at[:C, :C].set(wfc[:C].astype(dtype))
    fc_blk = fc_blk.at[C:, C:].set(wfc[C:].astype(dtype))
    wh_big = jnp.concatenate([wh2.astype(dtype), fc_blk], axis=1)
    return wi_cat, wh_big


# The kernel raises Mosaic's scoped-vmem limit to this value (v5e has
# 128 MiB physical VMEM; the 16M default is a compiler heuristic, and the
# allocator's real usage exceeds the naive buffer sum non-monotonically in
# the tile size — measured 16.5M at tile 120 / 19.7M at tile 112, T=48).
# The estimator budget below keeps the buffer sum at ~half the raised
# limit, leaving slack for Mosaic's temporaries and XLA's own VMEM needs.
# 48M: the chunked intra walk at tile 256 + HIGHEST-precision dots peaks
# at 40.46M measured (b256 'high'); headroom without starving XLA's own
# VMEM (v5e has 128M physical; 100M measured working).  The env override
# accepts bytes, or MiB for values under 1 MiB (so "=64" and "=4096" both mean MiB).
def _kernel_vmem() -> int:
    """Scoped-vmem limit for the kernels (DPDFNET_TPU_KERNEL_VMEM; read
    at trace time).  Bytes, or MiB for values under 1 MiB — '=64' and
    '=2048' both mean MiB."""
    v = int(os.environ.get("DPDFNET_TPU_KERNEL_VMEM", 48 * 1024 * 1024))
    if v < (1 << 20):
        v *= 1 << 20
    return v


def _sized_vmem(est: int, slack: float) -> int:
    """Resolve a kernel's scoped-vmem limit from its buffer-sum estimate.

    An EXPLICIT DPDFNET_TPU_KERNEL_VMEM is the limit, full stop — the
    knob's documented meaning is "cap the kernels' scoped vmem" (e.g. to
    leave XLA fusions their own headroom), so self-sizing must not
    override it upward.  With the knob unset, take the larger of the
    48 MiB default and the slacked estimate, capped at 126 MiB."""
    if os.environ.get("DPDFNET_TPU_KERNEL_VMEM") is not None:
        return _kernel_vmem()
    return max(_kernel_vmem(), min(int(est * slack), 126 * 1024 * 1024))
_INTRA_V2_VMEM_BUDGET = 20 * 1024 * 1024


def _intra_v2_tile(T: int, C: int, xp_bytes: int) -> int:
    """Largest row tile (multiple of 8, <=128) whose VMEM estimate fits:
    x in/out double-buffered f32, xp scratch, two f32 partial scratches."""
    for tile in range(128, 0, -8):
        est = (4 * tile * T * C * 4          # x in (2 bufs) + out (2 bufs)
               + tile * T * 6 * C * xp_bytes  # xp scratch
               + 2 * tile * T * C * 4)        # pf/pb
        if est <= _INTRA_V2_VMEM_BUDGET:
            return tile
    return 8


@functools.partial(
    jax.jit, static_argnames=("precision", "interpret", "xp_bf16"))
def dprnn_intra_block_v2(
    x: Array,
    wi_cat: Array,
    wh_big: Array,
    b2: Array,
    bfc: Array,
    g: Array,
    bln: Array,
    *,
    precision: str = "default",
    interpret: bool = False,
    xp_bf16: bool = True,
) -> Array:
    """Fused DPRNN intra stage, v2 (see module comment).

    x: [N, T, C]; weights from :func:`pack_intra_v2` + the v1 ``b2``.
    Matches :func:`dprnn_intra_block` up to bf16 rounding of the hoisted
    input projections (exactly, with ``xp_bf16=False``).
    """
    N, T, C = x.shape
    dtype = x.dtype
    xp_dtype = jnp.bfloat16 if xp_bf16 else jnp.float32

    tile = _intra_v2_tile(T, C, 2 if xp_bf16 else 4)
    n_pad = (-N) % tile
    if n_pad:
        x = jnp.pad(x, ((0, n_pad), (0, 0), (0, 0)))
    Np = N + n_pad

    kern = functools.partial(
        _intra_v2_kernel, T, C, _PRECISIONS[precision], 1e-5)

    out = pl.pallas_call(
        kern,
        grid=(Np // tile,),
        in_specs=[
            pl.BlockSpec((tile, T, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),                # x
            pl.BlockSpec(memory_space=pltpu.VMEM),                # wi_cat
            pl.BlockSpec(memory_space=pltpu.VMEM),                # wh_big
            pl.BlockSpec(memory_space=pltpu.VMEM),                # b2
            pl.BlockSpec(memory_space=pltpu.VMEM),                # bfc
            pl.BlockSpec(memory_space=pltpu.VMEM),                # ln gain
            pl.BlockSpec(memory_space=pltpu.VMEM),                # ln bias
        ],
        out_specs=pl.BlockSpec((tile, T, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Np, T, C), dtype),
        scratch_shapes=[
            pltpu.VMEM((T, tile, 6 * C), xp_dtype),               # xp (t-major)
            pltpu.VMEM((T, tile, C), jnp.float32),                # fc fw parts
            pltpu.VMEM((T, tile, C), jnp.float32),                # fc bw parts
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_kernel_vmem(),
        ),
        interpret=interpret,
    )(x, wi_cat.astype(jnp.float32), wh_big.astype(jnp.float32),
      b2.astype(jnp.float32), bfc.reshape(1, -1).astype(jnp.float32),
      g.reshape(1, -1).astype(jnp.float32),
      bln.reshape(1, -1).astype(jnp.float32))

    return out[:N] if n_pad else out


def _inter_v2_kernel(H: int, precision, eps: float,
                     h0_ref, xp_ref, x_ref, whfc_ref, bh_ref,
                     bfc_ref, g_ref, bln_ref,
                     out_ref, hl_ref, h_scr, hh_scr):
    """One inter step per grid cell.  The carried hh scratch holds the RAW
    h @ Wh product computed by the PREVIOUS step's combined dot (bh added at
    use), so the only dot on the critical path is h_new @ [Wh | Wfc]."""
    t = pl.program_id(1)
    H3 = 3 * H

    @pl.when(t == 0)
    def _():
        h_scr[:] = h0_ref[0]
        hh_scr[:] = _kdot(h0_ref[0], whfc_ref[:, :H3], precision)

    h = h_scr[:]
    xp = xp_ref[0].astype(jnp.float32)
    hh = hh_scr[:] + bh_ref[0:1, :]
    rz = _sigmoid(xp[:, :2 * H] + hh[:, :2 * H])
    r = rz[:, :H]
    z = rz[:, H:]
    n = jnp.tanh(xp[:, 2 * H:] + r * hh[:, 2 * H:])
    h_new = (1.0 - z) * n + z * h

    dot = _kdot(
        h_new, whfc_ref[:], precision)
    hh_scr[:] = dot[:, :H3]
    h_scr[:] = h_new.astype(h_scr.dtype)
    hl_ref[0] = h_new.astype(h_scr.dtype)

    x = x_ref[0]
    y = dot[:, H3:] + bfc_ref[0:1, :]
    mu = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mu), axis=-1, keepdims=True)
    yn = (y - mu) * jax.lax.rsqrt(var + eps)
    yn = yn * g_ref[0:1, :] + bln_ref[0:1, :]
    out_ref[0] = x + yn.astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("precision", "interpret"))
def dprnn_inter_block_v2(
    xp_tm: Array,
    x_tm: Array,
    h0: Array,
    whfc: Array,
    bh: Array,
    bfc: Array,
    g: Array,
    bln: Array,
    *,
    precision: str = "default",
    interpret: bool = False,
) -> Tuple[Array, Array]:
    """Fused DPRNN inter stage, v2: input projections precomputed.

    xp_tm: [T, N, 3H] = x_tm @ Wi + bi (any float dtype; bf16 halves the
    stream bandwidth); x_tm: [T, N, C] residual input; whfc [C, 3H + C] =
    [Wh | Wfc].  Returns (out_tm, h_last) matching
    :func:`dprnn_inter_block`.
    """
    T, N, C = x_tm.shape
    dtype = x_tm.dtype

    tile = _pick_tile(N, _TILE_N)
    n_pad = (-N) % tile
    if n_pad:
        xp_tm = jnp.pad(xp_tm, ((0, 0), (0, n_pad), (0, 0)))
        x_tm = jnp.pad(x_tm, ((0, 0), (0, n_pad), (0, 0)))
        h0 = jnp.pad(h0, ((0, n_pad), (0, 0)))
    Np = N + n_pad

    tmap = lambda i, t: (t, i, 0)
    kern = functools.partial(_inter_v2_kernel, C, _PRECISIONS[precision], 1e-5)

    out, h_last = pl.pallas_call(
        kern,
        grid=(Np // tile, T),
        in_specs=[
            pl.BlockSpec((1, tile, C), lambda i, t: (0, i, 0),
                         memory_space=pltpu.VMEM),                # h0
            pl.BlockSpec((1, tile, 3 * C), tmap,
                         memory_space=pltpu.VMEM),                # xp block
            pl.BlockSpec((1, tile, C), tmap,
                         memory_space=pltpu.VMEM),                # x block
            pl.BlockSpec(memory_space=pltpu.VMEM),                # whfc
            pl.BlockSpec(memory_space=pltpu.VMEM),                # bh
            pl.BlockSpec(memory_space=pltpu.VMEM),                # bfc
            pl.BlockSpec(memory_space=pltpu.VMEM),                # ln gain
            pl.BlockSpec(memory_space=pltpu.VMEM),                # ln bias
        ],
        out_specs=[
            pl.BlockSpec((1, tile, C), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, C), lambda i, t: (0, i, 0),
                         memory_space=pltpu.VMEM),                # h_last
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, Np, C), dtype),
            jax.ShapeDtypeStruct((1, Np, C), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile, C), dtype),                         # h carry
            pltpu.VMEM((tile, 3 * C), jnp.float32),               # raw h @ Wh
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_kernel_vmem(),
        ),
        interpret=interpret,
    )(h0[None], xp_tm, x_tm, whfc.astype(jnp.float32),
      bh.reshape(1, -1).astype(jnp.float32),
      bfc.reshape(1, -1).astype(jnp.float32),
      g.reshape(1, -1).astype(jnp.float32),
      bln.reshape(1, -1).astype(jnp.float32))

    h_last = h_last[0]
    if n_pad:
        out = out[:, :N]
        h_last = h_last[:N]
    return out, h_last


# ---------------------------------------------------------------------------
# Entry relayout: batch-major conv plane -> freq-leading chain plane
# ---------------------------------------------------------------------------


def h_ingest_enabled() -> bool:
    """Ingest/emit the inter-GRU hidden in its batch-major state layout
    through the kernel's own static window extracts instead of XLA
    transpose copies (DPDFNET_TPU_H_INGEST, read at trace time).

    Round-5 probe, REJECTED (default OFF): motivated by the exact-stream
    profile (per-frame h swapaxes pairs ≈ 12% 'data formatting'), but at
    T==1 every grid cell is both first and last step, so the FM mid-dim
    ``h0_ref[0, :, j]`` window extracts + ``hl_ref[0, :, j]`` stores run
    per cell per frame — measured exact s256 turbo **1.723 vs 1.354
    ms/hop (+27%)**: the same mid-dim sublane-extract cost that killed
    the entry-relayout kernels.  The s512 shape additionally tripped an
    MLIR lowering-cache KeyError in this jax version.  The XLA transpose
    copies stay the cheaper currency for the hidden."""
    return os.environ.get(
        "DPDFNET_TPU_H_INGEST", "0") not in ("0", "false", "False")


def entry_relayout_enabled() -> bool:
    """Use the Pallas entry-relayout kernel for the tm chain's input
    transpose (DPDFNET_TPU_ENTRY_RELAYOUT, read at trace time)?

    Round-4 probe, REJECTED (default OFF): XLA's big-plane transposes
    run ~6x over HBM bandwidth on v5e (measured round 3: ~3.9 ms per
    264 MB f32 plane), so this kernel does the same
    ``[B, T, F, C] -> [F, T, B, C]`` permute with block DMAs and static
    in-VMEM sublane extracts.  Measured e2e at the shipped headline
    point (b384 turbo seg 112): **2696 vs 2885 xRT (-6.6%)** — the
    [BB, TT, FB, C] input blocks gather BB*TT strided FB*C runs from the
    batch-major plane per DMA, which costs more than the XLA transpose's
    inefficiency saved; the fused bf16 cast does not make it back
    either.  Kept for experimentation on other shapes."""
    return os.environ.get(
        "DPDFNET_TPU_ENTRY_RELAYOUT", "0") not in ("0", "false", "False")


def _relayout_kernel(FB: int, TT: int, x_ref, o_ref):
    # x_ref: [BB, TT, FB, C] block of the batch-major source;
    # o_ref: [FB, TT, BB, C] block of the freq-leading destination.
    # FB*TT static strided loads + contiguous stores; lanes (C) untouched.
    for f in range(FB):
        for t in range(TT):
            o_ref[f, t] = x_ref[:, t, f, :].astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("out_dtype", "interpret"))
def relayout_fm(x: Array, *, out_dtype=None, interpret: bool = False):
    """``[B, T, F, C] -> [F, T, B, C]`` permute as a Pallas kernel.

    The tm-chain entry relayout (models.dpdfnet._dprnn_fused): the conv
    stages emit batch-major planes, the freq-chained DPRNN stack consumes
    a freq-leading one.  Rather than an XLA transpose (which on v5e runs
    ~6x over bandwidth for this minor-dim-preserving permute), tile the
    plane into ``[BB, TT, FB, C]`` blocks whose in/out DMAs are runs of
    ``FB*C`` / ``BB*C`` contiguous elements, and do the permute with
    ``FB*TT`` static sublane extracts per block in VMEM.  ``out_dtype``
    folds the f32->bf16 plane cast (tiers with bf16 plane IO) into the
    store.  Falls back to ``jnp.transpose`` when a dim is not a multiple
    of 8 (shipped configs: F, B multiples of 8; T a multiple of 8 per
    segment).
    """
    B, T, F, C = x.shape
    dtype = jnp.dtype(out_dtype) if out_dtype is not None else x.dtype
    if F % 8 or T % 8 or B % 8:
        return jnp.transpose(x, (2, 1, 0, 3)).astype(dtype)
    # DPDFNET_TPU_RELAYOUT_FULLF=1: take the whole F extent per block so
    # the input DMA gathers contiguous [F, C] runs per (b, t) row (5 KB at
    # F=40 C=64 bf16) instead of FB=8 slices (1 KB runs — the round-4
    # rejection's cost center).  Round-5 probe: e2e b384 turbo seg 112
    # measured 2718 xRT vs 2885 default — better than the FB=8 form's
    # 2696 but still REJECTED: even with contiguous input runs the
    # F*TT(=320) static sublane extracts per block plus the strided
    # output runs cost more than the XLA transpose's 6x-over-bandwidth
    # waste.  The one-transpose-per-stack XLA form stays the optimum.
    if os.environ.get("DPDFNET_TPU_RELAYOUT_FULLF", "0") not in (
            "0", "false", "False"):
        FB, TT = F, 8
        BB = 32
        while B % BB:
            BB //= 2
    else:
        FB, TT = 8, 8
        BB = 128
        while B % BB:
            BB //= 2
    kern = functools.partial(_relayout_kernel, FB, TT)
    isz = max(jnp.dtype(x.dtype).itemsize, jnp.dtype(dtype).itemsize)
    lanes = max(C, 128)
    est = 4 * BB * TT * FB * lanes * isz          # in + out, 2 bufs each
    out = pl.pallas_call(
        kern,
        grid=(F // FB, T // TT, B // BB),
        in_specs=[pl.BlockSpec((BB, TT, FB, C), lambda f, t, b: (b, t, f, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((FB, TT, BB, C), lambda f, t, b: (f, t, b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((F, T, B, C), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
            vmem_limit_bytes=_sized_vmem(est, 1.35),
        ),
        interpret=interpret,
    )(x)
    return out
