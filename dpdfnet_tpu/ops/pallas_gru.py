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

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# Mosaic supports only DEFAULT/HIGHEST dot precision; map 'high' to full
# f32 — the kernel's GEMMs are small enough that the 6-pass cost is hidden
# behind the DMA stream, and accuracy can only improve.
_PRECISIONS = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGHEST,
    "highest": jax.lax.Precision.HIGHEST,
}

# Rows per grid cell.  Grid cells execute sequentially on the TensorCore,
# so the tile should cover as many rows as VMEM allows — smaller tiles
# multiply the sequential step count.  Budget: x block (2 pipeline buffers)
# + ys block (2) + h0/h_last/h-scratch, each tile*max(I,H)*4B.
_TILE_N = 2048


def enabled() -> bool:
    """Use the Pallas kernel? Overridable via DPDFNET_TPU_PALLAS=0/1."""
    env = os.environ.get("DPDFNET_TPU_PALLAS")
    if env is not None:
        return env not in ("0", "false", "False")
    return jax.default_backend() == "tpu"


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
        xp = jax.lax.dot_general(
            x_ref[idx], wi_ref[:], (((1,), (0,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32,
        ) + b_ref[0:1, :]
        hh = jax.lax.dot_general(
            h, wh_ref[:], (((1,), (0,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32,
        ) + b_ref[1:2, :]
        r = jax.nn.sigmoid(xp[:, :H] + hh[:, :H])
        z = jax.nn.sigmoid(xp[:, H:2 * H] + hh[:, H:2 * H])
        n = jnp.tanh(xp[:, 2 * H:] + r * hh[:, 2 * H:])
        h = ((1.0 - z) * n + z * h).astype(h_scr.dtype)
        ys_ref[idx] = h
    h_scr[:] = h
    hl_ref[0] = h


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

    tile = min(_TILE_N, max(8, N))
    n_pad = (-N) % tile
    if n_pad:
        x_tm = jnp.pad(x_tm, ((0, 0), (0, n_pad), (0, 0)))
        h0 = jnp.pad(h0, ((0, n_pad), (0, 0)))
    Np = N + n_pad
    n_tiles = Np // tile

    # Time steps per grid cell.  TS > 1 amortises pipeline bookkeeping but
    # multiplies the pipeline's VMEM block buffers; on v5e (16M scoped vmem)
    # the sweet spot measured is TS=1 with the largest row tile that fits —
    # larger TS trips the scoped-vmem limit at tile=2048.
    TS = 1

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
        ),
        interpret=interpret,
    )(h0[None], x_tm, wi.astype(dtype), wh.astype(dtype), b2)

    h_last = h_last[0]
    if n_pad:
        ys = ys[:, :N]
        h_last = h_last[:N]
    return ys, h_last
