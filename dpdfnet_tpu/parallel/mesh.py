"""Device mesh + sharding helpers.

The reference scales out with a thread pool of independent per-file ONNX
sessions (`/root/reference/package/src/dpdfnet/cli.py:252-311`).  Utterances
are embarrassingly parallel, so the TPU-native equivalent is batch
data-parallelism: shard the utterance axis of one compiled program across
chips with ``NamedSharding`` over a 1-D ``Mesh``; parameters are replicated
and no cross-chip collectives are needed on the hot path (SURVEY.md §2.9).
Multi-host deployments shard files per host over DCN and reuse the same
program per host.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ModelConfig
from ..models import state as state_lib
from ..models.dpdfnet import forward_spec
from ..ops import stft as stft_ops
from ..ops.windows import vorbis_window

BATCH_AXIS = "data"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), axis_names=(BATCH_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(BATCH_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place a pytree whose leaves lead with the batch axis onto the mesh."""
    sh = batch_sharding(mesh)

    def put(x):
        return jax.device_put(x, NamedSharding(mesh, P(BATCH_AXIS, *([None] * (x.ndim - 1)))))

    return jax.tree_util.tree_map(put, tree)


def make_sharded_enhance(
    cfg: ModelConfig, mesh: Mesh, *, precision: str = "highest"
):
    """Compile the full offline enhancement step, batch-sharded over ``mesh``.

    Returns ``fn(params, wav [B, S]) -> enhanced [B, S']`` where B must be a
    multiple of the mesh size.  Parameters are replicated; activations and
    state shard along the batch axis; XLA inserts no collectives (verified by
    the dry-run test) because every utterance is independent.
    """
    window = jnp.asarray(vorbis_window(cfg.win_len))

    def step(params, wav):
        with jax.default_matmul_precision(precision):
            x = jnp.pad(wav, ((0, 0), (0, cfg.win_len)))
            spec = stft_ops.stft(x, window, cfg.hop, center=True) * cfg.wnorm
            st = state_lib.init_state(cfg, batch=wav.shape[0])
            out, _, _ = forward_spec(params, cfg, spec, st)
            y = stft_ops.istft(out / cfg.wnorm, window, cfg.hop, center=True)
            return y[:, 2 * cfg.win_len:]

    in_shardings = (replicated(mesh), NamedSharding(mesh, P(BATCH_AXIS, None)))
    out_shardings = NamedSharding(mesh, P(BATCH_AXIS, None))
    return jax.jit(step, in_shardings=in_shardings, out_shardings=out_shardings)


def make_sharded_stream_step(cfg: ModelConfig, mesh: Mesh):
    """Compile a batch-sharded streaming step over spec frames.

    ``fn(params, spec [B,T,F,2], state) -> (out, state)`` — many independent
    live streams served per chip, state resident on device across calls.
    """

    def step(params, spec, st):
        out, st, _ = forward_spec(params, cfg, spec, st)
        return out, st

    def spec_shard(x):
        return NamedSharding(mesh, P(BATCH_AXIS, *([None] * (x - 1))))

    cfg_state = state_lib.init_state(cfg, batch=mesh.size)
    state_sh = jax.tree_util.tree_map(lambda x: spec_shard(x.ndim), cfg_state)
    in_sh = (replicated(mesh), spec_shard(4), state_sh)
    out_sh = (spec_shard(4), state_sh)
    return jax.jit(step, in_shardings=in_sh, out_shardings=out_sh,
                   donate_argnums=(2,))
