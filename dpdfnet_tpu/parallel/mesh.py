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

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ModelConfig

BATCH_AXIS = "data"   # must agree with runtime.engine.BATCH_AXIS


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


def sharded_engine(cfg: ModelConfig, params, mesh: Mesh, **kwargs):
    """The production multi-chip path: the tuned ``runtime.engine.Engine``
    (segment-scan, fused inference params, DFT-GEMM front-end, precision
    tiers, Pallas kernels) with its batch axis shard_map'ed over ``mesh``.

    Replaces the reference's thread-pool scale-out
    (`/root/reference/package/src/dpdfnet/cli.py:252-311`).
    """
    from ..runtime.engine import Engine

    return Engine(cfg, params, mesh=mesh, **kwargs)


def make_sharded_enhance(
    cfg: ModelConfig, mesh: Mesh, *, precision: str = "high", **kwargs
):
    """Thin wrapper over :func:`sharded_engine` kept for API continuity.

    Returns ``fn(params, wav [B, S]) -> enhanced [B, S]``.  The computation
    is the SAME code path as the single-device engine — per-shard programs
    are identical, XLA inserts no collectives (utterances are independent).

    ``fn`` is a host-level convenience (it stages the batch through host
    memory for the engine's length bucketing) and is NOT jit-composable;
    to keep data on device or compose under jit, use
    :func:`sharded_engine` directly and drive its jitted methods.
    """
    cache: dict = {}

    def fn(params, wav):
        # Cache the built engine keyed by the params object.  The entry
        # holds a strong reference to the caller's tree: id() of a freed
        # object can be recycled by CPython, which would silently serve an
        # engine built from the PREVIOUS weights.
        key = id(params)
        hit = cache.get(key)
        if hit is None or hit[0] is not params:
            cache.clear()
            cache[key] = (params, sharded_engine(
                cfg, params, mesh, precision=precision, **kwargs))
        out = cache[key][1].enhance_waveforms(np.asarray(wav))
        return jnp.asarray(out)

    return fn


def make_sharded_stream_step(cfg: ModelConfig, mesh: Mesh, *,
                             precision: str = "high", **kwargs):
    """Batch-sharded streaming step over spec frames (thin Engine wrapper).

    ``fn(params, spec [B,T,F,2], state) -> (out, state)`` — many independent
    live streams served per mesh, state resident on device across calls.
    The per-shard program is the engine's tuned streaming scan body.
    """
    from ..runtime.engine import Engine

    cache: dict = {}

    def fn(params, spec, st):
        # Strong-ref cache keyed by the params object (see
        # make_sharded_enhance for why a bare id() key is unsafe).
        key = id(params)
        hit = cache.get(key)
        if hit is None or hit[0] is not params:
            cache.clear()
            cache[key] = (params, Engine(cfg, params, mesh=mesh,
                                         precision=precision, **kwargs))
        eng = cache[key][1]
        run = eng._stream_spec_fn(spec.shape[0], spec.shape[1])
        return run(eng.params, spec, st)

    return fn
