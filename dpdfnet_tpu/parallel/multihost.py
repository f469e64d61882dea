"""Multi-host (DCN) scale-out.

The reference scales out with a thread pool of per-file ONNX sessions on
one machine (`/root/reference/package/src/dpdfnet/cli.py:309`).  Utterances
are independent, so the multi-host TPU equivalent needs no cross-host
collectives at all: each host runs the SAME tuned single-host program
(ICI-mesh batch sharding over its local chips, `parallel.mesh`) on a
DISJOINT slice of the file list.  DCN carries only jax.distributed's
control-plane traffic; the audio hot path never touches it.

Three pieces:

- :func:`initialize` — `jax.distributed.initialize` wiring with env-driven
  defaults (standard JAX env vars / TPU pod metadata), idempotent.
- :func:`shard_files_for_host` — deterministic disjoint cover of a file
  list: host ``h`` of ``n`` takes ``files[h::n]`` of the size-sorted list,
  which balances total audio duration and preserves the engine's
  similar-length batching within each host.
- :func:`local_mesh` — the host's ICI mesh over ``jax.local_devices()``.

Pod-slice recipe (also in docs/performance.md): run the same command on
every host —

    dpdfnet-tpu enhance-dir IN OUT --model dpdfnet8_48khz_hr --distributed

`--distributed` calls :func:`initialize` (on Cloud TPU the coordinator,
process count and process id all come from the pod metadata, so no flags
are needed), and enhance-dir then processes only this host's shard.  For
plain multi-machine fan-out WITHOUT jax.distributed (independent jobs over
a shared filesystem), pass explicit ``--num-hosts N --host-id K`` instead;
the file shards are identical either way.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, TypeVar

T = TypeVar("T")

_INITIALIZED = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Bring up jax.distributed across the pod slice (idempotent).

    Arguments default to None so `jax.distributed.initialize` can pull
    them from the environment: Cloud TPU pod metadata, or the standard
    ``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID`` variables for manual bring-up.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return
    import jax

    if jax.process_count() > 1:        # someone else already initialised
        _INITIALIZED = True
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    _INITIALIZED = True


def host_info(
    host_id: Optional[int] = None, num_hosts: Optional[int] = None
) -> tuple:
    """Resolve (host_id, num_hosts).

    Priority: explicit args > DPDFNET_TPU_HOST_ID/NUM_HOSTS env >
    jax process index/count (1 process when jax.distributed is down).
    Raises on inconsistent values so a bad launch fails loudly instead of
    silently double-processing files.
    """
    env_id = os.environ.get("DPDFNET_TPU_HOST_ID")
    env_n = os.environ.get("DPDFNET_TPU_NUM_HOSTS")
    if num_hosts is None:
        num_hosts = int(env_n) if env_n is not None else None
    if host_id is None:
        host_id = int(env_id) if env_id is not None else None
    if num_hosts is None and host_id is None:
        import jax

        return jax.process_index(), jax.process_count()
    if num_hosts is None or host_id is None:
        raise ValueError(
            "host_id and num_hosts must be given together "
            f"(got host_id={host_id}, num_hosts={num_hosts})")
    if not (0 <= host_id < num_hosts):
        raise ValueError(
            f"host_id {host_id} out of range for num_hosts {num_hosts}")
    return host_id, num_hosts


def shard_files_for_host(
    files: Sequence[T],
    host_id: Optional[int] = None,
    num_hosts: Optional[int] = None,
) -> list:
    """This host's slice of ``files``: a deterministic disjoint cover.

    ``files`` must arrive in the same order on every host (enhance-dir's
    size-sorted listing is); host ``h`` takes ``files[h::n]``.  Striding a
    size-sorted list balances total bytes across hosts to within one file
    AND keeps each host's shard size-sorted, so the engine's length
    bucketing works exactly as in the single-host case.
    """
    host_id, num_hosts = host_info(host_id, num_hosts)
    if num_hosts <= 1:
        return list(files)
    return list(files[host_id::num_hosts])


def local_mesh():
    """This host's ICI mesh (its local chips only).

    Per-host programs shard their batch over this mesh; there is no
    cross-host mesh because utterances are independent (SURVEY.md §2.9).
    """
    import jax

    from .mesh import make_mesh

    return make_mesh(jax.local_devices())
