"""Persistent XLA compilation cache (process-wide, on-disk).

TPU compiles in this project's deployment go through a remote-compile
service at minutes per program shape; the reference's ONNX-runtime had no
analogous cost (its "compile" is session load).  Enabling JAX's persistent
compilation cache makes every program shape a one-time cost per machine —
verified to work through the axon relay (first compile ~70 s, cached
~0.3 s) and for CPU test runs alike.

Enabled automatically by the runtime engine, the benchmarks and the test
suite.  Opt out with ``DPDFNET_TPU_COMPILE_CACHE=0``; point elsewhere with
``DPDFNET_TPU_COMPILE_CACHE=/path``.
"""

from __future__ import annotations

import os

_done = False


def enable(path: str | None = None) -> str | None:
    """Idempotently enable the persistent compilation cache.

    Returns the cache directory, or None when disabled.
    """
    global _done
    env = os.environ.get("DPDFNET_TPU_COMPILE_CACHE")
    if env in ("0", "false", "False", "off"):
        return None
    if _done:
        # report the directory ACTUALLY configured on the first call (it
        # may be a host-app cache we respected, not our candidate path)
        try:
            import jax

            return jax.config.jax_compilation_cache_dir
        except Exception:
            return _cache_dir(path, env)
    target = _cache_dir(path, env)
    try:
        import jax

        existing = jax.config.jax_compilation_cache_dir
        if existing and existing != target:
            # the host application configured its own cache — respect it
            _done = True
            return existing
        os.makedirs(target, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", target)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        return None
    _done = True
    return target


def _cache_dir(path: str | None, env: str | None) -> str:
    if path:
        return path
    # "1"/"true"/"on" mean "enable with the default path" (matching the
    # 0/1 idiom of the other DPDFNET_TPU_* knobs); anything else is a path.
    if env and env not in ("1", "true", "True", "on"):
        return env
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache")
    # Salt the path with the host CPU feature set: XLA:CPU AOT artifacts
    # embed target-machine features but the cache key does not — loading
    # an artifact compiled on a different host type warns "could lead to
    # execution errors such as SIGILL".  Same machine type -> same salt.
    return os.path.join(base, "dpdfnet_tpu", f"jax_cache_{_cpu_salt()}")


def _cpu_salt() -> str:
    import hashlib
    import platform

    flags: list[str] = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = sorted(line.split(":", 1)[1].split())
                    break
    except OSError:
        pass
    blob = " ".join(flags) + platform.machine()
    return hashlib.sha256(blob.encode()).hexdigest()[:12]
