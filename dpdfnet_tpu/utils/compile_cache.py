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

_UNPROBED = object()
_probe_result: object = _UNPROBED


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
    """Hash of everything XLA:CPU AOT artifacts are machine-specific on.

    XLA keys persistent-cache entries by HLO + compile options but NOT by
    the target machine; loading an artifact AOT-compiled for another host
    type warns "machine feature mismatch ... could lead to execution errors
    such as SIGILL".  The cpuinfo *flags* line alone is not enough: XLA's
    target features include LLVM tuning decisions (prefer-no-gather /
    prefer-no-scatter, amx variants, ...) that two hosts with identical
    cpuinfo can disagree on — observed in practice across this project's
    build machines.  So on the CPU backend the salt's primary input is a
    *probe compile*: build one trivial program into a scratch cache dir and
    hash the machine-feature list XLA itself embedded in the artifact.
    cpuinfo + toolchain version remain as fallback / extra discriminators.
    """
    import hashlib
    import platform

    parts: list[str] = [platform.machine()]
    feats = _probe_xla_cpu_features()
    if feats:
        parts.append(f"xla-cpu-features={feats}")
    # CPU identity fallback: flags + family/model/stepping + marketing name.
    wanted = ("flags", "cpu family", "model", "model name", "stepping",
              "vendor_id")
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                key, _, value = line.partition(":")
                key = key.strip()
                if key in wanted:
                    if key == "flags":
                        parts.append(" ".join(sorted(value.split())))
                    else:
                        parts.append(f"{key}={value.strip()}")
                if line.strip() == "":
                    break  # first core's block fully describes the machine
    except OSError:
        pass
    # Toolchain identity: artifact format is only stable within a release.
    try:
        import jax.version
        import jaxlib.version

        parts.append(f"jax={jax.version.__version__}")
        parts.append(f"jaxlib={jaxlib.version.__version__}")
    except Exception:
        pass
    blob = "\n".join(parts)
    return hashlib.sha256(blob.encode()).hexdigest()[:12]


def _probe_xla_cpu_features() -> str | None:
    """Ask XLA (not cpuinfo) what machine it AOT-compiles for on this host.

    Compiles one trivial program into a throwaway cache directory and pulls
    the ``+avx512f,...,+prefer-no-gather,...`` target-feature list out of
    the artifact XLA wrote (zstd-compressed proto; the list is the only
    long ``[+-]tok,[+-]tok,...`` ASCII run in it).  Only runs on the CPU
    backend — TPU executables are not host-machine-specific, and under the
    axon relay a probe compile would cost minutes.  ~0.5 s, once per
    process (enable() is idempotent).  Returns None when unavailable; the
    cpuinfo fallback in _cpu_salt still applies.
    """
    global _probe_result
    if _probe_result is not _UNPROBED:
        return _probe_result
    _probe_result = None  # one attempt per process, success or not

    import re
    import tempfile
    import time

    try:
        import jax

        if jax.default_backend() != "cpu":
            return None
        import numpy as np

        # jax's cache backend is a process-wide singleton bound to the dir
        # that was configured when it first initialized; reset it around the
        # probe so (a) the probe actually writes into the scratch dir and
        # (b) the real salted dir configured later gets a fresh backend
        # instead of one pointing at the deleted scratch dir.
        from jax._src import compilation_cache as jax_cc

        pat = re.compile(rb"[+\-][a-z0-9\-.]{2,24}(?:,[+\-][a-z0-9\-.]{2,24}){10,}")
        with tempfile.TemporaryDirectory() as td:
            prev_dir = jax.config.jax_compilation_cache_dir
            prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
            try:
                jax.config.update("jax_compilation_cache_dir", td)
                jax.config.update(
                    "jax_persistent_cache_min_compile_time_secs", 0.0)
                jax_cc.reset_cache()
                jax.jit(lambda x: x @ x).lower(
                    np.ones((8, 8), np.float32)).compile()
                # entries are written on a background thread — wait for the
                # artifact to land before the tempdir is torn down
                deadline = time.monotonic() + 10.0
                while not os.listdir(td) and time.monotonic() < deadline:
                    time.sleep(0.05)
            finally:
                jax.config.update("jax_compilation_cache_dir", prev_dir)
                jax.config.update(
                    "jax_persistent_cache_min_compile_time_secs", prev_min)
                try:
                    jax_cc.reset_cache()
                except Exception:
                    pass
            found: set[str] = set()
            for name in sorted(os.listdir(td)):
                with open(os.path.join(td, name), "rb") as f:
                    blob = f.read()
                try:
                    import zstandard

                    blob = zstandard.ZstdDecompressor().decompress(
                        blob, max_output_size=1 << 28)
                except Exception:
                    pass  # uncompressed artifact formats: scan raw bytes
                for m in pat.findall(blob):
                    found.add(m.decode())
            if found:
                _probe_result = "|".join(sorted(found))
    except Exception:
        return None
    return _probe_result
