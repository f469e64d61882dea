"""Test configuration: run JAX on CPU with 8 virtual devices.

Multi-chip sharding tests use this virtual mesh (the driver separately
dry-runs the multi-chip path); numerical parity tests are platform-agnostic
and much faster on CPU than paying TPU compile latency per test.
"""

import os
import sys

# Must be set before jax initialises its backends.  The container's
# sitecustomize imports jax at interpreter start, so the env var alone is
# not enough — use the config API, which works until backends are created.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# Persistent compilation cache: model-forward CPU compiles dominate suite
# time (especially on small containers); cache them across runs.
from dpdfnet_tpu.utils import compile_cache  # noqa: E402

compile_cache.enable()

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bounded_jit_state():
    """Release compiled executables between test modules.

    A full-suite run accumulates hundreds of live XLA:CPU executables in
    one process; past ~160 compiles the CPU client has been observed to
    segfault inside compilation / cache deserialization (order-dependent,
    not reproducible on any subset).  Modules rarely share programs, so
    dropping the jit caches at module boundaries bounds process state at
    negligible recompile cost.
    """
    yield
    jax.clear_caches()


REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "onnx_model"))


def add_reference_paths() -> None:
    """Make the read-only reference repo importable (for parity gates only)."""
    for p in (REFERENCE_ROOT,):
        if p not in sys.path:
            sys.path.insert(0, p)
