"""DPDFNet-TPU: TPU-native speech enhancement framework.

A from-scratch JAX/XLA implementation with the capabilities of
ceva-ip/DPDFNet: the DPDFNet model family (DeepFilterNet2-style encoder/
decoder + dual-path RNN + ERB gains + multi-frame deep filtering), offline
and streaming inference, a model zoo, CLI, and evaluation tooling — built
around a single compiled per-utterance program instead of per-frame
ONNX/TFLite session calls.

Public API (parity with `/root/reference/package/src/dpdfnet/__init__.py`):
    enhance, enhance_file, enhance_batch, available_models, download,
    StreamEnhancer
"""

from __future__ import annotations

from typing import TYPE_CHECKING

__version__ = "0.1.0"

__all__ = [
    "enhance",
    "enhance_file",
    "enhance_batch",
    "available_models",
    "download",
    "StreamEnhancer",
    "__version__",
]

if TYPE_CHECKING:  # pragma: no cover
    from .api import available_models, download, enhance, enhance_batch, enhance_file
    from .stream import StreamEnhancer


def __getattr__(name: str):
    # Lazy imports keep `import dpdfnet_tpu` light (no jax init) — same
    # pattern as the reference's lazy facade.
    if name in {"enhance", "enhance_file", "enhance_batch", "available_models",
                "download"}:
        from . import api

        return getattr(api, name)
    if name == "StreamEnhancer":
        from .stream import StreamEnhancer

        return StreamEnhancer
    if name in {"serving", "train", "metrics", "export", "zoo", "config",
                "audio", "audio_io", "demo"}:
        import importlib

        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(f"module 'dpdfnet_tpu' has no attribute {name!r}")
