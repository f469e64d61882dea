"""Throughput benchmark: batched offline enhancement, xRT per chip.

The headline metric mirrors BASELINE.md: real-time factor (seconds of audio
enhanced per wall-clock second) for dpdfnet8_48khz_hr batched offline
enhancement on one chip; target >= 500x.
"""

from __future__ import annotations

import json
import time
from typing import Optional

import numpy as np


def run_bench(
    model: str = "dpdfnet8_48khz_hr",
    batch: int = 32,
    seconds: float = 10.0,
    reps: int = 5,
    random_weights: bool = True,
    precision: str = "highest",
    baseline_xrt: float = 500.0,
) -> str:
    """Returns one JSON line: {"metric", "value", "unit", "vs_baseline"}."""
    import jax

    from ..config import get_config
    from ..runtime.engine import Engine

    cfg = get_config(model)
    if random_weights:
        from ..models.params import init_params

        params = init_params(cfg, seed=0)
    else:
        from ..api import _get_engine

        params = _get_engine(model).params

    engine = Engine(cfg, params, precision=precision)
    S = int(seconds * cfg.sample_rate)
    rng = np.random.default_rng(0)
    wavs = rng.normal(size=(batch, S)).astype(np.float32) * 0.05

    # warmup (compile)
    engine.enhance_waveforms(wavs)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = engine.enhance_waveforms(wavs)
        jax.block_until_ready(out) if hasattr(out, "block_until_ready") else None
        times.append(time.perf_counter() - t0)
    wall = float(np.median(times))
    audio_s = batch * seconds
    xrt = audio_s / wall
    result = {
        "metric": f"xRT_per_chip_{model}_offline_b{batch}",
        "value": round(xrt, 2),
        "unit": "x_realtime",
        "vs_baseline": round(xrt / baseline_xrt, 4),
    }
    return json.dumps(result)
