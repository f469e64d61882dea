"""Benchmark-tooling regression tests (CPU, tiny shapes).

The bench functions are the driver's measurement contract (one JSON line
with metric/value/unit/vs_baseline) — pin the schema, the quality-tier
resolution, and the cadence measurement path.
"""

import json

import numpy as np
import pytest

from dpdfnet_tpu.runtime.bench import run_bench, run_stream_bench


def test_run_bench_resolves_quality_tier():
    out = json.loads(run_bench(model="baseline", batch=2, seconds=0.3,
                               reps=1, random_weights=True,
                               precision="turbo"))
    assert out["metric"].endswith("_b2_turbo")
    assert out["unit"] == "x_realtime"
    assert out["value"] > 0 and out["vs_baseline"] > 0


def test_run_bench_raw_precision_label():
    out = json.loads(run_bench(model="baseline", batch=2, seconds=0.3,
                               reps=1, random_weights=True,
                               precision="default"))
    assert out["metric"].endswith("_b2_default")


@pytest.mark.parametrize("mode", ["exact", "throughput"])
def test_stream_bench_cadence_schema(mode):
    out = json.loads(run_stream_bench(
        model="baseline", streams=2, seconds=0.3,
        mode=mode, hops_per_call=2, precision="fast"))
    assert out["unit"] == "ms_per_hop"
    assert out["hops_per_call"] == 2
    assert out["buffering_latency_ms"] == pytest.approx(20.0)
    assert out["realtime_stream_capacity_est"] >= 0
    assert np.isfinite(out["value"]) and out["value"] > 0
