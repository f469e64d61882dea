"""Export tests: traceable flat-state adapters, StableHLO round trips."""

import json

import numpy as np
import pytest
import jax.numpy as jnp

from dpdfnet_tpu import export as exp_lib
from dpdfnet_tpu.config import get_config
from dpdfnet_tpu.models import state as state_lib
from dpdfnet_tpu.models.dpdfnet import forward_spec
from dpdfnet_tpu.models.params import init_params


@pytest.fixture(scope="module")
def setup():
    cfg = get_config("dpdfnet2")
    return cfg, init_params(cfg, seed=0)


def test_jnp_flatten_matches_numpy_adapter(setup):
    cfg, params = setup
    rng = np.random.default_rng(0)
    spec = jnp.asarray(0.1 * rng.normal(size=(1, 9, cfg.freq_bins, 2)).astype(np.float32))
    _, st, _ = forward_spec(params, cfg, spec, state_lib.init_state(cfg, 1))
    flat_np = state_lib.flatten_state(cfg, st)
    flat_j = np.asarray(exp_lib._flatten_jnp(cfg, st))[0]
    np.testing.assert_allclose(flat_j, flat_np, atol=0)


def test_jnp_unflatten_roundtrip(setup):
    cfg, params = setup
    rng = np.random.default_rng(1)
    spec = jnp.asarray(0.1 * rng.normal(size=(1, 9, cfg.freq_bins, 2)).astype(np.float32))
    full, st, _ = forward_spec(params, cfg, spec, state_lib.init_state(cfg, 1))
    flat = exp_lib._flatten_jnp(cfg, st)
    restored = exp_lib._unflatten_jnp(cfg, flat)
    out_a, _, _ = forward_spec(params, cfg, spec, st)
    out_b, _, _ = forward_spec(params, cfg, spec, restored)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=0)


def test_stream_export_roundtrip(setup, tmp_path):
    cfg, params = setup
    path = exp_lib.export_stream(params, cfg, tmp_path / "m.stablehlo")
    meta = json.loads((tmp_path / "m.stablehlo.json").read_text())
    assert meta["state_size"] == state_lib.state_size(cfg)

    loaded = exp_lib.load_exported(path)
    init = exp_lib.build_initial_flat_state(meta)[None]
    rng = np.random.default_rng(2)
    frames = 0.1 * rng.normal(size=(6, 1, 1, cfg.freq_bins, 2)).astype(np.float32)

    # frame-by-frame through the exported artifact
    flat = jnp.asarray(init)
    outs = []
    for t in range(frames.shape[0]):
        o, flat = loaded.call(jnp.asarray(frames[t]), flat)
        outs.append(np.asarray(o))
    got = np.concatenate(outs, axis=1)

    # reference: direct forward over the same frames
    spec = jnp.asarray(frames[:, 0].transpose(1, 0, 2, 3))
    ref, _, _ = forward_spec(params, cfg, spec, state_lib.init_state(cfg, 1))
    np.testing.assert_allclose(got, np.asarray(ref), atol=1e-5)


def test_standalone_consumer_runs_artifact_without_model_code(setup, tmp_path):
    """The exported artifact + sidecar is a complete deployment contract:
    a fresh process running only ``examples/consume_stablehlo.py`` (jax +
    numpy, no dpdfnet_tpu imports) produces the same audio as the in-process
    streaming engine — the ONNX-interop equivalent the reference gets from
    onnxruntime (`package/src/dpdfnet/onnx_backend.py:52-107`)."""
    import os
    import subprocess
    import sys
    from pathlib import Path

    cfg, params = setup
    artifact = exp_lib.export_stream(params, cfg, tmp_path / "m.stablehlo")

    # consumer script must not touch package code
    script = Path(__file__).resolve().parent.parent / "examples" / \
        "consume_stablehlo.py"
    imports = [ln.strip() for ln in script.read_text().splitlines()
               if ln.strip().startswith(("import ", "from "))]
    assert imports and not any("dpdfnet" in ln for ln in imports), imports

    rng = np.random.default_rng(5)
    wav = (0.1 * rng.normal(size=cfg.sample_rate)).astype(np.float32)
    in_wav, out_wav = tmp_path / "in.wav", tmp_path / "out.wav"

    from dpdfnet_tpu.audio_io import read_wav, write_wav

    write_wav(in_wav, wav, cfg.sample_rate, subtype="PCM_16")
    env = dict(os.environ)
    env["CONSUMER_JAX_PLATFORM"] = "cpu"
    r = subprocess.run(
        [sys.executable, str(script), str(artifact), str(in_wav),
         str(out_wav)],
        capture_output=True, text=True, cwd=str(tmp_path), env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    got, sr = read_wav(out_wav)
    assert sr == cfg.sample_rate

    # in-process reference: the engine's streaming path on the same audio
    from dpdfnet_tpu.runtime.engine import Engine
    from dpdfnet_tpu.stream import StreamEnhancer

    quantized = np.asarray(read_wav(in_wav)[0], np.float32)
    se = StreamEnhancer(engine=Engine(cfg, params))
    ref = np.concatenate([se.process(quantized), se.flush()])
    n = min(got.shape[0], ref.shape[0])
    assert n > cfg.hop * 50
    # 16-bit output quantization dominates the tolerance
    np.testing.assert_allclose(got[:n], ref[:n], atol=2e-4)


def test_initial_flat_state_matches_pytree(setup):
    cfg, _ = setup
    st = state_lib.init_state(cfg, 1)
    flat_ref = state_lib.flatten_state(cfg, st)
    meta_like = {
        "state_size": state_lib.state_size(cfg),
        "erb_norm_state_size": cfg.nb_erb,
        "spec_norm_state_size": cfg.nb_df,
        "erb_norm_init": ",".join(str(float(v)) for v in np.asarray(st["erb_norm"])[0]),
        "spec_norm_init": ",".join(str(float(v)) for v in np.asarray(st["spec_norm"])[0]),
    }
    flat = exp_lib.build_initial_flat_state(meta_like)
    np.testing.assert_allclose(flat, flat_ref, atol=1e-7)
