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
