"""Multi-chip (virtual 8-device CPU mesh) sharding tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dpdfnet_tpu.config import get_config
from dpdfnet_tpu.models.params import init_params
from dpdfnet_tpu.models.state import init_state
from dpdfnet_tpu.parallel import mesh as pmesh

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)


@pytest.fixture(scope="module")
def setup():
    cfg = get_config("dpdfnet2")
    params = init_params(cfg, seed=0)
    mesh = pmesh.make_mesh(jax.devices()[:8])
    return cfg, params, mesh


def test_sharded_offline_matches_single_device(setup):
    cfg, params, mesh = setup
    B, S = 8, cfg.hop * 8
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.normal(size=(B, S)).astype(np.float32) * 0.1)

    fn = pmesh.make_sharded_enhance(cfg, mesh, bucket_s=S / cfg.sample_rate)
    out_sharded = np.asarray(
        fn(params, jax.device_put(wav, pmesh.batch_sharding(mesh))))

    # single-device reference through the same math
    from dpdfnet_tpu.runtime.engine import Engine

    eng = Engine(cfg, params, bucket_s=S / cfg.sample_rate)
    ref = eng.enhance_waveforms(np.asarray(wav))
    n = min(out_sharded.shape[1], ref.shape[1])
    np.testing.assert_allclose(out_sharded[:, :n], ref[:, :n], atol=1e-5)


def test_mesh_engine_matches_single_device_same_code_path(setup):
    """Engine(mesh=...) must produce the same audio as Engine() — the
    multi-chip path IS the tuned engine, not a parallel implementation."""
    from dpdfnet_tpu.runtime.engine import Engine

    cfg, params, mesh = setup
    B, S = 8, cfg.hop * 8
    rng = np.random.default_rng(3)
    wav = (0.1 * rng.normal(size=(B, S))).astype(np.float32)

    eng1 = Engine(cfg, params)
    engm = Engine(cfg, params, mesh=mesh)
    ref = eng1.enhance_waveforms(wav)
    got = engm.enhance_waveforms(wav)
    np.testing.assert_allclose(got, ref, atol=1e-5)

    # non-multiple batch sizes are padded up transparently
    got5 = engm.enhance_waveforms(wav[:5])
    np.testing.assert_allclose(got5, ref[:5], atol=1e-5)


def test_mesh_engine_streaming_matches_single_device(setup):
    """process_frames through a sharded engine == single-device engine."""
    from dpdfnet_tpu.runtime.engine import Engine

    cfg, params, mesh = setup
    B = 8
    rng = np.random.default_rng(4)
    frames = (0.1 * rng.normal(size=(B, 3, cfg.win_len))).astype(np.float32)

    eng1 = Engine(cfg, params)
    engm = Engine(cfg, params, mesh=mesh)
    y1, st1 = eng1.process_frames(frames, eng1.init_stream_state(batch=B))
    ym, stm = engm.process_frames(frames, engm.init_stream_state(batch=B))
    np.testing.assert_allclose(ym, y1, atol=1e-5)

    # second call carries state identically
    y1b, _ = eng1.process_frames(frames, st1)
    ymb, _ = engm.process_frames(frames, stm)
    np.testing.assert_allclose(ymb, y1b, atol=1e-5)


def test_mesh_engine_rejects_bad_stream_batch(setup):
    from dpdfnet_tpu.runtime.engine import Engine

    cfg, params, mesh = setup
    engm = Engine(cfg, params, mesh=mesh)
    with pytest.raises(ValueError, match="multiple of the mesh"):
        engm.init_stream_state(batch=3)


def test_sharded_stream_state_carry(setup):
    cfg, params, mesh = setup
    step = pmesh.make_sharded_stream_step(cfg, mesh)
    B = 8
    st = pmesh.shard_batch(mesh, init_state(cfg, batch=B))
    rng = np.random.default_rng(1)
    spec = jnp.asarray(rng.normal(size=(B, 3, cfg.freq_bins, 2)).astype(np.float32))
    o1, st = step(params, spec, st)
    o2, st = step(params, spec, st)
    assert bool(jnp.isfinite(o2).all())
    # state actually evolved
    assert float(jnp.abs(o2 - o1).max()) > 0


def test_mesh_engine_turbo_tier_matches_single_device(setup):
    """The bf16-activation turbo tier must shard identically: bf16 state
    placement, bf16 plane kernels (XLA path on CPU), per-shard programs
    equal to the single-device ones."""
    from dpdfnet_tpu.runtime.engine import engine_from_quality

    cfg, params, mesh = setup
    B, S = 8, cfg.hop * 8
    rng = np.random.default_rng(9)
    wav = (0.1 * rng.normal(size=(B, S))).astype(np.float32)

    eng1 = engine_from_quality(cfg, params, quality="turbo",
                               bucket_s=S / cfg.sample_rate)
    engm = engine_from_quality(cfg, params, quality="turbo", mesh=mesh,
                               bucket_s=S / cfg.sample_rate)
    ref = eng1.enhance_waveforms(wav)
    got = engm.enhance_waveforms(wav)
    # bf16-scale tolerance: per-shard batch is 1 vs 8, so XLA tiles the
    # dots differently and the f32 accumulation-order noise is amplified
    # by the bf16 activation rounding (~1e-4 abs at these levels).  The
    # f32 tiers compare at 1e-5 in the sibling test.
    np.testing.assert_allclose(got, ref, atol=1e-3)

    # streaming with carried bf16 state on the mesh
    frames = (0.05 * rng.normal(size=(8, 2, cfg.win_len))).astype(np.float32)
    st1 = eng1.init_stream_state(batch=8)
    stm = engm.init_stream_state(batch=8)
    y1, _ = eng1.process_frames(frames, st1)
    ym, _ = engm.process_frames(frames, stm)
    np.testing.assert_allclose(ym, y1, atol=1e-3)
