"""Streaming engine behaviour tests (ported from the reference suite §4:
block-size invariance, buffering/latency edges, flush/reset semantics,
COLA reconstruction, offline-vs-streaming consistency)."""

import numpy as np
import pytest

from dpdfnet_tpu.config import get_config
from dpdfnet_tpu.models.params import init_params
from dpdfnet_tpu.runtime.engine import Engine
from dpdfnet_tpu.stream import StreamEnhancer


@pytest.fixture(scope="module")
def engine():
    cfg = get_config("dpdfnet2")
    return Engine(cfg, init_params(cfg, seed=0))


@pytest.fixture(scope="module")
def signal():
    rng = np.random.default_rng(0)
    return (0.1 * rng.normal(size=4800)).astype(np.float32)


def _run_chunked(engine, x, sizes):
    se = StreamEnhancer(engine=engine)
    outs, pos, i = [], 0, 0
    while pos < len(x):
        n = sizes[i % len(sizes)]
        i += 1
        outs.append(se.process(x[pos: pos + n]))
        pos += n
    outs.append(se.flush())
    return np.concatenate(outs)


def test_block_size_invariance(engine, signal):
    """Outputs must bit-match a 1-sample-at-a-time run for any chunking
    (reference test_package_behaviors.py:494-520)."""
    ref = _run_chunked(engine, signal, [1])
    for sizes in ([7], [64], [160], [171], [320], [512], [1000], [3, 333, 61]):
        got = _run_chunked(engine, signal, sizes)
        assert got.shape == ref.shape
        np.testing.assert_array_equal(got, ref)


def test_no_output_until_full_window(engine):
    se = StreamEnhancer(engine=engine)
    win = se._win_len
    assert se.process(np.zeros(win - 1, np.float32)).size == 0
    assert se.process(np.zeros(1, np.float32)).size > 0


def test_flush_returns_at_most_one_hop(engine, signal):
    se = StreamEnhancer(engine=engine)
    se.process(signal[: se._win_len + 13])
    out = se.flush()
    assert 0 < out.size <= se._hop_size


def test_flush_empty_buffer(engine):
    se = StreamEnhancer(engine=engine)
    assert se.flush().size == 0


def test_reset_clears_state(engine, signal):
    se = StreamEnhancer(engine=engine)
    a = se.process(signal)
    se.reset()
    b = se.process(signal)
    np.testing.assert_array_equal(a, b)


def test_sample_rate_change_raises(engine, signal):
    se = StreamEnhancer(engine=engine)
    se.process(signal[:100], sample_rate=16000)
    with pytest.raises(ValueError):
        se.process(signal[:100], sample_rate=48000)


def test_stereo_to_mono(engine, signal):
    se = StreamEnhancer(engine=engine)
    stereo = np.stack([signal, signal], axis=1)
    a = se.process(stereo)
    se.reset()
    b = se.process(signal)
    np.testing.assert_array_equal(a, b)


def test_empty_chunk(engine):
    se = StreamEnhancer(engine=engine)
    assert se.process(np.zeros(0, np.float32)).size == 0


def test_resampled_stream_runs(engine):
    se = StreamEnhancer(engine=engine)
    rng = np.random.default_rng(1)
    chunk = (0.1 * rng.normal(size=4800)).astype(np.float32)
    out = se.process(chunk, sample_rate=48000)   # resampled 48k -> 16k inside
    assert out.dtype == np.float32
    # output comes back at the caller rate (3x the model-rate output length)
    assert out.size > 0


def test_flush_after_resampled_stream(engine):
    """flush() must drain a stream that was fed at a non-model rate.

    The reference raises here (its flush calls process(pad, model_sr) which
    trips the SR-consistency check, `package/src/dpdfnet/stream.py:188-189`);
    this framework drains correctly and returns output at the caller rate.
    """
    se = StreamEnhancer(engine=engine)
    rng = np.random.default_rng(7)
    chunk = (0.1 * rng.normal(size=4801)).astype(np.float32)  # odd length
    out = se.process(chunk, sample_rate=48000)
    tail = se.flush()
    assert tail.dtype == np.float32
    # at most one model hop, expressed at the 48 kHz caller rate (3x)
    assert 0 < tail.size <= 3 * se._hop_size
    # the stream stays usable for further processing after flush
    more = se.process(chunk, sample_rate=48000)
    assert more.size > 0


def test_engine_progress_callback_fires_per_segment(engine):
    """The stepped offline path reports monotonic per-segment progress and
    produces the same audio as the fused single-program path."""
    rng = np.random.default_rng(11)
    # long enough to span several 112-frame segments (2.5 s @ 16 kHz)
    x = (0.1 * rng.normal(size=40000)).astype(np.float32)
    ref = engine.enhance_waveforms(x)
    events = []
    got = engine.enhance_waveforms(
        x, progress_callback=lambda d, t: events.append((d, t)))
    np.testing.assert_allclose(got, ref, atol=1e-5)
    assert len(events) >= 4            # 0% + one event per segment
    assert events[0][0] == 0
    assert events[-1][0] == events[-1][1] > 0
    dones = [d for d, _ in events]
    assert dones == sorted(dones)


def test_offline_engine_matches_streaming_math(engine, signal):
    """The offline jitted pipeline and the streaming path run the same model;
    their outputs agree sample-for-sample once aligned (offline output is
    advanced by 2*win_len; streaming has a one-window analysis latency and
    uses causal framing, so compare the overlapping enhanced region)."""
    cfg = engine.cfg
    win, hop = cfg.win_len, cfg.hop
    off = engine.enhance_waveforms(signal)

    se = StreamEnhancer(engine=engine)
    stream_out = np.concatenate([se.process(signal), se.flush()])

    # The offline path advances its output by 2*win_len (= 4 hops) while the
    # streaming path keeps the model's 4-frame processing delay in-line, so
    # streaming lags offline by exactly 4 hops.  The two use different STFT
    # conventions (center=True reflect vs causal), so compare by correlation
    # over the overlap, not bit equality — same caveat as the reference
    # documents (package/src/dpdfnet/stream.py:23-28).
    lag = 4 * hop
    off_seg = off[: stream_out.size - lag]
    st_seg = stream_out[lag:]
    n = min(off_seg.size, st_seg.size)
    off_seg, st_seg = off_seg[:n], st_seg[:n]
    denom = np.linalg.norm(off_seg) * np.linalg.norm(st_seg)
    assert denom > 0
    corr = float(np.dot(off_seg, st_seg) / denom)
    assert corr > 0.99, corr


def test_save_load_state_resumes_bit_exact(engine, signal):
    se = StreamEnhancer(engine=engine)
    out_a1 = se.process(signal[:2000])
    snap = se.save_state()
    out_a2 = se.process(signal[2000:])

    se2 = StreamEnhancer(engine=engine)
    se2.load_state(snap)
    out_b2 = se2.process(signal[2000:])
    np.testing.assert_array_equal(out_a2, out_b2)


def test_save_state_is_a_deep_snapshot(engine, signal):
    se = StreamEnhancer(engine=engine)
    se.process(signal[:2000])
    snap = se.save_state()
    se.process(signal[2000:4000])          # keep mutating the live stream
    se2 = StreamEnhancer(engine=engine)
    se2.load_state(snap)
    se3 = StreamEnhancer(engine=engine)
    se3.process(signal[:2000])
    a = se2.process(signal[2000:4000])
    b = se3.process(signal[2000:4000])
    np.testing.assert_array_equal(a, b)


def test_hr_stream_block_size_invariance():
    """48 kHz HR model: chunked streaming is bit-exact too (small T)."""
    cfg48 = get_config("dpdfnet2_48khz_hr")
    eng48 = Engine(cfg48, init_params(cfg48, seed=1))
    rng = np.random.default_rng(5)
    x = (0.1 * rng.normal(size=4800)).astype(np.float32)   # 0.1 s @ 48 kHz
    a = _run_chunked(eng48, x, [480])
    b = _run_chunked(eng48, x, [333])
    np.testing.assert_array_equal(a, b)
    assert a.shape == x.shape


def test_block_size_invariance_turbo_tier():
    """Exact-mode bit-invariance must hold for the bf16 'turbo' tier too:
    the per-frame scan runs an identical op sequence per frame regardless
    of compute dtype (the round-2 bf16-plane kernels changed the kernel
    IO dtypes — this pins the streaming contract across tiers)."""
    from dpdfnet_tpu.runtime.engine import engine_from_quality

    cfg = get_config("dpdfnet2")
    eng = engine_from_quality(cfg, init_params(cfg, seed=0), quality="turbo")
    rng = np.random.default_rng(1)
    x = (0.1 * rng.normal(size=3200)).astype(np.float32)
    ref = _run_chunked(eng, x, [160])
    for sizes in ([64], [171], [320], [3, 333, 61]):
        got = _run_chunked(eng, x, sizes)
        assert got.shape == ref.shape
        np.testing.assert_array_equal(got, ref)


def test_offline_exact_bucket_length_tail_nonzero(engine):
    """An utterance exactly one length bucket long must get real enhanced
    audio in its final win_len samples — the pipeline's valid output is
    S_pad - win_len, so the bucket has to clear S by win_len (regression:
    the tail of exact-bucket-length clips came back as silence)."""
    sr = engine.cfg.sample_rate
    rng = np.random.default_rng(7)
    x = (0.1 * rng.normal(size=engine.bucket_samples)).astype(np.float32)
    y = engine.enhance_waveforms(x)
    assert y.shape == x.shape
    tail = y[-engine.cfg.win_len:]
    assert np.abs(tail).max() > 0.0
