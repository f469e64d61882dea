"""Multi-stream serving pool tests: per-slot isolation and StreamEnhancer
equivalence."""

import numpy as np
import pytest

from dpdfnet_tpu.config import get_config
from dpdfnet_tpu.models.params import init_params
from dpdfnet_tpu.runtime.engine import Engine
from dpdfnet_tpu.serving import MultiStreamEnhancer
from dpdfnet_tpu.stream import StreamEnhancer


@pytest.fixture(scope="module")
def engine():
    cfg = get_config("dpdfnet2")
    return Engine(cfg, init_params(cfg, seed=0))


def _sig(seed, n=3200):
    rng = np.random.default_rng(seed)
    return (0.1 * rng.normal(size=n)).astype(np.float32)


def test_pool_matches_single_stream(engine):
    """Each pool slot must produce exactly what a solo StreamEnhancer does."""
    pool = MultiStreamEnhancer(capacity=4, engine=engine)
    a, b = pool.open(), pool.open()
    xa, xb = _sig(1), _sig(2)

    out_a = [pool.process(a, xa[:1600])]
    out_b = [pool.process(b, xb[:900])]
    # batched step: both streams advance in one call
    many = pool.process_many({a: xa[1600:], b: xb[900:2500]})
    out_a.append(many[a])
    out_b.append(many[b])
    out_b.append(pool.process(b, xb[2500:]))
    out_a.append(pool.flush(a))
    out_b.append(pool.flush(b))

    ref_a = StreamEnhancer(engine=engine)
    ra = np.concatenate([ref_a.process(xa), ref_a.flush()])
    ref_b = StreamEnhancer(engine=engine)
    rb = np.concatenate([ref_b.process(xb), ref_b.flush()])

    # solo StreamEnhancer runs a batch-1 program; the pool runs a
    # batch-capacity program — row-independent math, fp-noise differences
    np.testing.assert_allclose(np.concatenate(out_a), ra, atol=1e-5)
    np.testing.assert_allclose(np.concatenate(out_b), rb, atol=1e-5)


def test_pool_slot_isolation_on_reset(engine):
    pool = MultiStreamEnhancer(capacity=3, engine=engine)
    a, b = pool.open(), pool.open()
    x = _sig(3)
    ya1 = pool.process(a, x)
    pool.process(b, _sig(4))
    pool.reset(a)
    ya2 = pool.process(a, x)
    np.testing.assert_array_equal(ya1, ya2)      # reset really cleared slot a
    # b unaffected by a's reset: continue and compare vs solo (tolerance:
    # different batch shape)
    yb2 = pool.process(b, _sig(4))
    ref = StreamEnhancer(engine=engine)
    rb = np.concatenate([ref.process(_sig(4)), ref.process(_sig(4))])
    np.testing.assert_allclose(yb2, rb[rb.size - yb2.size:], atol=1e-5)


def test_throughput_mode_matches_exact(engine):
    """The time-vectorised serving mode must match the bit-invariant
    per-frame program to fp-reordering tolerance, state carry included."""
    cfg = engine.cfg
    rng = np.random.default_rng(7)
    B, T = 3, 11
    frames = (0.1 * rng.normal(size=(B, T, cfg.win_len))).astype(np.float32)

    st_e = engine.init_stream_state(batch=B)
    y_e, st_e = engine.process_frames(frames, st_e)                # exact
    st_t = engine.init_stream_state(batch=B)
    y_t, st_t = engine.process_frames(frames, st_t, mode="throughput")
    np.testing.assert_allclose(y_t, y_e, atol=2e-5)

    # carried state equivalent: a second exact call from either state agrees
    more = (0.1 * rng.normal(size=(B, 2, cfg.win_len))).astype(np.float32)
    y2_e, _ = engine.process_frames(more, st_e)
    y2_t, _ = engine.process_frames(more, st_t)
    np.testing.assert_allclose(y2_t, y2_e, atol=2e-5)

    with pytest.raises(ValueError, match="mode"):
        engine.process_frames(more, engine.init_stream_state(batch=B),
                              mode="banana")


def test_pool_throughput_mode(engine):
    """A throughput-mode pool stays within fp tolerance of an exact pool."""
    x = _sig(11)
    outs = {}
    for mode in ("exact", "throughput"):
        pool = MultiStreamEnhancer(capacity=2, engine=engine, mode=mode)
        sid = pool.open()
        outs[mode] = np.concatenate(
            [pool.process(sid, x), pool.flush(sid)])
    assert outs["exact"].shape == outs["throughput"].shape
    np.testing.assert_allclose(outs["throughput"], outs["exact"], atol=2e-5)


def test_pool_capacity_exhaustion(engine):
    pool = MultiStreamEnhancer(capacity=2, engine=engine)
    pool.open(), pool.open()
    with pytest.raises(RuntimeError, match="busy"):
        pool.open()


def test_pool_close_frees_slot(engine):
    pool = MultiStreamEnhancer(capacity=1, engine=engine)
    sid = pool.open()
    pool.close(sid)
    sid2 = pool.open()
    assert sid2 == sid
    with pytest.raises(ValueError):
        pool.process(99, np.zeros(10, np.float32))


def test_process_many_order_insensitive_identity(engine):
    """A full pool fed in any dict order must match slot-order feeding
    (the zero-copy identity fast path sorts slots; outputs are
    slot-deterministic either way)."""
    hop = engine.cfg.hop
    xs = {i: _sig(10 + i, 4 * hop) for i in range(3)}

    pool_a = MultiStreamEnhancer(capacity=3, engine=engine)
    for _ in range(3):
        pool_a.open()
    out_a = pool_a.process_many({i: xs[i] for i in (0, 1, 2)})

    pool_b = MultiStreamEnhancer(capacity=3, engine=engine)
    for _ in range(3):
        pool_b.open()
    out_b = pool_b.process_many({i: xs[i] for i in (2, 0, 1)})

    for i in range(3):
        np.testing.assert_array_equal(out_a[i], out_b[i])


def test_process_many_invalid_sid_is_atomic(engine):
    """A bad sid anywhere in the dict must leave every stream's buffer
    untouched, so the caller can retry the corrected dict without
    duplicating audio in live streams."""
    hop = engine.cfg.hop
    pool = MultiStreamEnhancer(capacity=2, engine=engine)
    sid = pool.open()
    x = _sig(30, 6 * hop)

    ref_pool = MultiStreamEnhancer(capacity=2, engine=engine)
    ref_sid = ref_pool.open()
    ref = ref_pool.process(ref_sid, x)

    with pytest.raises(ValueError):
        pool.process_many({sid: x, 99: x})       # 99 was never opened
    got = pool.process(sid, x)                   # retry: must not duplicate
    np.testing.assert_array_equal(got, ref)
