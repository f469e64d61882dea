"""Multi-host (DCN) file-sharding math + CLI wiring.

The hot path never crosses DCN (utterances are independent — SURVEY.md
§2.9); what must be correct is the deterministic disjoint cover of the
file list across hosts.  Reference scale-out analogue:
package/src/dpdfnet/cli.py:309 (thread pool over files).
"""

import numpy as np
import pytest

from dpdfnet_tpu.parallel import multihost


def test_disjoint_cover_all_host_counts():
    files = [f"f{i:03d}" for i in range(23)]
    for n in (1, 2, 3, 5, 8, 23, 40):
        shards = [multihost.shard_files_for_host(files, h, n)
                  for h in range(n)]
        flat = [f for s in shards for f in s]
        assert sorted(flat) == sorted(files)          # cover
        assert len(flat) == len(set(flat))            # disjoint
        sizes = [len(s) for s in shards]
        assert max(sizes) - min(sizes) <= 1           # balanced


def test_shards_preserve_sort_order():
    files = sorted(np.random.default_rng(0).integers(0, 10**6, 50).tolist())
    for h in range(4):
        shard = multihost.shard_files_for_host(files, h, 4)
        assert shard == sorted(shard)


def test_single_host_identity():
    files = ["a", "b", "c"]
    assert multihost.shard_files_for_host(files, 0, 1) == files


def test_host_info_env_and_validation(monkeypatch):
    monkeypatch.setenv("DPDFNET_TPU_HOST_ID", "2")
    monkeypatch.setenv("DPDFNET_TPU_NUM_HOSTS", "4")
    assert multihost.host_info() == (2, 4)
    # explicit args win over env
    assert multihost.host_info(1, 3) == (1, 3)
    monkeypatch.delenv("DPDFNET_TPU_HOST_ID")
    with pytest.raises(ValueError):
        multihost.host_info()                         # num_hosts without id
    with pytest.raises(ValueError):
        multihost.host_info(5, 4)                     # out of range
    monkeypatch.delenv("DPDFNET_TPU_NUM_HOSTS")
    hid, n = multihost.host_info()                    # falls back to jax
    assert (hid, n) == (0, 1)


def test_local_mesh_covers_local_devices():
    import jax

    mesh = multihost.local_mesh()
    assert mesh.size == len(jax.local_devices())


def test_cli_enhance_dir_host_sharding(tmp_path, monkeypatch, capsys):
    """Two manual hosts split a directory disjointly and their outputs
    union to the full set."""
    from dpdfnet_tpu import api, audio_io, cli
    from dpdfnet_tpu.config import get_config
    from tests.test_package_behaviors import FakeEngine

    eng = FakeEngine(get_config("dpdfnet2"))
    monkeypatch.setattr(api, "_get_engine", lambda *a, **k: eng)

    rng = np.random.default_rng(3)
    src = tmp_path / "in"
    src.mkdir()
    for i in range(5):
        audio_io.write_wav(src / f"u{i}.wav",
                           (0.1 * rng.normal(size=1600)).astype(np.float32),
                           16000)

    outs = []
    for host in range(2):
        out = tmp_path / f"out{host}"
        rc = cli.main(["enhance-dir", str(src), str(out),
                       "--num-hosts", "2", "--host-id", str(host)])
        assert rc == 0
        outs.append({p.name for p in out.glob("*_enhanced.wav")})
    assert outs[0].isdisjoint(outs[1])
    assert len(outs[0] | outs[1]) == 5
