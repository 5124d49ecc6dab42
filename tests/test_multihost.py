"""Multi-host data placement logic (parallel/multihost.py) with mocked
process topologies — a real pod is unavailable, so the deterministic
slice-assignment logic is what gets pinned here (VERDICT r2 item 5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chromegcn_tpu.parallel import multihost
from chromegcn_tpu.parallel.mesh import make_mesh, node_sharding


class FakeDev:
    def __init__(self, pid):
        self.process_index = pid


class FakeSharding:
    """devices_indices_map stub: n_dev devices, rows split evenly, device i
    owned by process pids[i]."""

    def __init__(self, pids):
        self.pids = pids

    def devices_indices_map(self, shape):
        n = shape[0]
        per = n // len(self.pids)
        return {
            FakeDev(pid): (slice(i * per, (i + 1) * per),)
            + (slice(None),) * (len(shape) - 1)
            for i, pid in enumerate(self.pids)
        }


def test_local_row_range_two_hosts(monkeypatch):
    sh = FakeSharding([0, 0, 1, 1])
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    assert multihost.local_row_range(sh, (512, 128)) == (0, 256)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    assert multihost.local_row_range(sh, (512, 128)) == (256, 512)


def test_local_row_range_four_hosts(monkeypatch):
    sh = FakeSharding([0, 1, 2, 3])
    for pid in range(4):
        monkeypatch.setattr(jax, "process_index", lambda p=pid: p)
        assert multihost.local_row_range(sh, (1024,)) == (pid * 256, (pid + 1) * 256)


def test_local_row_range_rejects_noncontiguous(monkeypatch):
    # interleaved ownership (not produced by parallel.mesh) must fail loudly
    sh = FakeSharding([0, 1, 0, 1])
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    with pytest.raises(ValueError, match="not contiguous"):
        multihost.local_row_range(sh, (512,))


def test_local_row_range_rejects_foreign_process(monkeypatch):
    sh = FakeSharding([0, 0])
    monkeypatch.setattr(jax, "process_index", lambda: 7)
    with pytest.raises(ValueError, match="owns no devices"):
        multihost.local_row_range(sh, (128,))


def test_put_global_single_process_equals_device_put():
    mesh = make_mesh(8, axis="graph")
    sharding = node_sharding(mesh)
    x = np.arange(16 * 4, dtype=np.float32).reshape(16, 4)
    out = multihost.put_global(x, sharding)
    np.testing.assert_array_equal(np.asarray(out), x)
    assert out.sharding.is_equivalent_to(sharding, 2)


def test_put_global_multi_process_slices_local_rows(monkeypatch):
    """With a mocked 2-process world, put_global must hand
    make_array_from_process_local_data exactly this process's contiguous
    row slice."""
    mesh = make_mesh(8, axis="graph")
    sharding = node_sharding(mesh)
    x = np.arange(32 * 2, dtype=np.float32).reshape(32, 2)
    captured = {}

    def fake_make(shd, local, global_shape):
        captured["local"] = np.asarray(local)
        captured["global_shape"] = global_shape
        return local  # placement itself is out of scope for this test

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    monkeypatch.setattr(
        jax, "make_array_from_process_local_data", fake_make
    )
    # all 8 CPU devices report process_index 0, so "process 0" owns all rows
    multihost.put_global(x, sharding)
    np.testing.assert_array_equal(captured["local"], x)
    assert captured["global_shape"] == (32, 2)

    # already-local shard: global extent = local rows x process_count, and
    # the derived shape must agree with the sharding's row assignment — use
    # a consistent 2-process fake (this process owns the first half)
    fake = FakeSharding([0, 1])
    multihost.put_global(x[:16], fake, already_local=True)
    np.testing.assert_array_equal(captured["local"], x[:16])
    assert captured["global_shape"] == (32, 2)

    # inconsistent layout (sharding assigns this process ALL 24 derived
    # rows, local shard has 12): fail loudly instead of fabricating a
    # consistent-but-wrong global shape (ADVICE r3)
    with pytest.raises(ValueError, match="already_local shard"):
        multihost.put_global(x[:12], sharding, already_local=True)


def test_host_batch_slice(monkeypatch):
    sh = FakeSharding([0, 0, 1, 1])
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    assert multihost.host_batch_slice(64, sh) == (32, 64)
