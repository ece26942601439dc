"""Multi-host wiring (tpuseg.parallel.distributed) on the virtual CPU mesh.

Real DCN spans can't exist in CI; what is tested here is everything that
can go wrong *per host*: hybrid-mesh layout (hosts contiguous on the data
axis), the per-host batch slice arithmetic, and the local->global batch
assembly the prefetcher uses. The trainer calls these exact functions when
``jax.process_count() > 1``, so multi-host correctness reduces to them.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from tpuseg.parallel import distributed, mesh as mesh_lib


def test_make_hybrid_mesh_shapes():
    m = distributed.make_hybrid_mesh()
    assert m.axis_names == ("data", "spatial")
    assert m.devices.shape == (8, 1)
    m2 = distributed.make_hybrid_mesh(ici_spatial=2)
    assert m2.devices.shape == (4, 2)
    with pytest.raises(ValueError):
        distributed.make_hybrid_mesh(ici_spatial=3)


def test_hybrid_mesh_hosts_contiguous():
    """Devices must be ordered by (process_index, id) so each host's block
    is adjacent on the data axis."""
    m = distributed.make_hybrid_mesh()
    flat = list(m.devices.flat)
    keys = [(d.process_index, d.id) for d in flat]
    assert keys == sorted(keys)


def test_process_local_batch_math(monkeypatch):
    # single process: full batch
    assert distributed.process_local_batch_size(32) == 32
    assert distributed.process_local_batch_slice(32) == slice(0, 32)

    # simulate host 2 of 4
    monkeypatch.setattr(jax, "process_count", lambda: 4)
    monkeypatch.setattr(jax, "process_index", lambda: 2)
    assert distributed.process_local_batch_size(32) == 8
    assert distributed.process_local_batch_slice(32) == slice(16, 24)
    with pytest.raises(ValueError):
        distributed.process_local_batch_size(30)


def test_global_batch_from_local_single_host():
    mesh = distributed.make_hybrid_mesh()
    sharding = NamedSharding(mesh, P("data"))
    local = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
    arr = distributed.global_batch_from_local(local, sharding)
    assert arr.shape == (8, 4)
    assert arr.sharding == sharding
    np.testing.assert_array_equal(np.asarray(arr), local)


def test_trainer_runs_on_hybrid_mesh_sharding():
    """A full sharded train step through the hybrid mesh + raw batch
    sharding + prefetch-style assembly — the exact composition the trainer
    builds under multi-host."""
    from tpuseg.models.unet import UNet
    from tpuseg.train.steps import create_train_state

    mesh = distributed.make_hybrid_mesh()
    model = UNet(num_classes=2, base_features=2, dtype=jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0), 1, 1e-3)
    tstep, _ = mesh_lib.make_parallel_raw_steps(model, mesh, 2, augment=False)
    state = mesh_lib.shard_state(state, mesh)

    sharding = mesh_lib.raw_batch_sharding(mesh)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 1000, size=(8, 32, 32, 1)).astype(np.uint16)
    msk = (img[..., 0] > 500).astype(np.uint8)
    pimg = distributed.global_batch_from_local(img, sharding)
    pmsk = distributed.global_batch_from_local(msk, sharding)
    state, metrics = tstep(state, pimg, pmsk)
    assert np.isfinite(float(metrics["loss"]))


def test_hybrid_mesh_rejects_host_straddling_spatial(monkeypatch):
    """A spatial group spanning hosts would break the data axis's process
    contiguity (and put conv halos on DCN) — fail fast (review r3)."""
    monkeypatch.setattr(jax, "local_device_count", lambda: 2)
    with pytest.raises(ValueError, match="straddle"):
        distributed.make_hybrid_mesh(ici_spatial=4)


def test_process_local_batch_checks_data_shards(monkeypatch):
    """A per-host batch that doesn't split across the host's data shards
    must fail here with the numbers named, not deep inside the prefetch
    thread (review r3). 8 devices / 4 hosts -> 2 shards per host."""
    monkeypatch.setattr(jax, "process_count", lambda: 4)
    assert distributed.process_local_batch_size(16) == 4
    with pytest.raises(ValueError, match="data shards per host"):
        distributed.process_local_batch_size(12)  # per-host 3 over 2 shards
    # spatial meshes shard the batch over fewer devices: 12 is fine there
    assert distributed.process_local_batch_size(12, data_shards=4) == 3
