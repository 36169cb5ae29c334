"""Multi-host launch glue (single-process behavior)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vla_touch_tpu.parallel import launch, mesh as mesh_lib

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_initialize_is_noop_single_host(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR", raising=False)
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    assert launch.initialize() is False


def test_host_local_batch_places_on_mesh():
    m = mesh_lib.make_mesh(n_data=8, n_model=1)
    batch = {"x": np.arange(32, dtype=np.float32).reshape(8, 4)}
    placed = launch.host_local_batch(m, batch)
    assert placed["x"].sharding.spec == jax.sharding.PartitionSpec("data")
    np.testing.assert_array_equal(np.asarray(placed["x"]), batch["x"])
