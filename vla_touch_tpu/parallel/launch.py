"""Multi-host launch glue.

The reference scales across nodes with a DeepSpeed hostfile + NCCL env
tuning (``/root/reference/VLA/finetune.sh:1-7,31``).  On TPU the equivalent
is ``jax.distributed.initialize`` (one process per host; ICI within a slice,
DCN across slices) followed by a global mesh over ``jax.devices()``.

Typical pod usage::

    from vla_touch_tpu.parallel import launch, mesh
    launch.initialize()                       # no-op on single-host
    m = mesh.make_mesh(n_model=4)             # data axis spans all hosts
    step_fn, state_sh = make_sharded_train_step(m, rcfg, tcfg)

Per-host data feeding: each host supplies its local shard of the global
batch via ``jax.make_array_from_process_local_data``
(:func:`host_local_batch`).
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Initialize multi-host JAX when running in a multi-process environment.

    Returns True if distributed mode is active.  On single-host (or when no
    coordinator is configured), this is a no-op — the framework runs
    identically on one host.
    """
    env_coord = coordinator_address or os.environ.get("JAX_COORDINATOR")
    in_tpu_pod = bool(os.environ.get("TPU_WORKER_HOSTNAMES", "")) and \
        os.environ.get("TPU_WORKER_HOSTNAMES") != "localhost"
    if env_coord is None and not in_tpu_pod:
        return False
    kwargs = {}
    if env_coord:
        kwargs["coordinator_address"] = env_coord
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    return True


def host_local_batch(mesh, batch, spec=None):
    """Assemble a global sharded array from per-host local shards.

    ``batch``: pytree of host-local numpy arrays whose leading dim is the
    LOCAL batch; the global batch = local × num processes along the data
    axis.  Single-process: plain ``device_put`` with the sharding.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = spec or P("data")

    def place(x):
        sharding = NamedSharding(mesh, spec)
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree.map(place, batch)
