"""Device mesh + sharding rules.

Replaces the reference's NCCL/DeepSpeed distributed setup
(``/root/reference/VLA/finetune.sh:1-7,39-41``, ZeRO-2 over DP ranks) with
``jax.sharding``:

- a 2-D ``(data, model)`` mesh — data-parallel gradients all-reduce over ICI
  implicitly through pjit's sharded autodiff (the reference's only training
  parallelism, SURVEY.md §2.7), with optional Megatron-style tensor
  parallelism over the ``model`` axis for the RDT blocks;
- ZeRO-2 analogue: optimizer-state leaves sharded over the data axis along
  their largest divisible dimension (:func:`zero_sharding`).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n_total = len(devices)
    if n_data is None:
        n_data = n_total // n_model
    assert n_data * n_model <= n_total, (n_data, n_model, n_total)
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


# ---- tensor-parallel parameter specs ------------------------------------------


def _rdt_tp_spec(path: tuple) -> P:
    """Megatron-style TP rules for RDT block parameters.

    Column-parallel (shard output features): qkv / q / kv projections and MLP
    fc1.  Row-parallel (shard input features): attention proj and MLP fc2.
    XLA inserts the all-reduces from these annotations.
    """
    keys = [getattr(k, "key", str(k)) for k in path]
    name = "/".join(keys)
    if not keys or keys[-1] != "kernel":
        return P()
    if any(s in name for s in ("attn/qkv", "cross_attn/q/", "cross_attn/kv",
                               "ffn/fc1")):
        return P(None, MODEL_AXIS)
    if any(s in name for s in ("attn/proj", "cross_attn/proj", "ffn/fc2")):
        return P(MODEL_AXIS, None)
    return P()


def rdt_param_shardings(mesh: Mesh, params) -> dict:
    """NamedShardings for the RDT parameter tree (TP over block matmuls when
    the mesh has a model axis > 1; fully replicated otherwise)."""
    if mesh.shape[MODEL_AXIS] == 1:
        return jax.tree.map(lambda _: replicated(mesh), params)
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _rdt_tp_spec(path)), params
    )


# ---- ZeRO-3 / FSDP analogue: shard the parameters themselves -------------------


def fsdp_param_shardings(mesh: Mesh, params) -> dict:
    """FSDP/ZeRO-3 shardings: every parameter leaf additionally sharded over
    the DATA axis (on its largest free dimension), composing with the TP
    spec when the mesh has a model axis.

    This is the TPU-idiomatic ZeRO-3: the annotation alone makes GSPMD
    materialize each layer's weights with a just-in-time all-gather in the
    forward/backward and reduce-scatter the gradients — no hand-written
    collectives, and per-chip parameter (+EMA) state drops to ~1/n_data.
    Goes beyond the reference's DeepSpeed ZeRO-2 ceiling
    (``finetune.sh:40``, moments-only sharding).
    """
    n_data = mesh.shape[DATA_AXIS]
    use_tp = mesh.shape[MODEL_AXIS] > 1

    def leaf_sharding(path, leaf):
        shape = tuple(getattr(leaf, "shape", ()))
        tp = _rdt_tp_spec(path) if use_tp else P()
        # Largest axis not already TP-sharded and divisible by n_data;
        # small leaves (norm scales shorter than the axis) keep just the
        # TP spec.  Same selection policy as the ZeRO-2 moment sharding.
        return NamedSharding(mesh, zero_spec_for(shape, n_data, base=tp))

    return jax.tree_util.tree_map_with_path(leaf_sharding, params)


# ---- ZeRO-2 analogue: shard optimizer moments over the data axis ---------------


def zero_spec_for(shape: tuple, n_data: int, base: Optional[P] = None) -> P:
    """Shard the largest free axis divisible by n_data over the data axis.

    ``base`` (a partial PartitionSpec, e.g. a TP spec) marks axes already
    taken; the data axis goes on the largest remaining one.  Falls back to
    ``base`` (or replication) when no axis divides — the single policy
    shared by ZeRO-2 moment sharding and ZeRO-3/FSDP param sharding.
    """
    if not shape:
        return base if base is not None else P()
    spec = list(base) if base is not None else []
    spec = spec + [None] * (len(shape) - len(spec))
    for i in sorted(range(len(shape)), key=lambda i: -shape[i]):
        if spec[i] is None and shape[i] % n_data == 0 and shape[i] >= n_data:
            spec[i] = DATA_AXIS
            return P(*spec)
    return base if base is not None else P()


def zero_sharding(mesh: Mesh, tree) -> dict:
    """Sharding tree for optimizer state: moment tensors sharded over data
    (ZeRO-2 analogue of the reference's DeepSpeed config,
    ``configs/zero2.json`` via ``finetune.sh:40``)."""
    n_data = mesh.shape[DATA_AXIS]

    def leaf_sharding(leaf):
        shape = getattr(leaf, "shape", ())
        return NamedSharding(mesh, zero_spec_for(tuple(shape), n_data))

    return jax.tree.map(leaf_sharding, tree)
