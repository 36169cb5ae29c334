"""Multi-host (multi-process) training proof.

Two OS processes x 4 virtual CPU devices each form one 8-device global mesh
via ``jax.distributed.initialize`` (Gloo collectives — the CI stand-in for
ICI/DCN), drive the REAL sharded train step through
``launch.host_local_batch``, and must reproduce the single-process oracle
loss on the same global batch.  TPU-pod analogue of the reference's
multi-node DeepSpeed hostfile launch (``/root/reference/VLA/finetune.sh:31``).
"""

import os
import re
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch_workers(nproc: int, port: int, local_devices: int = 4,
                    n_model: int = 1):
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests",
                                          "multihost_worker.py"),
             str(pid), str(nproc), str(port), str(local_devices),
             str(n_model)],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for pid in range(nproc)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker rc={p.returncode}\n{out[-4000:]}"
    return outs


def _oracle_loss(n_data: int = 8, n_model: int = 1,
                 with_eval: bool = False):
    """Single-process loss (and optionally post-step eval metrics) on the
    identical global batch (8-device mesh from conftest, same mesh shape as
    the workers' global mesh)."""
    from functools import partial

    from jax.sharding import PartitionSpec as P

    from tests.multihost_worker import build_eval_batch, build_global_batch
    from vla_touch_tpu.config import NoiseSchedulerConfig, TrainConfig, \
        rdt_tiny
    from vla_touch_tpu.models.rdt import runner as R
    from vla_touch_tpu.parallel import launch, mesh as mesh_lib
    from vla_touch_tpu.train import rdt_train as T

    mesh = mesh_lib.make_mesh(n_data=n_data, n_model=n_model)
    rcfg = R.RDTRunnerConfig(model=rdt_tiny(), noise=NoiseSchedulerConfig())
    tcfg = TrainConfig(grad_accum=2, lr_warmup_steps=0)
    step_fn, state_sh = T.make_sharded_train_step(mesh, rcfg, tcfg)
    state = jax.jit(partial(T.init_train_state, rcfg, tcfg),
                    out_shardings=state_sh)(jax.random.PRNGKey(0))
    micro = mesh.shape[mesh_lib.DATA_AXIS]
    batch = build_global_batch(2, micro, rcfg.model)
    dev_batch = launch.host_local_batch(mesh, batch,
                                        spec=P(None, mesh_lib.DATA_AXIS))
    new_state, metrics = step_fn(state, jax.random.PRNGKey(1), dev_batch)
    if not with_eval:
        return float(metrics["loss"])

    from vla_touch_tpu.train.rdt_loop import sample_metrics

    ebatch = build_eval_batch(micro, rcfg.model)
    img = ebatch.pop("img_tokens")
    dev_e = launch.host_local_batch(mesh, ebatch,
                                    spec=P(mesh_lib.DATA_AXIS))
    dev_img = launch.host_local_batch(mesh, img, spec=P(mesh_lib.DATA_AXIS))
    sm = sample_metrics(rcfg, new_state.params, jax.random.PRNGKey(7),
                        dev_e, dev_img)
    return float(metrics["loss"]), sm


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_two_process_train_step_matches_single_process():
    outs = _launch_workers(nproc=2, port=_free_port())
    losses, evals = [], []
    for out in outs:
        m = re.search(r"MHLOSS proc=(\d+) .* loss=([0-9.]+)", out)
        assert m, out[-2000:]
        losses.append(float(m.group(2)))
        e = re.search(r"MHEVAL proc=\d+ mse=([0-9.]+) l2=([0-9.]+)", out)
        assert e, out[-2000:]
        evals.append((float(e.group(1)), float(e.group(2))))
    assert losses[0] == losses[1]  # replicated global loss
    assert evals[0] == evals[1]    # replicated global eval metrics
    oracle, oracle_eval = _oracle_loss(with_eval=True)
    np.testing.assert_allclose(losses[0], oracle, rtol=2e-5)
    # Cross-rank sampling eval equals the single-process oracle on the same
    # global eval batch (≙ accelerator.gather_for_metrics parity).
    np.testing.assert_allclose(evals[0][0], oracle_eval["sample_mse"],
                               rtol=2e-4)
    np.testing.assert_allclose(evals[0][1], oracle_eval["sample_l2err"],
                               rtol=2e-4)


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_two_process_with_tensor_parallel_axis():
    # data=4 x model=2 across 2 processes: TP collectives cross the process
    # boundary too.
    outs = _launch_workers(nproc=2, port=_free_port(), n_model=2)
    losses = [float(re.search(r"loss=([0-9.]+)", o).group(1)) for o in outs]
    assert losses[0] == losses[1]
    oracle = _oracle_loss(n_data=4, n_model=2)
    np.testing.assert_allclose(losses[0], oracle, rtol=2e-4)
