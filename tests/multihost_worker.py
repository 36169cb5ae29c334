"""Multi-host worker: one of N processes in a distributed CPU training run.

Launched by ``tests/test_multihost.py`` (2 processes x 4 virtual CPU devices
= one 8-device global mesh over Gloo collectives).  Each process:

1. ``jax.distributed.initialize`` against the shared coordinator — the
   TPU-pod analogue of the reference's DeepSpeed hostfile + NCCL env launch
   (``/root/reference/VLA/finetune.sh:1-7,31``);
2. builds the global data x model mesh over ALL processes' devices;
3. jit-initializes the sharded train state (identical seed everywhere);
4. feeds its HOST-LOCAL slice of the deterministic global batch through
   :func:`vla_touch_tpu.parallel.launch.host_local_batch`;
5. runs one sharded train step and prints the (replicated) global loss.

The parent test asserts both processes print the same loss as the
single-process oracle on the same global batch.
"""

import sys

import numpy as np


def build_global_batch(accum: int, micro: int, m) -> dict:
    """Deterministic global batch; every process derives the same one."""
    rng = np.random.default_rng(42)

    def r(*s):
        return rng.normal(size=(accum, micro) + s).astype(np.float32)

    return {
        "lang_tokens": r(6, m.lang_token_dim),
        "lang_mask": np.ones((accum, micro, 6), bool),
        "img_tokens": r(m.img_cond_len, m.img_token_dim),
        "state_tokens": r(1, m.state_token_dim),
        "action_gt": r(m.horizon, m.output_dim),
        "action_mask": np.ones((accum, micro, 1, m.output_dim), np.float32),
        "ctrl_freqs": np.full((accum, micro), 10.0, np.float32),
    }


def build_eval_batch(batch: int, m) -> dict:
    """Deterministic global eval batch (sampling-eval protocol inputs)."""
    rng = np.random.default_rng(7)

    def r(*s):
        return rng.normal(size=(batch,) + s).astype(np.float32)

    return {
        "lang_tokens": r(6, m.lang_token_dim),
        "lang_mask": np.ones((batch, 6), bool),
        "img_tokens": r(m.img_cond_len, m.img_token_dim),
        "state_tokens": r(1, m.state_token_dim),
        "action_gt": r(m.horizon, m.output_dim),
        "action_mask": np.ones((batch, 1, m.output_dim), np.float32),
        "ctrl_freqs": np.full((batch,), 10.0, np.float32),
        "state_norm": np.abs(r(m.output_dim)) + 0.5,
    }


def run(process_id: int, num_processes: int, port: int,
        local_devices: int = 4, n_model: int = 1) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", local_devices)
    from vla_touch_tpu.parallel import launch

    assert launch.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=num_processes, process_id=process_id)

    import jax.numpy as jnp
    from functools import partial
    from jax.sharding import PartitionSpec as P

    from vla_touch_tpu.config import NoiseSchedulerConfig, TrainConfig, \
        rdt_tiny
    from vla_touch_tpu.models.rdt import runner as R
    from vla_touch_tpu.parallel import mesh as mesh_lib
    from vla_touch_tpu.train import rdt_train as T

    n_devices = local_devices * num_processes
    assert len(jax.devices()) == n_devices
    mesh = mesh_lib.make_mesh(n_data=n_devices // n_model, n_model=n_model)

    rcfg = R.RDTRunnerConfig(model=rdt_tiny(), noise=NoiseSchedulerConfig())
    tcfg = TrainConfig(grad_accum=2, lr_warmup_steps=0)

    step_fn, state_sh = T.make_sharded_train_step(mesh, rcfg, tcfg)
    # Init directly into the cross-process sharded layout (a host-local
    # device_put cannot address remote shards).
    state = jax.jit(partial(T.init_train_state, rcfg, tcfg),
                    out_shardings=state_sh)(jax.random.PRNGKey(0))

    accum, micro = 2, mesh.shape[mesh_lib.DATA_AXIS]
    batch = build_global_batch(accum, micro, rcfg.model)
    per = micro // num_processes
    local = {k: v[:, process_id * per:(process_id + 1) * per]
             for k, v in batch.items()}
    dev_batch = launch.host_local_batch(
        mesh, local, spec=P(None, mesh_lib.DATA_AXIS))

    new_state, metrics = step_fn(state, jax.random.PRNGKey(1), dev_batch)
    loss = float(metrics["loss"])
    assert np.isfinite(loss)
    assert int(new_state.step) == 1
    print(f"MHLOSS proc={process_id} nproc={num_processes} "
          f"mesh={dict(mesh.shape)} loss={loss:.8f}", flush=True)

    # Cross-rank sampling eval (≙ accelerator.gather_for_metrics,
    # train/sample.py:67-70): each process contributes its host-local slice
    # of the eval batch; the metric sums ride the mesh as pjit outputs, so
    # the printed metrics are GLOBAL and identical on every process.
    from vla_touch_tpu.train.rdt_loop import sample_metrics

    ebatch = build_eval_batch(micro, rcfg.model)
    local_e = {k: v[process_id * per:(process_id + 1) * per]
               for k, v in ebatch.items()}
    img = local_e.pop("img_tokens")
    dev_e = launch.host_local_batch(mesh, local_e,
                                    spec=P(mesh_lib.DATA_AXIS))
    dev_img = launch.host_local_batch(mesh, img,
                                      spec=P(mesh_lib.DATA_AXIS))
    sm = sample_metrics(rcfg, new_state.params, jax.random.PRNGKey(7),
                        dev_e, dev_img)
    print(f"MHEVAL proc={process_id} mse={sm['sample_mse']:.8f} "
          f"l2={sm['sample_l2err']:.8f}", flush=True)


if __name__ == "__main__":
    run(process_id=int(sys.argv[1]), num_processes=int(sys.argv[2]),
        port=int(sys.argv[3]),
        local_devices=int(sys.argv[4]) if len(sys.argv) > 4 else 4,
        n_model=int(sys.argv[5]) if len(sys.argv) > 5 else 1)
