"""vla_touch_tpu — a TPU-native JAX framework for dual-level tactile-enhanced
vision-language-action policies.

Re-implements the full capability surface of VLA-Touch (jxbi1010/VLA-Touch,
RA-L 2026, arXiv:2507.17294) as an idiomatic JAX/XLA/Pallas stack:

- RDT diffusion-transformer action generation with the denoising loop compiled
  as a single ``jax.lax.scan`` (reference: ``VLA/models/rdt_runner.py``).
- BRIDGeR stochastic-interpolant refinement controllers with Euler–Maruyama SDE
  sampling as a scan (reference: ``VLA/residual_controller/bridge/bridge_model.py``).
- LSTM residual step controller with HBM-persistent carry
  (reference: ``VLA/residual_controller/lstm_step_controller.py``).
- On-device preprocessing: image resize/normalize, GelSight marker tracking
  (reference: ``VLA/residual_controller/tactile/marker/marker_tracker.py``).
- Data-parallel training over ``jax.sharding.Mesh`` with sharded optimizer
  state (ZeRO-2 analogue of the reference's DeepSpeed setup, ``VLA/finetune.sh``).

The package is organized as::

    vla_touch_tpu/
      config.py     typed configuration tree (replaces the reference's scattered
                    argparse/YAML/JSON config surfaces)
      utils/        geometry, state-vector packing, normalization, EMA, checkpoints
      ops/          schedulers, attention, positional embeds, conv1d, LSTM cells,
                    Pallas kernels
      models/       RDT transformer + runner, residual controllers, encoders
      data/         episode datasets, controller dataset, stats, host pipeline
      parallel/     mesh + sharding rules
      train/        training loops (RDT finetune, bridge, lstm)
      runtime/      control-loop chunk scheduler and replay harness
      planning/     Octopi tactile-language planning stack
"""

__version__ = "0.1.0"
