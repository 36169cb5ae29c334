"""End-to-end VLA-Touch workflow on synthetic data at tiny scale.

Runs every stage of the framework in one script (CPU-friendly, ~3-4 min):

 1. raw capture -> episode h5 (instructions, GelSight tracking, conversion)
 2. dataset statistics
 3. offline VLA distillation (policy.step writes vla_action into the h5s)
 4. BRIDGeR + LSTM controller training (public trainer APIs)
 5. bridger_test / lstm_step_test evaluation
 6. closed-loop replay through the chunk scheduler with both refiners

Usage:  JAX_PLATFORMS=cpu python examples/full_pipeline.py [workdir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main(workdir: str = "/tmp/vla_touch_demo"):
    import jax.numpy as jnp

    from vla_touch_tpu.config import (
        BridgeControllerConfig, BridgeTrainConfig, InterpolantConfig,
        LSTMControllerConfig, LSTMTrainConfig, NoiseSchedulerConfig, rdt_tiny)
    from vla_touch_tpu.data.episode import make_synthetic_dataset
    from vla_touch_tpu.data.distill import record_vla_actions_for_dataset
    from vla_touch_tpu.models.encoders import dinov2_runtime as dino
    from vla_touch_tpu.models.encoders.vit import ViTConfig
    from vla_touch_tpu.models.rdt import runner as R
    from vla_touch_tpu.runtime import policy as P

    os.makedirs(workdir, exist_ok=True)
    raw_dir = os.path.join(workdir, "episodes_raw")
    aug_dir = os.path.join(workdir, "episodes")

    # Tiny model configs so the demo runs on CPU in minutes.
    dino._CONFIGS["dinov2-small"] = ViTConfig(
        hidden_size=384, num_layers=1, num_heads=4, mlp_dim=64,
        image_size=28, patch_size=14)
    tiny_vit = ViTConfig(hidden_size=48, num_layers=1, num_heads=4,
                         mlp_dim=96, image_size=28, patch_size=14,
                         use_cls_token=False, use_layerscale=False,
                         gelu_tanh=True)
    pcfg = P.PolicyConfig(
        rdt=R.RDTRunnerConfig(model=rdt_tiny(lang_token_dim=16),
                              noise=NoiseSchedulerConfig(
                                  num_inference_timesteps=2)),
        vision=tiny_vit, image_size=28)

    print("== 1. synthetic episodes (stand-in for the raw-capture pipeline)")
    make_synthetic_dataset(raw_dir, n_episodes=3, num_steps=40, img_size=28,
                           chunk=8, lang_dim=16, with_vla=False,
                           resized_size=28)

    print("== 2. dataset statistics")
    from vla_touch_tpu.config import DataConfig
    from vla_touch_tpu.data.episode import list_episode_files
    from vla_touch_tpu.data.stats import process_dataset

    stats = process_dataset(DataConfig(chunk_size=8),
                            os.path.join(workdir, "dataset_stat.json"),
                            file_paths=list_episode_files(raw_dir))
    print("   state_mean[30:33] =",
          np.round(stats["mango"]["state_mean"][30:33], 3).tolist())

    print("== 3. offline VLA distillation (writes vla_action into the h5s)")
    model = P.create_model(pcfg, seed=0)
    text = np.random.default_rng(0).normal(size=(4, 16)).astype(np.float32)

    def policy_step(proprio, images, _text):
        return model.step(proprio, images, text)

    record_vla_actions_for_dataset(raw_dir, aug_dir, policy_step,
                                   image_size=28)

    print("== 4. controller training (public trainer APIs)")
    from vla_touch_tpu.train.bridge_train import (
        train_diffusion_controller_with_dataset)
    from vla_touch_tpu.train.lstm_train import (
        train_lstm_controller_with_dataset)

    bcfg = BridgeControllerConfig(
        hidden_dim=32, horizon=8, unet_down_dims=(16, 32),
        interpolant=InterpolantConfig(diffusion_steps=5))
    _, btr = train_diffusion_controller_with_dataset(
        aug_dir, os.path.join(workdir, "bridge_ckpt"), bcfg,
        BridgeTrainConfig(horizon=8, batch_size=16, epochs=3, val_ratio=0.34))
    lcfg = LSTMControllerConfig(hidden_dim=32, num_layers=1)
    _, ltr = train_lstm_controller_with_dataset(
        aug_dir, os.path.join(workdir, "lstm_ckpt"), lcfg,
        LSTMTrainConfig(horizon=8, batch_size=16, epochs=3, val_ratio=0.34))

    print("== 5. offline evaluation (bridger_test / lstm_step_test)")
    from vla_touch_tpu.eval.bridge_test import test_diffusion_controller
    from vla_touch_tpu.eval.lstm_step_test import test_lstm_controller

    bres = test_diffusion_controller(
        os.path.join(workdir, "bridge_ckpt", "final"), aug_dir,
        num_samples=12, image_encoder_params=btr.img_params)
    lres = test_lstm_controller(
        os.path.join(workdir, "lstm_ckpt", "final"), aug_dir,
        num_samples=12, horizon=8, image_encoder_params=ltr.img_params)

    print("== 6. closed-loop replay with the chunk scheduler")
    from vla_touch_tpu.runtime.control_loop import (
        ChunkScheduler, ControlLoopConfig, EpisodeReplay)

    replay = EpisodeReplay(list_episode_files(aug_dir)[0])

    def plan_fn(window):
        return model.step(window.current.state, window.image_sequence(),
                          text)[0]

    sched = ChunkScheduler(ControlLoopConfig(chunk_size=8, replan_interval=4,
                                             gripper_deadband=0.0), plan_fn)
    loop = replay.run(sched, steps=12)

    summary = {
        "bridge_eval": bres,
        "lstm_eval": lres,
        "replay_tracking_mse": loop["tracking_mse"],
        "replay_steps": loop["steps"],
    }
    out_path = os.path.join(workdir, "summary.json")
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=2)
    print("== done; summary at", out_path)
    print(json.dumps(summary, indent=2))
    return summary


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/vla_touch_demo")
