"""Policy wrapper + control loop runtime tests (tiny models)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vla_touch_tpu.config import NoiseSchedulerConfig, RDTModelConfig, rdt_tiny
from vla_touch_tpu.models.encoders.vit import ViTConfig
from vla_touch_tpu.models.rdt import runner as R
from vla_touch_tpu.runtime import policy as P
from vla_touch_tpu.runtime.control_loop import (
    ChunkScheduler,
    ControlLoopConfig,
    EpisodeReplay,
    GripperSmoother,
    Observation,
    ObservationWindow,
)

TINY_VIT = ViTConfig(hidden_size=48, num_layers=1, num_heads=4, mlp_dim=96,
                     image_size=28, patch_size=14, use_cls_token=False,
                     use_layerscale=False, gelu_tanh=True)
# img_cond_len = 2 frames x 3 cams x 4 patches = 24 (matches rdt_tiny:
# img_token_dim=48, horizon=8 are its defaults).
TINY_RDT = rdt_tiny()


def _policy_cfg():
    return P.PolicyConfig(
        rdt=R.RDTRunnerConfig(model=TINY_RDT, noise=NoiseSchedulerConfig(
            num_inference_timesteps=3)),
        vision=TINY_VIT, image_size=28)


def test_policy_step_shapes_and_gripper_scale(rng):
    cfg = _policy_cfg()
    model = P.create_model(cfg, seed=0)
    # The untrained RDT has a zero-initialized final layer (DiT convention),
    # so predictions are exactly 0; nudge the final bias to probe the
    # unpack/rescale path.
    import jax.numpy as jnp

    model.rdt_params["model"]["final_ffn"]["fc2"]["bias"] = (
        model.rdt_params["model"]["final_ffn"]["fc2"]["bias"] + 0.5)
    proprio = np.concatenate([rng.normal(size=9), [128.0]])  # raw gripper
    images = [rng.integers(0, 255, (20, 30, 3), np.uint8), None, None,
              rng.integers(0, 255, (20, 30, 3), np.uint8), None, None]
    text = rng.normal(size=(5, TINY_RDT.lang_token_dim)).astype(np.float32)
    out = model.step(proprio, images, text)
    assert out.shape == (1, TINY_RDT.horizon, 10)
    # Gripper dim comes back in raw units (x255): with the same normalized
    # bias on every dim, the raw gripper must be ~255x the pose dims.
    assert np.abs(out[0, :, -1]).max() > 50 * np.abs(out[0, :, :9]).max()


def test_policy_step_deterministic_per_key(rng):
    cfg = _policy_cfg()
    model = P.create_model(cfg, seed=0)
    model2 = P.RoboticDiffusionTransformerModel(cfg, model.rdt_params,
                                                model.vision_params)
    proprio = rng.normal(size=10)
    images = [rng.integers(0, 255, (28, 28, 3), np.uint8)] * 6
    text = rng.normal(size=(4, TINY_RDT.lang_token_dim)).astype(np.float32)
    a = model.step(proprio, images, text)
    b = model2.step(proprio, images, text)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_observation_window_and_smoother():
    w = ObservationWindow(2)
    o1 = Observation(state=np.zeros(10), images=["a", "b"])
    o2 = Observation(state=np.ones(10), images=["c", "d"])
    w.update(o1)
    assert w.image_sequence() == ["a", "b", None, "a", "b", None]
    w.update(o2)
    assert w.image_sequence() == ["a", "b", None, "c", "d", None]

    s = GripperSmoother(deadband=2.0)
    assert s(100.0) == 100.0
    assert s(101.0) == 100.0      # inside deadband: hold
    assert s(103.0) == 103.0      # outside: move


def test_chunk_scheduler_replan_and_refiners():
    cfg = ControlLoopConfig(chunk_size=8, replan_interval=4, refiner="none",
                            gripper_deadband=0.0)
    plans = []

    def plan_fn(window):
        plans.append(window.current.state.copy())
        base = np.full((8, 10), float(len(plans)))
        return base

    sched = ChunkScheduler(cfg, plan_fn)
    outs = [sched.tick(Observation(state=np.full(10, t), images=[None] * 3))
            for t in range(10)]
    assert len(plans) == 3  # replans at t=0, 4, 8
    assert outs[0][0] == 1.0 and outs[4][0] == 2.0 and outs[8][0] == 3.0

    # Bridge refiner rewrites the first refine_horizon steps once per replan.
    cfg_b = dataclasses.replace(cfg, refiner="bridge", refine_horizon=2)
    calls = []

    def refine_fn(obs, window):
        calls.append(window.copy())
        return window + 100.0

    sched = ChunkScheduler(cfg_b, plan_fn, bridge_refine_fn=refine_fn)
    outs = [sched.tick(Observation(state=np.zeros(10), images=[None] * 3))
            for t in range(4)]
    assert len(calls) == 1 and calls[0].shape == (2, 10)
    assert outs[0][0] > 100 and outs[1][0] > 100 and outs[2][0] < 100

    # LSTM refiner gets a fresh carry at each replan and is called per tick.
    cfg_l = dataclasses.replace(cfg, refiner="lstm")
    carries = []

    def lstm_fn(carry, obs, action, first):
        carries.append((carry, first))
        return (0 if carry is None else carry) + 1, action + 1.0

    sched = ChunkScheduler(cfg_l, plan_fn, lstm_step_fn=lstm_fn)
    for t in range(5):
        sched.tick(Observation(state=np.zeros(10), images=[None] * 3))
    assert carries[0] == (None, True)
    assert carries[1][0] == 1 and carries[1][1] is False
    assert carries[4] == (None, True)  # replan at t=4 resets the carry


def test_episode_replay_end_to_end(tmp_path):
    from vla_touch_tpu.data.episode import write_synthetic_episode

    path = str(tmp_path / "ep.h5")
    write_synthetic_episode(path, num_steps=40, img_size=28, chunk=16,
                            lang_dim=32, with_vla=False)
    replay = EpisodeReplay(path)
    assert replay.T == 40

    # Oracle planner: returns the recorded future states (perfect tracking).
    def plan_fn(window):
        t = plan_fn.t
        idx = np.minimum(np.arange(t + 1, t + 9), replay.T - 1)
        plan_fn.t += 4
        return replay.qpos[idx]

    plan_fn.t = 0
    cfg = ControlLoopConfig(chunk_size=8, replan_interval=4,
                            gripper_deadband=0.0)
    sched = ChunkScheduler(cfg, plan_fn)
    result = replay.run(sched, steps=20)
    assert result["actions"].shape == (20, 10)
    assert result["tracking_mse"] < 1e-9  # oracle tracks exactly


def test_replay_cli_warm_wiring(tmp_path, monkeypatch, rng):
    """--warm_skip wires a plan_warm_fn through build_scheduler; the loop
    replans warm after the first chunk (tiny policy config)."""
    import argparse

    from vla_touch_tpu.config import NoiseSchedulerConfig, rdt_tiny
    from vla_touch_tpu.data.episode import write_synthetic_episode
    from vla_touch_tpu.models.encoders.vit import ViTConfig
    from vla_touch_tpu.models.rdt import runner as R
    from vla_touch_tpu.runtime import policy as P
    from vla_touch_tpu.runtime import replay_cli

    tiny_vit = ViTConfig(hidden_size=48, num_layers=1, num_heads=4,
                         mlp_dim=96, image_size=28, patch_size=14,
                         use_cls_token=False, use_layerscale=False,
                         gelu_tanh=True)

    RealPolicyConfig = P.PolicyConfig

    def tiny_cfg():
        return RealPolicyConfig(
            rdt=R.RDTRunnerConfig(model=rdt_tiny(lang_token_dim=32),
                                  noise=NoiseSchedulerConfig(
                                      num_inference_timesteps=3)),
            vision=tiny_vit, image_size=28)

    monkeypatch.setattr(P, "PolicyConfig", tiny_cfg)
    path = str(tmp_path / "ep.h5")
    write_synthetic_episode(path, num_steps=24, img_size=28, chunk=8,
                            lang_dim=32, with_vla=False)
    replay = EpisodeReplay(path)
    args = argparse.Namespace(
        rdt_checkpoint=None, refiner="none", bridge_ckpt=None,
        lstm_ckpt=None, replan_interval=4, refine_horizon=4,
        gripper_deadband=0.0, warm_skip=1)
    sched = replay_cli.build_scheduler(args, replay)
    assert sched.plan_warm_fn is not None
    result = replay.run(sched, steps=10)
    assert result["actions"].shape == (10, 10)
    assert np.isfinite(result["actions"]).all()
