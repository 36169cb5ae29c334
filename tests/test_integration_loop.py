"""Full deployment integration: RDT policy + BRIDGeR/LSTM refiners through
the chunk scheduler on a replayed synthetic episode (the frank_inference_eef
loop, minus ROS)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vla_touch_tpu.config import (
    BridgeControllerConfig,
    InterpolantConfig,
    LSTMControllerConfig,
    NoiseSchedulerConfig,
    rdt_tiny,
)
from vla_touch_tpu.data.episode import write_synthetic_episode
from vla_touch_tpu.models.controllers import bridge as BR
from vla_touch_tpu.models.controllers import lstm as LC
from vla_touch_tpu.models.encoders.vit import ViTConfig
from vla_touch_tpu.models.rdt import runner as R
from vla_touch_tpu.runtime import policy as P
from vla_touch_tpu.runtime.control_loop import (
    ChunkScheduler,
    ControlLoopConfig,
    EpisodeReplay,
)
from vla_touch_tpu.utils.normalization import normalize_actions

pytestmark = pytest.mark.slow

TINY_VIT = ViTConfig(hidden_size=48, num_layers=1, num_heads=4, mlp_dim=96,
                     image_size=28, patch_size=14, use_cls_token=False,
                     use_layerscale=False, gelu_tanh=True)
TINY_DINO = ViTConfig(hidden_size=384, num_layers=1, num_heads=4, mlp_dim=64,
                      image_size=28, patch_size=14)
TINY_RDT = rdt_tiny()
BCFG = BridgeControllerConfig(hidden_dim=32, horizon=4,
                              unet_down_dims=(16, 32),
                              interpolant=InterpolantConfig(diffusion_steps=3))
LCFG = LSTMControllerConfig(hidden_dim=32, num_layers=1)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("loop")
    path = str(root / "ep.h5")
    write_synthetic_episode(path, num_steps=30, img_size=28, chunk=8,
                            lang_dim=32, with_vla=False)
    replay = EpisodeReplay(path)

    pcfg = P.PolicyConfig(
        rdt=R.RDTRunnerConfig(model=TINY_RDT, noise=NoiseSchedulerConfig(
            num_inference_timesteps=2)),
        vision=TINY_VIT, image_size=28)
    model = P.create_model(pcfg, seed=0)
    text = np.random.default_rng(0).normal(
        size=(4, TINY_RDT.lang_token_dim)).astype(np.float32)

    from vla_touch_tpu.models.encoders import dinov2_runtime as dino

    dino_params = None

    def plan_fn(window):
        obs = window.current
        imgs = window.image_sequence()
        chunk = model.step(obs.state, imgs, text)  # (1, horizon, 10)
        return chunk[0]

    return replay, plan_fn, model


def _stats():
    return {
        "vla_mins": np.full(10, -200.0, np.float32),
        "vla_maxs": np.full(10, 200.0, np.float32),
        "action_mins": np.full(10, -200.0, np.float32),
        "action_maxs": np.full(10, 200.0, np.float32),
    }


def test_loop_raw_vla(setup):
    replay, plan_fn, _ = setup
    cfg = ControlLoopConfig(chunk_size=TINY_RDT.horizon, replan_interval=4,
                            refiner="none", gripper_deadband=0.0)
    sched = ChunkScheduler(cfg, plan_fn)
    out = replay.run(sched, steps=10)
    assert out["actions"].shape == (10, 10)
    assert np.isfinite(out["actions"]).all()


def test_loop_with_bridge_refiner(setup):
    replay, plan_fn, _ = setup
    st = BR.init_bridge_controller(BCFG, jax.random.PRNGKey(0))
    stats = _stats()
    dino_feat = np.zeros((1, 384), np.float32)
    calls = []

    def refine_fn(obs, chunk_window):
        calls.append(chunk_window.shape)
        out = BR.bridge_predict(
            BCFG, st.params, st.ema.shadow, stats, jax.random.PRNGKey(1),
            jnp.asarray(obs.state[None], jnp.float32),
            jnp.asarray(chunk_window[None], jnp.float32),
            cam1_feat=jnp.asarray(dino_feat), cam2_feat=jnp.asarray(dino_feat),
            forces=jnp.asarray(obs.force[None], jnp.float32))
        return np.asarray(out)[0]

    cfg = ControlLoopConfig(chunk_size=TINY_RDT.horizon, replan_interval=4,
                            refiner="bridge", refine_horizon=BCFG.horizon,
                            gripper_deadband=0.0)
    sched = ChunkScheduler(cfg, plan_fn, bridge_refine_fn=refine_fn)
    out = replay.run(sched, steps=8)
    assert len(calls) == 2 and calls[0] == (4, 10)  # refined once per replan
    assert np.isfinite(out["actions"]).all()


def test_loop_with_lstm_refiner(setup):
    replay, plan_fn, _ = setup
    st = LC.init_lstm_controller(LCFG, jax.random.PRNGKey(0))
    stats = _stats()
    obs_cond = jnp.zeros((1, LCFG.hidden_dim), jnp.float32)
    module = LC.LSTMControllerModule(LCFG)

    def lstm_fn(carry, obs, action, first):
        if first or carry is None:
            carry = module.bind({"params": st.params}).init_carry(1)
        act_n = normalize_actions(jnp.asarray(action[None], jnp.float32),
                                  stats, "vla")
        carry, refined = LC.lstm_step_predict(
            LCFG, st.params, stats, carry, obs_cond, act_n,
            jnp.asarray(obs.force[None], jnp.float32))
        return carry, np.asarray(refined)[0]

    cfg = ControlLoopConfig(chunk_size=TINY_RDT.horizon, replan_interval=4,
                            refiner="lstm", gripper_deadband=0.0)
    sched = ChunkScheduler(cfg, plan_fn, lstm_step_fn=lstm_fn)
    out = replay.run(sched, steps=8)
    assert np.isfinite(out["actions"]).all()
    # LSTM refinement actually changes the raw plan.
    sched2 = ChunkScheduler(dataclasses.replace(cfg, refiner="none"), plan_fn)
    replay2 = EpisodeReplay(replay.path)
    out2 = replay2.run(sched2, steps=8)
    assert not np.allclose(out["actions"], out2["actions"])
