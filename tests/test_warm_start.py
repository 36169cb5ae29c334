"""Warm-started replans (partial denoising, Falcon-style): scheduler math,
runner self-consistency, and the control-loop wiring."""

import jax
import jax.numpy as jnp
import numpy as np

from vla_touch_tpu.config import NoiseSchedulerConfig, rdt_tiny
from vla_touch_tpu.models.rdt import runner as R
from vla_touch_tpu.ops import schedulers as S

TINY = rdt_tiny()
RCFG = R.RDTRunnerConfig(model=TINY, noise=NoiseSchedulerConfig(
    num_inference_timesteps=5))


def _inputs(rng, B=1):
    m = TINY
    return (
        jnp.asarray(rng.normal(size=(B, 6, m.lang_token_dim)), jnp.float32),
        jnp.ones((B, 6), bool),
        jnp.asarray(rng.normal(size=(B, m.img_cond_len, m.img_token_dim)),
                    jnp.float32),
        jnp.asarray(rng.normal(size=(B, 1, m.state_token_dim)), jnp.float32),
        jnp.ones((B, 1, m.output_dim), jnp.float32),
        jnp.full((B,), 10.0, jnp.float32),
    )


def _rand_params(rng):
    params = R.init_rdt(RCFG, jax.random.PRNGKey(0))
    params["model"]["final_ffn"]["fc2"] = {
        "kernel": jnp.asarray(rng.normal(
            size=params["model"]["final_ffn"]["fc2"]["kernel"].shape) * 0.05,
            jnp.float32),
        "bias": params["model"]["final_ffn"]["fc2"]["bias"],
    }
    return params


def test_sampler_start_index_zero_is_identity():
    """start_index=0 with the same x_init reproduces the plain sampler
    bit-for-bit."""
    rng = np.random.default_rng(0)
    sched = S.DiffusionSchedule.create(1000, "squaredcos_cap_v2")
    x = jnp.asarray(rng.normal(size=(2, 8, 4)), jnp.float32)

    def model_fn(xt, t):
        return jnp.tanh(xt) * 0.3

    a = S.sample_dpm_solver(model_fn, x, sched, 5)
    b = S.sample_dpm_solver(model_fn, x, sched, 5, start_index=0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_renoise_levels_monotone():
    sched = S.DiffusionSchedule.create(1000, "squaredcos_cap_v2")
    x0 = jnp.ones((1, 4, 2))
    eps = jnp.ones((1, 4, 2))
    prev = None
    for i in range(5):
        xi = np.asarray(S.dpm_renoise(x0, eps, sched, 5, i)).mean()
        if prev is not None:
            # later start indices are CLEANER: x0 coefficient grows
            assert xi != prev
        prev = xi
    # index 0 ~ pure noise level of the schedule head
    t0 = np.asarray(S.make_dpm_tables(sched, 5, True, "zero").alpha_t)
    assert t0[0] < t0[4]  # alpha grows toward the clean end


def test_warm_start_skip0_equals_plain(rng):
    params = _rand_params(rng)
    args = _inputs(rng)
    key = jax.random.PRNGKey(7)
    plain = R.rdt_predict_action(RCFG, params, key, *args)
    warm0 = R.rdt_predict_action_warm(RCFG, params, key, *args,
                                      prior_chunk=jnp.zeros(
                                          (1, TINY.horizon,
                                           TINY.output_dim)),
                                      skip_steps=0)
    np.testing.assert_allclose(np.asarray(plain), np.asarray(warm0),
                               atol=1e-6)


def test_warm_start_self_consistency(rng):
    """Re-denoising a chunk the model itself produced (skipping 3 of 5
    steps) must stay close to that chunk — the fixed-point property that
    makes warm-started replans usable."""
    params = _rand_params(rng)
    args = _inputs(rng)
    full = R.rdt_predict_action(RCFG, params, jax.random.PRNGKey(7), *args)
    warm = R.rdt_predict_action_warm(RCFG, params, jax.random.PRNGKey(8),
                                     *args, prior_chunk=full, skip_steps=3)
    a, b = np.asarray(full), np.asarray(warm)
    denom = max(float(np.abs(a).max()), 1e-6)
    rel = np.abs(a - b).max() / denom
    assert rel < 0.35, rel
    corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    assert corr > 0.97, corr
    # and it is NOT a no-op (noise was injected and 2 steps ran)
    assert np.abs(a - b).max() > 0


def test_control_loop_warm_replan_wiring():
    from vla_touch_tpu.runtime.control_loop import (ChunkScheduler,
                                                    ControlLoopConfig,
                                                    Observation)

    calls = {"plain": 0, "warm": []}

    def plan_fn(window):
        calls["plain"] += 1
        return np.tile(np.arange(8, dtype=np.float32)[:, None], (1, 3))

    def plan_warm_fn(window, prior):
        calls["warm"].append(np.array(prior))
        return prior + 1.0

    cfg = ControlLoopConfig(chunk_size=8, replan_interval=4,
                            gripper_deadband=0.0)
    sched = ChunkScheduler(cfg, plan_fn, plan_warm_fn=plan_warm_fn)
    obs = Observation(state=np.zeros(3), images=[None, None, None])
    for _ in range(9):
        sched.tick(obs)
    # first replan: cold (no previous chunk); next two: warm
    assert calls["plain"] == 1
    assert len(calls["warm"]) == 2
    prior0 = calls["warm"][0]
    # shifted by 4 executed ticks, padded with the last action
    assert prior0.shape == (8, 3)
    np.testing.assert_array_equal(prior0[:4, 0], [4, 5, 6, 7])
    np.testing.assert_array_equal(prior0[4:, 0], [7, 7, 7, 7])


def test_policy_step_warm_skip0_equals_policy_step(rng):
    from vla_touch_tpu.config import NoiseSchedulerConfig as NC
    from vla_touch_tpu.models.encoders.vit import ViTConfig
    from vla_touch_tpu.runtime import policy as P

    vit = ViTConfig(hidden_size=48, num_layers=1, num_heads=4, mlp_dim=96,
                    image_size=28, patch_size=14, use_cls_token=False,
                    use_layerscale=False, gelu_tanh=True)
    cfg = P.PolicyConfig(
        rdt=R.RDTRunnerConfig(model=rdt_tiny(dtype="float32"),
                              noise=NC(num_inference_timesteps=3)),
        vision=vit, image_size=28)
    model = P.create_model(cfg, seed=0)
    model.rdt_params["model"]["final_ffn"]["fc2"]["kernel"] = jnp.asarray(
        rng.normal(size=model.rdt_params["model"]["final_ffn"]["fc2"][
            "kernel"].shape) * 0.05, jnp.float32)

    B = 1
    proprio = jnp.asarray(rng.normal(size=(B, 10)), jnp.float32)
    images = jnp.asarray(
        rng.integers(0, 255, size=(B, 6, 28, 28, 3)), jnp.uint8)
    imask = jnp.ones((B, 6), bool)
    text = jnp.asarray(rng.normal(size=(B, 6, 32)), jnp.float32)
    tmask = jnp.ones((B, 6), bool)
    key = jax.random.PRNGKey(3)

    plain = P.policy_step(cfg, model.rdt_params, model.vision_params, key,
                          proprio, images, imask, text, tmask)
    prior = jnp.zeros((B, cfg.rdt.model.horizon, 10), jnp.float32)
    warm0 = P.policy_step_warm(cfg, model.rdt_params, model.vision_params,
                               key, proprio, images, imask, text, tmask,
                               prior, 0)
    np.testing.assert_allclose(np.asarray(plain), np.asarray(warm0),
                               atol=1e-5)
    # skip=1 consumes the prior and produces a different but finite chunk
    warm1 = P.policy_step_warm(cfg, model.rdt_params, model.vision_params,
                               key, proprio, images, imask, text, tmask,
                               jnp.asarray(plain), 1)
    assert np.isfinite(np.asarray(warm1)).all()
    assert np.abs(np.asarray(warm1) - np.asarray(plain)).max() > 0
