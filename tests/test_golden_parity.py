"""Full-configuration golden parity vs frozen torch-oracle fixtures.

VERDICT item 3: round-1 parity ran only at tiny scale; these tests run the
REAL reference configurations (RDT: hidden 1152 x depth 28 x 16 heads —
``/root/reference/VLA/models/rdt/model.py:24-35``; BRIDGeR: triple UNet-1D
256/512/512 — ``bridge_controller.py:246-273``; LSTM: 256x2 —
``lstm_step_controller.py:44-96``) against committed golden outputs
(``tests/fixtures/golden/*.npz``, produced by
``tests/make_golden_fixtures.py``): one forward + one 5-step DPM-Solver++
rollout with fixed starting noise, one 10-step SDE rollout with a recorded
noise sequence, one LSTM sequence.  Torch weights regenerate from the
recorded seeds; fingerprints guard against torch RNG drift.  The tests run
from fixtures alone — no network, no reference tree.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from vla_touch_tpu.utils import torch_port as tp

GOLDEN = os.path.join(os.path.dirname(__file__), "fixtures", "golden")


def _load(name):
    path = os.path.join(GOLDEN, name)
    assert os.path.exists(path), f"run tests/make_golden_fixtures.py: {path}"
    return np.load(path)


def _check_fingerprints(fx, sd):
    for key in fx.files:
        if not key.startswith("fp_"):
            continue
        name = key[3:]
        w = np.asarray(sd[name], np.float64)
        got = np.array([w.mean(), w.std(), np.abs(w).max()])
        np.testing.assert_allclose(
            got, fx[key], rtol=1e-6,
            err_msg=(f"torch RNG produced different weights for {name}; "
                     f"regenerate fixtures (python tests/"
                     f"make_golden_fixtures.py)"))


def _mse(a, b):
    return float(np.mean(np.square(np.asarray(a, np.float64) -
                                   np.asarray(b, np.float64))))


# ---------------------------------------------------------------- RDT -----

@pytest.mark.slow
def test_rdt_full_config_golden():
    from tests.make_golden_fixtures import (make_torch_runner, rdt_inputs,
                                            torch_runner_sd)
    from vla_touch_tpu.config import NoiseSchedulerConfig, rdt_170m
    from vla_touch_tpu.models.rdt import runner as R

    fx = _load("rdt_full.npz")
    m = rdt_170m(dtype="float32")  # f32 parity; bf16 drift measured below
    sd = torch_runner_sd(*make_torch_runner(m))
    _check_fingerprints(fx, sd)
    params = tp.rdt_runner(sd, depth=m.depth)
    rcfg = R.RDTRunnerConfig(model=m, noise=NoiseSchedulerConfig(
        num_inference_timesteps=int(fx["steps"])))

    lang, lang_mask, img, state, amask, freqs, noise = rdt_inputs(m)

    # --- single forward at t=500 (mirrors the fixture computation) --------
    module = R.RDTRunnerModule(m)
    state_in = jnp.concatenate(
        [jnp.asarray(state), jnp.asarray(amask)], axis=2)
    lang_c, img_c, state_traj = module.apply(
        {"params": params}, jnp.asarray(lang), jnp.asarray(img), state_in,
        method=R.RDTRunnerModule.adapt_conditions)
    mask_h = np.broadcast_to(amask, (1, m.horizon, m.output_dim))
    action_in = jnp.asarray(np.concatenate([noise, mask_h], axis=2))
    action_traj = module.apply({"params": params}, action_in,
                               method=R.RDTRunnerModule.adapt_state)
    x = jnp.concatenate([state_traj, action_traj], axis=1)
    fwd = module.apply(
        {"params": params}, x, jnp.asarray(freqs),
        jnp.full((1,), int(fx["t_fwd"]), jnp.int32), lang_c, img_c,
        jnp.asarray(lang_mask), method=R.RDTRunnerModule.forward_model)

    fwd_mse = _mse(fwd, fx["forward"])
    assert fwd_mse < 1e-3, fwd_mse
    np.testing.assert_allclose(np.asarray(fwd), fx["forward"], atol=2e-3,
                               rtol=1e-3)

    # --- 5-step rollout with the fixed starting noise ----------------------
    rollout = R.rdt_predict_action(
        rcfg, params, jax.random.PRNGKey(0), jnp.asarray(lang),
        jnp.asarray(lang_mask), jnp.asarray(img), jnp.asarray(state),
        jnp.asarray(amask), jnp.asarray(freqs), init_noise=noise)
    ro_mse = _mse(rollout, fx["rollout"])
    assert ro_mse < 1e-3, ro_mse
    print(f"rdt_full f32: forward MSE {fwd_mse:.3e}, "
          f"5-step rollout MSE {ro_mse:.3e}")


@pytest.mark.slow
def test_rdt_full_config_bf16_drift():
    """Measure (and bound) bf16 drift at depth 28 vs the f32 golden —
    the unmeasured quantity VERDICT item 3 calls out."""
    from tests.make_golden_fixtures import (make_torch_runner, rdt_inputs,
                                            torch_runner_sd)
    from vla_touch_tpu.config import NoiseSchedulerConfig, rdt_170m
    from vla_touch_tpu.models.rdt import runner as R

    fx = _load("rdt_full.npz")
    m = rdt_170m()
    sd = torch_runner_sd(*make_torch_runner(m))
    params = tp.rdt_runner(sd, depth=m.depth)
    params16 = jax.tree.map(lambda p: jnp.asarray(p, jnp.bfloat16), params)
    rcfg = R.RDTRunnerConfig(model=m, noise=NoiseSchedulerConfig(
        num_inference_timesteps=int(fx["steps"])))
    lang, lang_mask, img, state, amask, freqs, noise = rdt_inputs(m)

    rollout16 = R.rdt_predict_action(
        rcfg, params16, jax.random.PRNGKey(0),
        jnp.asarray(lang, jnp.bfloat16), jnp.asarray(lang_mask),
        jnp.asarray(img, jnp.bfloat16), jnp.asarray(state, jnp.bfloat16),
        jnp.asarray(amask), jnp.asarray(freqs), init_noise=noise)
    drift = _mse(np.asarray(rollout16, np.float32), fx["rollout"])
    # Action channels are O(0.1-0.5); bf16 has ~3 decimal digits.  The
    # serving path's acceptability bound (chunk corr > 0.99 in
    # test_quant.py) corresponds to MSE well under 1e-3 here.
    assert drift < 1e-3, drift
    print(f"rdt_full bf16 5-step rollout drift MSE vs f32 golden: "
          f"{drift:.3e}")


# ----------------------------------------------------- RDT flagship (1B) --

@pytest.fixture(scope="module")
def rdt_1b_ported():
    """Torch oracle -> ported params at the FLAGSHIP 2048x28x32 config
    (built once per module; ~4.8 GB f32)."""
    from tests.make_golden_fixtures import make_torch_runner, torch_runner_sd
    from vla_touch_tpu.config import rdt_1b

    m = rdt_1b(dtype="float32")
    sd = torch_runner_sd(*make_torch_runner(m))
    params = tp.rdt_runner(sd, depth=m.depth)
    return m, sd, params


@pytest.mark.slow
def test_rdt_1b_config_golden(rdt_1b_ported):
    """Golden parity AT THE BENCH HEADLINE CONFIG (rdt_1b: 2048 x 28 x 32,
    4374-token image condition) — closes the round-2 proof seam between
    170m parity evidence and the 1B serving numbers.  Ref:
    ``VLA/models/rdt_runner.py:146-160``."""
    from tests.make_golden_fixtures import rdt_inputs
    from vla_touch_tpu.config import NoiseSchedulerConfig
    from vla_touch_tpu.models.rdt import runner as R

    fx = _load("rdt_1b.npz")
    m, sd, params = rdt_1b_ported
    _check_fingerprints(fx, sd)
    rcfg = R.RDTRunnerConfig(model=m, noise=NoiseSchedulerConfig(
        num_inference_timesteps=int(fx["steps"])))
    lang, lang_mask, img, state, amask, freqs, noise = rdt_inputs(m)

    module = R.RDTRunnerModule(m)
    state_in = jnp.concatenate(
        [jnp.asarray(state), jnp.asarray(amask)], axis=2)
    lang_c, img_c, state_traj = module.apply(
        {"params": params}, jnp.asarray(lang), jnp.asarray(img), state_in,
        method=R.RDTRunnerModule.adapt_conditions)
    mask_h = np.broadcast_to(amask, (1, m.horizon, m.output_dim))
    action_in = jnp.asarray(np.concatenate([noise, mask_h], axis=2))
    action_traj = module.apply({"params": params}, action_in,
                               method=R.RDTRunnerModule.adapt_state)
    x = jnp.concatenate([state_traj, action_traj], axis=1)
    fwd = module.apply(
        {"params": params}, x, jnp.asarray(freqs),
        jnp.full((1,), int(fx["t_fwd"]), jnp.int32), lang_c, img_c,
        jnp.asarray(lang_mask), method=R.RDTRunnerModule.forward_model)
    fwd_mse = _mse(fwd, fx["forward"])
    assert fwd_mse < 1e-3, fwd_mse

    rollout = R.rdt_predict_action(
        rcfg, params, jax.random.PRNGKey(0), jnp.asarray(lang),
        jnp.asarray(lang_mask), jnp.asarray(img), jnp.asarray(state),
        jnp.asarray(amask), jnp.asarray(freqs), init_noise=noise)
    ro_mse = _mse(rollout, fx["rollout"])
    assert ro_mse < 1e-3, ro_mse
    print(f"rdt_1b f32: forward MSE {fwd_mse:.3e}, "
          f"5-step rollout MSE {ro_mse:.3e}")


@pytest.mark.slow
def test_rdt_1b_bf16_drift(rdt_1b_ported):
    """Measured bf16 drift at 2048-hidden depth 28 vs the f32 golden — the
    serving dtype's drift at the exact headline config."""
    from tests.make_golden_fixtures import rdt_inputs
    from vla_touch_tpu.config import NoiseSchedulerConfig, rdt_1b
    from vla_touch_tpu.models.rdt import runner as R

    fx = _load("rdt_1b.npz")
    m_f32, _, params = rdt_1b_ported
    m = rdt_1b()  # bf16 compute dtype
    params16 = jax.tree.map(lambda p: jnp.asarray(p, jnp.bfloat16), params)
    rcfg = R.RDTRunnerConfig(model=m, noise=NoiseSchedulerConfig(
        num_inference_timesteps=int(fx["steps"])))
    lang, lang_mask, img, state, amask, freqs, noise = rdt_inputs(m_f32)

    rollout16 = R.rdt_predict_action(
        rcfg, params16, jax.random.PRNGKey(0),
        jnp.asarray(lang, jnp.bfloat16), jnp.asarray(lang_mask),
        jnp.asarray(img, jnp.bfloat16), jnp.asarray(state, jnp.bfloat16),
        jnp.asarray(amask), jnp.asarray(freqs), init_noise=noise)
    drift = _mse(np.asarray(rollout16, np.float32), fx["rollout"])
    assert drift < 1e-3, drift
    print(f"rdt_1b bf16 5-step rollout drift MSE vs f32 golden: {drift:.3e}")


@pytest.mark.slow
def test_rdt_1b_int8_anchor(rdt_1b_ported):
    """int8 weight-quantized serving twin at the FLAGSHIP config vs the f32
    golden rollout (re-pins the quant anchor at 2048x28x32; round-2's int8
    anchor lived at tiny config)."""
    from tests.make_golden_fixtures import rdt_inputs
    from vla_touch_tpu.config import NoiseSchedulerConfig, rdt_1b
    from vla_touch_tpu.models.rdt import quant_serve as Q
    from vla_touch_tpu.models.rdt import runner as R

    fx = _load("rdt_1b.npz")
    m_f32, _, params = rdt_1b_ported
    m = rdt_1b()
    params16 = jax.tree.map(lambda p: jnp.asarray(p, jnp.bfloat16), params)
    qparams = Q.quantize_rdt_params(params16)
    rcfg = R.RDTRunnerConfig(model=m, noise=NoiseSchedulerConfig(
        num_inference_timesteps=int(fx["steps"])))
    lang, lang_mask, img, state, amask, freqs, noise = rdt_inputs(m_f32)

    chunk = Q.rdt_predict_action_quant(
        rcfg, qparams, jax.random.PRNGKey(0),
        jnp.asarray(lang, jnp.bfloat16), jnp.asarray(lang_mask),
        jnp.asarray(img, jnp.bfloat16), jnp.asarray(state, jnp.bfloat16),
        jnp.asarray(amask), jnp.asarray(freqs), init_noise=noise)
    got = np.asarray(chunk, np.float32)[..., 30:40].ravel()
    want = np.asarray(fx["rollout"], np.float32)[..., 30:40].ravel()
    corr = float(np.corrcoef(got, want)[0, 1])
    mse = _mse(chunk, fx["rollout"])
    assert corr > 0.999, (corr, mse)
    print(f"rdt_1b int8: corr {corr:.6f}, MSE vs f32 golden {mse:.3e}")


# ------------------------------------------------------------- BRIDGeR ----

@pytest.mark.slow
def test_bridge_full_config_sde_golden():
    from tests.make_golden_fixtures import bridge_inputs, make_torch_si_nets
    from vla_touch_tpu.config import InterpolantConfig
    from vla_touch_tpu.models.controllers import interpolants as I
    from vla_touch_tpu.models.controllers.unet1d import ConditionalUnet1D

    fx = _load("bridge_full.npz")
    cfg = InterpolantConfig()
    v_net, s_net = make_torch_si_nets()
    sd_v = {k: p.detach().numpy() for k, p in v_net.state_dict().items()}
    sd_s = {k: p.detach().numpy() for k, p in s_net.state_dict().items()}
    _check_fingerprints(fx, sd_v)
    pv = tp.unet1d(sd_v, num_levels=3)
    ps = tp.unet1d(sd_s, num_levels=3)

    model = ConditionalUnet1D(input_dim=10, down_dims=(256, 512, 512))
    nets = {
        "v": lambda x, t, c: model.apply({"params": pv}, x, t, c),
        "s": lambda x, t, c: model.apply({"params": ps}, x, t, c),
    }
    x_prior, cond, noise_seq = bridge_inputs()
    out = I.sde_sample(cfg, nets, jnp.asarray(x_prior), jnp.asarray(cond),
                       jax.random.PRNGKey(0), noise_seq=noise_seq)
    mse = _mse(out, fx["rollout"])
    assert mse < 1e-3, mse
    np.testing.assert_allclose(np.asarray(out), fx["rollout"], atol=5e-3,
                               rtol=1e-3)
    print(f"bridge_full 10-step SDE rollout MSE: {mse:.3e}")


# ----------------------------------------------------------------- LSTM ---

def test_lstm_full_config_golden():
    from tests.test_lstm_controller import (TorchLSTMController,
                                            _port_params)
    from vla_touch_tpu.config import LSTMControllerConfig
    from vla_touch_tpu.models.controllers import lstm as L

    fx = _load("lstm_full.npz")
    cfg = LSTMControllerConfig()
    torch.manual_seed(int(fx["torch_seed"]))
    ref = TorchLSTMController(cfg).eval()
    sd = {k: p.detach().numpy() for k, p in ref.state_dict().items()}
    _check_fingerprints(fx, sd)
    params = _port_params(ref, cfg)

    rng = np.random.default_rng(int(fx["input_seed"]))
    B, Tn = 2, 16
    raw_obs = rng.normal(size=(B, cfg.obs_dim)).astype(np.float32)
    vla = rng.normal(size=(B, Tn, cfg.state_dim)).astype(np.float32)
    force = rng.normal(size=(B, Tn, cfg.force_dim)).astype(np.float32)

    f1, f2, state = (raw_obs[:, :cfg.visual_dim],
                     raw_obs[:, cfg.visual_dim:2 * cfg.visual_dim],
                     raw_obs[:, 2 * cfg.visual_dim:])
    obs_enc = L.lstm_encode_obs(cfg, params, jnp.asarray(state),
                                jnp.asarray(f1), jnp.asarray(f2))
    out = L.LSTMControllerModule(cfg).apply(
        {"params": params}, obs_enc, jnp.asarray(vla), jnp.asarray(force))
    mse = _mse(out, fx["sequence"])
    # f32 parity at full config: MSE ~2.6e-6 (residual = XLA-CPU fast
    # tanh/sigmoid accumulating through 16 LSTM steps x 2 layers).
    assert mse < 1e-4, mse
    np.testing.assert_allclose(np.asarray(out), fx["sequence"], atol=2e-2,
                               rtol=2e-2)
    print(f"lstm_full sequence MSE: {mse:.3e}")


# --------------------------------------------------- runtime chunk anchor --

def test_policy_chunk_frozen_anchor():
    """The deployment policy path (SigLIP encode -> 128-D pack -> denoise ->
    unpack, one jit) reproduces its frozen recorded chunk exactly — the
    synthetic-form recorded-chunk action-parity anchor (BASELINE.md north
    star shape; guards pack/unpack + scheduler wiring drift)."""
    import jax

    from tests.make_golden_fixtures import INPUT_SEED
    from vla_touch_tpu.config import NoiseSchedulerConfig, rdt_tiny
    from vla_touch_tpu.models.encoders.vit import ViTConfig
    from vla_touch_tpu.models.rdt import runner as R
    from vla_touch_tpu.runtime import policy as P

    fx = _load("policy_chunk.npz")
    vit = ViTConfig(hidden_size=48, num_layers=1, num_heads=4, mlp_dim=96,
                    image_size=28, patch_size=14, use_cls_token=False,
                    use_layerscale=False, gelu_tanh=True)
    cfg = P.PolicyConfig(
        rdt=R.RDTRunnerConfig(model=rdt_tiny(dtype="float32"),
                              noise=NoiseSchedulerConfig(
                                  num_inference_timesteps=3)),
        vision=vit, image_size=28)
    model = P.create_model(cfg, seed=0)
    rng = np.random.default_rng(int(fx["input_seed"]))
    import jax.numpy as jnp

    model.rdt_params["model"]["final_ffn"]["fc2"]["kernel"] = jnp.asarray(
        rng.normal(size=model.rdt_params["model"]["final_ffn"]["fc2"][
            "kernel"].shape) * 0.05, jnp.float32)
    model._key = jax.random.PRNGKey(99)

    proprio = rng.normal(size=(1, 10)).astype(np.float32)
    images = [rng.integers(0, 255, size=(28, 28, 3)).astype(np.uint8)
              for _ in range(6)]
    text = rng.normal(size=(1, 6, cfg.rdt.model.lang_token_dim)).astype(
        np.float32)
    chunk = model.step(proprio, images, text)
    mse = _mse(chunk, fx["chunk"])
    assert mse < 1e-6, mse


@pytest.mark.slow
def test_quant_chunk_frozen_anchor():
    """The int8 serving path (quantize_rdt_params -> quant denoise loop,
    cold AND warm-started) reproduces its frozen chunks — integer matmuls
    plus fixed-order f32 dequant are deterministic, so this pins scales,
    per-token activation quantization, and solver wiring against silent
    numeric drift."""
    import jax
    import jax.numpy as jnp

    from tests.make_golden_fixtures import INPUT_SEED
    from vla_touch_tpu.config import NoiseSchedulerConfig, rdt_tiny
    from vla_touch_tpu.models.rdt import quant_serve as Q
    from vla_touch_tpu.models.rdt import runner as R

    fx = _load("quant_chunk.npz")
    rcfg = R.RDTRunnerConfig(model=rdt_tiny(dtype="float32"),
                             noise=NoiseSchedulerConfig(
                                 num_inference_timesteps=3))
    m = rcfg.model
    params = R.init_rdt(rcfg, jax.random.PRNGKey(4))
    rng = np.random.default_rng(int(fx["input_seed"]))
    params["model"]["final_ffn"]["fc2"]["kernel"] = jnp.asarray(
        rng.normal(size=params["model"]["final_ffn"]["fc2"]["kernel"].shape)
        * 0.05, jnp.float32)
    qparams = Q.quantize_rdt_params(params)

    B, Ll = 1, 7
    lang = jnp.asarray(rng.normal(size=(B, Ll, m.lang_token_dim)),
                       jnp.float32)
    lang_mask = jnp.ones((B, Ll), bool)
    img = jnp.asarray(rng.normal(size=(B, m.img_cond_len, m.img_token_dim)),
                      jnp.float32)
    state = jnp.asarray(rng.normal(size=(B, 1, m.state_token_dim)),
                        jnp.float32)
    amask = jnp.ones((B, 1, m.output_dim), jnp.float32)
    freqs = jnp.asarray([10.0])
    prior = jnp.asarray(rng.normal(size=(B, m.horizon, m.output_dim)) * 0.3,
                        jnp.float32)
    cold = Q.rdt_predict_action_quant(rcfg, qparams, jax.random.PRNGKey(21),
                                      lang, lang_mask, img, state, amask,
                                      freqs)
    warm = Q.rdt_predict_action_quant(rcfg, qparams, jax.random.PRNGKey(21),
                                      lang, lang_mask, img, state, amask,
                                      freqs, prior_chunk=prior, skip_steps=1)
    np.testing.assert_allclose(np.asarray(cold), fx["cold"],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(warm), fx["warm"],
                               rtol=1e-5, atol=1e-5)
