"""BRIDGeR controller: end-to-end predict pipeline, EMA semantics, training
step, and checkpoint roundtrip (the bridger_test conformance surface)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vla_touch_tpu.config import BridgeControllerConfig, InterpolantConfig
from vla_touch_tpu.models.controllers import bridge as B
from vla_touch_tpu.utils import ema as ema_lib

CFG = BridgeControllerConfig(
    state_dim=10, hidden_dim=64, force_dim=3, horizon=16,
    unet_down_dims=(32, 64, 64),
    interpolant=InterpolantConfig(diffusion_steps=10),
)


def _stats(d=10):
    return {
        "vla_mins": np.zeros(d, np.float32), "vla_maxs": np.ones(d, np.float32),
        "action_mins": np.zeros(d, np.float32), "action_maxs": np.ones(d, np.float32),
    }


def test_predict_shapes_and_finiteness(rng):
    st = B.init_bridge_controller(CFG, jax.random.PRNGKey(0))
    bs = 2
    out = B.bridge_predict(
        CFG, st.params, st.ema.shadow, _stats(), jax.random.PRNGKey(1),
        jnp.asarray(rng.normal(size=(bs, 10)), jnp.float32),
        jnp.asarray(rng.normal(size=(bs, 16, 10)), jnp.float32),
        cam1_feat=jnp.asarray(rng.normal(size=(bs, 384)), jnp.float32),
        cam2_feat=jnp.asarray(rng.normal(size=(bs, 384)), jnp.float32),
        forces=jnp.asarray(rng.normal(size=(bs, 3)), jnp.float32),
    )
    assert out.shape == (bs, 16, 10)
    assert np.isfinite(np.asarray(out)).all()


def test_predict_uses_ema_params(rng):
    """Sampling must run through the EMA shadow, not the live UNet params
    (bridge_model.py:267)."""
    st = B.init_bridge_controller(CFG, jax.random.PRNGKey(0))
    bs = 1
    args = (
        jnp.asarray(rng.normal(size=(bs, 10)), jnp.float32),
        jnp.asarray(rng.normal(size=(bs, 16, 10)), jnp.float32),
    )
    kw = dict(
        cam1_feat=jnp.asarray(rng.normal(size=(bs, 384)), jnp.float32),
        cam2_feat=jnp.asarray(rng.normal(size=(bs, 384)), jnp.float32),
        forces=jnp.asarray(rng.normal(size=(bs, 3)), jnp.float32),
    )
    out1 = B.bridge_predict(CFG, st.params, st.ema.shadow, _stats(),
                            jax.random.PRNGKey(1), *args, **kw)
    # Perturb the live SI params: output must NOT change.
    perturbed = dict(st.params)
    perturbed["si"] = jax.tree.map(lambda x: x + 1.0, st.params["si"])
    out2 = B.bridge_predict(CFG, perturbed, st.ema.shadow, _stats(),
                            jax.random.PRNGKey(1), *args, **kw)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)
    # Perturb the EMA shadow: output MUST change.
    shadow2 = jax.tree.map(lambda x: x + 0.5, st.ema.shadow)
    out3 = B.bridge_predict(CFG, st.params, shadow2, _stats(),
                            jax.random.PRNGKey(1), *args, **kw)
    assert not np.allclose(np.asarray(out1), np.asarray(out3), atol=1e-3)


def test_no_visual_no_force_variants(rng):
    for uv, uf in [(False, True), (True, False), (False, False)]:
        cfg = dataclasses.replace(CFG, use_visual=uv, use_force=uf)
        st = B.init_bridge_controller(cfg, jax.random.PRNGKey(0))
        kw = {}
        if uv:
            kw["cam1_feat"] = jnp.zeros((1, 384))
            kw["cam2_feat"] = jnp.zeros((1, 384))
        if uf:
            kw["forces"] = jnp.zeros((1, 3))
        out = B.bridge_predict(cfg, st.params, st.ema.shadow, _stats(),
                               jax.random.PRNGKey(1), jnp.zeros((1, 10)),
                               jnp.zeros((1, 16, 10)), **kw)
        assert out.shape == (1, 16, 10)


def test_training_step_reduces_loss_and_updates_ema(rng):
    st = B.init_bridge_controller(CFG, jax.random.PRNGKey(0))
    bs = 16
    batch = {
        "state": jnp.asarray(rng.normal(size=(bs, 10)), jnp.float32),
        "cam1_feat": jnp.asarray(rng.normal(size=(bs, 384)), jnp.float32),
        "cam2_feat": jnp.asarray(rng.normal(size=(bs, 384)), jnp.float32),
        "forces": jnp.asarray(rng.normal(size=(bs, 3)), jnp.float32),
        "vla_act": jnp.asarray(rng.normal(size=(bs, 16, 10)) * 0.5, jnp.float32),
    }
    batch["expert_act"] = batch["vla_act"] * 0.9 + 0.02

    opt = optax.adamw(1e-3, weight_decay=1e-6)
    opt_state = opt.init(st.params)
    params, ema_state = st.params, st.ema

    @jax.jit
    def step(params, opt_state, ema_state, key):
        (loss, parts), g = jax.value_and_grad(
            lambda p: B.bridge_loss(CFG, p, key, batch), has_aux=True)(params)
        updates, opt_state = opt.update(g, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema_state = ema_lib.update_torch_ema(ema_state, params["si"], 0.75)
        return params, opt_state, ema_state, loss

    losses = []
    for i in range(25):
        params, opt_state, ema_state, loss = step(
            params, opt_state, ema_state, jax.random.PRNGKey(i))
        losses.append(float(loss))
    # The implicit SI loss is unbounded below; check it decreases.
    assert losses[-1] < losses[0], (losses[0], losses[-1])
    assert int(ema_state.num_updates) == 25
    # EMA shadow moved toward the trained params.
    d0 = sum(float(jnp.sum(jnp.abs(a - b))) for a, b in zip(
        jax.tree.leaves(st.ema.shadow), jax.tree.leaves(jax.tree.map(
            lambda x: x.astype(jnp.float32), st.params["si"]))))
    d1 = sum(float(jnp.sum(jnp.abs(a - b))) for a, b in zip(
        jax.tree.leaves(ema_state.shadow), jax.tree.leaves(jax.tree.map(
            lambda x: x.astype(jnp.float32), params["si"]))))
    assert d0 == 0.0 and d1 > 0.0


def test_checkpoint_roundtrip(tmp_path, rng):
    st = B.init_bridge_controller(CFG, jax.random.PRNGKey(3))
    st.stats = _stats()
    B.save_bridge_controller(str(tmp_path / "ck"), st)
    st2 = B.load_bridge_controller(str(tmp_path / "ck"))
    assert st2.cfg == CFG
    bs = 1
    args = (
        jnp.asarray(rng.normal(size=(bs, 10)), jnp.float32),
        jnp.asarray(rng.normal(size=(bs, 16, 10)), jnp.float32),
    )
    kw = dict(cam1_feat=jnp.zeros((bs, 384)), cam2_feat=jnp.zeros((bs, 384)),
              forces=jnp.zeros((bs, 3)))
    a = B.bridge_predict(CFG, st.params, st.ema.shadow, st.stats,
                         jax.random.PRNGKey(5), *args, **kw)
    b = B.bridge_predict(st2.cfg, st2.params, st2.ema.shadow, st2.stats,
                         jax.random.PRNGKey(5), *args, **kw)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_bf16_inference_close_to_f32(rng):
    """bfloat16 SDE sampling (the TPU serving path) stays within ~1% of the
    float32 result at matched noise."""
    cfg16 = dataclasses.replace(CFG, inference_dtype="bfloat16")
    st = B.init_bridge_controller(CFG, jax.random.PRNGKey(0))
    args = (
        jnp.asarray(rng.normal(size=(2, 10)), jnp.float32),
        jnp.asarray(rng.normal(size=(2, 16, 10)), jnp.float32),
    )
    kw = dict(cam1_feat=jnp.asarray(rng.normal(size=(2, 384)), jnp.float32),
              cam2_feat=jnp.asarray(rng.normal(size=(2, 384)), jnp.float32),
              forces=jnp.asarray(rng.normal(size=(2, 3)), jnp.float32))
    a = B.bridge_predict(CFG, st.params, st.ema.shadow, _stats(),
                         jax.random.PRNGKey(1), *args, **kw)
    b = B.bridge_predict(cfg16, st.params, st.ema.shadow, _stats(),
                         jax.random.PRNGKey(1), *args, **kw)
    rel = float(jnp.abs(a - b).max()) / max(float(jnp.abs(a).max()), 1e-6)
    assert rel < 0.05, rel


def test_torch_ema_decay_schedule():
    """torch_ema with use_num_updates: decay = min(0.75, (1+n)/(10+n))."""
    n = jnp.asarray(5)
    assert abs(float(ema_lib.torch_ema_decay(0.75, n)) - (1 + 5) / (10 + 5)) < 1e-6
    n = jnp.asarray(1000)
    assert abs(float(ema_lib.torch_ema_decay(0.75, n)) - 0.75) < 1e-6
