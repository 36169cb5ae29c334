"""Profiling registry, Sparsh encoder, ROS adapter utilities."""

import time

import jax
import numpy as np
import pytest

from vla_touch_tpu.models.encoders.sparsh import (
    SPARSH_VIT_B,
    SparshEncoder,
    load_pretrained_encoder,
    strip_prefix,
)
from vla_touch_tpu.models.encoders.vit import ViTConfig
from vla_touch_tpu.runtime.ros_adapter import RosOperator, interpolate_action
from vla_touch_tpu.utils import profiling as prof


def test_stage_stats():
    prof.reset_stages()
    with prof.stage("a"):
        time.sleep(0.01)
    with prof.stage("a"):
        time.sleep(0.02)
    prof.record("b", 0.5)
    stats = prof.stage_stats(reset=True)
    assert stats["a"]["count"] == 2
    assert 5 < stats["a"]["p50_ms"] < 60
    assert abs(stats["b"]["mean_ms"] - 500) < 1
    assert prof.stage_stats() == {}


def test_sparsh_encoder_six_channel(rng):
    tiny = ViTConfig(hidden_size=32, num_layers=1, num_heads=4, mlp_dim=64,
                     patch_size=16, image_size=32, num_channels=6,
                     use_layerscale=False)
    params = load_pretrained_encoder(None, cfg=tiny)
    x = rng.normal(size=(2, 32, 32, 6)).astype(np.float32)
    out = SparshEncoder(tiny).apply({"params": params}, np.asarray(x))
    assert out.shape == (2, 32)
    assert SPARSH_VIT_B.num_channels == 6


def test_strip_prefix():
    sd = {"model.blocks.0.norm1.weight": 1, "module.pos_embed": 2,
          "cls_token": 3}
    out = strip_prefix(sd)
    assert set(out) == {"blocks.0.norm1.weight", "pos_embed", "cls_token"}


def test_ros_operator_gated():
    with pytest.raises(RuntimeError, match="rospy"):
        RosOperator()


def test_interpolate_action():
    prev = np.zeros(3)
    target = np.array([1.0, -1.0, 0.05])
    out = interpolate_action(prev, target, max_step=np.array([0.1, 0.1, 0.1]))
    np.testing.assert_allclose(out, [0.1, -0.1, 0.05])


def test_orbax_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from vla_touch_tpu.utils.checkpoint import (
        load_pytree_orbax,
        save_pytree_orbax,
    )

    tree = {"a": jnp.arange(12.0).reshape(3, 4),
            "b": {"c": jnp.ones(5, jnp.int32)}}
    path = str(tmp_path / "orbax_ck")
    save_pytree_orbax(path, tree)
    back = load_pytree_orbax(path, jax.tree.map(jnp.zeros_like, tree))
    for x, y in zip(jax.tree.leaves(tree), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_rdt_ema_decay_schedule():
    import jax.numpy as jnp

    from vla_touch_tpu.utils.ema import rdt_ema_decay

    # Before update_after_step the decay is exactly 0 (copy weights).
    assert float(rdt_ema_decay(jnp.asarray(0), update_after_step=5)) == 0.0
    # Warmup: grows with step, capped by max_value.
    d10 = float(rdt_ema_decay(jnp.asarray(10), inv_gamma=1.0, power=0.75))
    d1000 = float(rdt_ema_decay(jnp.asarray(1000), inv_gamma=1.0, power=0.75))
    assert 0 < d10 < d1000 <= 0.9999


def test_stochastic_round_bf16_unbiased():
    import jax
    import jax.numpy as jnp

    from vla_touch_tpu.utils.ema import stochastic_round_bf16

    # A value a quarter of the way between bf16 neighbours (ulp at 1.0 is
    # 2^-7): nearest rounding always picks the low side; SR must pick the
    # high side ~1/4 of the time and be unbiased in the mean.
    x = jnp.full((20000,), 1.0 + 2.0 ** -9, jnp.float32)
    r = stochastic_round_bf16(jax.random.PRNGKey(0), x).astype(jnp.float32)
    assert set(np.unique(np.asarray(r))) == {1.0, 1.0 + 2.0 ** -7}
    np.testing.assert_allclose(float(r.mean()), 1.0 + 2.0 ** -9, atol=1e-4)
    # Exactly-representable values pass through untouched.
    y = jnp.asarray([0.0, 1.0, -2.5, 2.0 ** -15], jnp.float32)
    r2 = stochastic_round_bf16(jax.random.PRNGKey(1), y)
    np.testing.assert_array_equal(np.asarray(r2, np.float32), np.asarray(y))


def test_bf16_sr_ema_tracks_where_nearest_rounding_stalls():
    """decay=0.999 updates are <=1e-3 here — under half a bf16 ulp (2^-8
    around [1,2)), so a nearest-rounded bf16 EMA never moves off 1.0.  The
    SR shadow must converge to the (constant) params like the f32 oracle."""
    import jax
    import jax.numpy as jnp

    from vla_touch_tpu.utils import ema as ema_lib

    target = {"w": jnp.full((256,), 2.0, jnp.float32)}
    start = {"w": jnp.ones((256,), jnp.float32)}
    decay = 0.999
    n = 3000

    def run(dtype):
        st = ema_lib.init(start, dtype=dtype)

        def body(carry, k):
            return ema_lib.update(carry, target, decay,
                                  key=(k if dtype == jnp.bfloat16
                                       else None)), None

        keys = jax.random.split(jax.random.PRNGKey(0), n)
        st, _ = jax.lax.scan(body, st, keys)
        return float(jnp.mean(st.shadow["w"].astype(jnp.float32)))

    f32 = run(jnp.float32)      # ~= 2 - 0.999^3000 ~= 1.95
    sr = run(jnp.bfloat16)
    assert abs(sr - f32) < 0.02, (sr, f32)
    assert f32 > 1.9


def test_train_step_ema_dtype_bf16(rng):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from vla_touch_tpu.config import NoiseSchedulerConfig, TrainConfig, rdt_tiny
    from vla_touch_tpu.models.rdt import runner as R
    from vla_touch_tpu.train import rdt_train as T

    rcfg = R.RDTRunnerConfig(model=rdt_tiny(), noise=NoiseSchedulerConfig())
    tcfg = TrainConfig(lr_warmup_steps=0, ema_dtype="bfloat16",
                       accum_dtype="bfloat16")
    state = T.init_train_state(rcfg, tcfg, jax.random.PRNGKey(0))
    assert jax.tree.leaves(state.ema.shadow)[0].dtype == jnp.bfloat16
    m = rcfg.model
    B = 2
    r = lambda *s: jnp.asarray(rng.normal(size=(1, B) + s), jnp.float32)
    batch = {
        "lang_tokens": r(6, m.lang_token_dim),
        "lang_mask": jnp.ones((1, B, 6), bool),
        "img_tokens": r(m.img_cond_len, m.img_token_dim),
        "state_tokens": r(1, m.state_token_dim),
        "action_gt": r(m.horizon, m.output_dim),
        "action_mask": jnp.ones((1, B, 1, m.output_dim)),
        "ctrl_freqs": jnp.full((1, B), 10.0),
    }
    new_state, metrics = jax.jit(
        lambda s, k, b: T.train_step(rcfg, tcfg, s, k, b)
    )(state, jax.random.PRNGKey(1), batch)
    assert np.isfinite(float(metrics["loss"]))
    assert jax.tree.leaves(new_state.ema.shadow)[0].dtype == jnp.bfloat16


def test_serving_app_gated_without_fastapi(monkeypatch):
    import builtins
    import sys

    from vla_touch_tpu.models.encoders.vit import ViTConfig
    from vla_touch_tpu.planning import encoder as PE
    from vla_touch_tpu.planning.serving import TactileDescriptionService, build_app

    tiny = ViTConfig(hidden_size=32, num_layers=1, num_heads=4, mlp_dim=64,
                     patch_size=16, image_size=32, use_layerscale=False,
                     quick_gelu=True, use_pre_norm=True, layernorm_eps=1e-5,
                     patch_bias=False)
    svc = TactileDescriptionService(PE.init_tactile_encoder(tiny))

    real_import = builtins.__import__

    def block_fastapi(name, *a, **kw):
        if name == "fastapi":
            raise ImportError("no fastapi")
        return real_import(name, *a, **kw)

    monkeypatch.setattr(builtins, "__import__", block_fastapi)
    with pytest.raises(RuntimeError, match="fastapi"):
        build_app(svc)
