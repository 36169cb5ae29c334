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
