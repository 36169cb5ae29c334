"""Regression tests for the round-1 self-review findings."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vla_touch_tpu.config import LSTMControllerConfig


def test_lstm_obs_encoder_receives_gradients(rng):
    """Review finding: obs_cond computed outside the loss froze obs_fc*."""
    from vla_touch_tpu.models.controllers import lstm as L
    from vla_touch_tpu.train.lstm_train import _loss_with_obs

    ccfg = LSTMControllerConfig(hidden_dim=32, num_layers=1)
    st = L.init_lstm_controller(ccfg, jax.random.PRNGKey(0))
    B, T = 4, 6
    batch = {
        "state": jnp.asarray(rng.normal(size=(B, 10)), jnp.float32),
        "cam1_feat": jnp.asarray(rng.normal(size=(B, 384)), jnp.float32),
        "cam2_feat": jnp.asarray(rng.normal(size=(B, 384)), jnp.float32),
        "vla_act": jnp.asarray(rng.normal(size=(B, T, 10)), jnp.float32),
        "expert_act": jnp.asarray(rng.normal(size=(B, T, 10)), jnp.float32),
        "forces": jnp.asarray(rng.normal(size=(B, T, 3)), jnp.float32),
    }
    g = jax.grad(lambda p: _loss_with_obs(ccfg, p, batch))(st.params)
    for name in ("obs_fc1", "obs_fc2", "obs_fc3"):
        gn = float(jnp.linalg.norm(g[name]["kernel"]))
        assert gn > 0, f"{name} got zero gradient"


def test_vla_dataset_short_episode_returns_none(tmp_path):
    """Review finding: short episodes crashed rng.integers(low >= high)."""
    from vla_touch_tpu.config import DataConfig
    from vla_touch_tpu.data.episode import write_synthetic_episode
    from vla_touch_tpu.data.vla_dataset import UnifiedVLADataset

    path = str(tmp_path / "ep.h5")
    write_synthetic_episode(path, num_steps=33, img_size=24, chunk=8,
                            lang_dim=16, with_vla=False)
    cfg = DataConfig(chunk_size=64)  # chunk//2 = 32 -> high <= onset
    ds = UnifiedVLADataset(cfg, file_paths=[path], dataset_name="x")
    assert ds.parse_file(path) is None  # no ValueError


def test_splice_adjacent_placeholders(rng):
    """Review finding: '<tact><tact>' tripped the segment-count assert."""
    from vla_touch_tpu.planning.llm_splice import process_user_input

    D = 4
    out = process_user_input(
        "rank: <tact><tact>", [1, 2],
        lambda s: np.ones((len(s.split()), D), np.float32) if s.strip()
        else np.zeros((0, D), np.float32),
        lambda v: np.full((1, D), float(v), np.float32),
        lambda f: f,
        np.zeros(D, np.float32), np.zeros(D, np.float32))
    # "rank:" (1 token) + [s, t1, e] + [s, t2, e] = 7 rows.
    assert np.asarray(out).shape == (7, D)


def test_prefetch_error_with_two_workers_terminates():
    """Review finding: multi-worker errors could yield None batches or hang."""
    from vla_touch_tpu.data.pipeline import PrefetchLoader

    def make():
        raise RuntimeError("both workers die")

    with PrefetchLoader(make, depth=1, workers=2, num_batches=10) as loader:
        with pytest.raises(RuntimeError, match="both workers die"):
            for batch in loader:
                assert batch is not None


def test_llm_dataset_missing_split_is_train_only(tmp_path):
    import json

    from vla_touch_tpu.planning.datasets import TactileLLMDataset

    rows = [{"question": "q <tact>", "tactile": ["t"], "answer": "a"}]
    p = str(tmp_path / "qa.json")
    json.dump(rows, open(p, "w"))
    assert len(TactileLLMDataset([p], "train")) == 1
    assert len(TactileLLMDataset([p], "test")) == 0


def test_controller_checkpoint_persists_image_encoder(tmp_path):
    """Review finding: eval re-initialized DinoV2 with a different seed."""
    from vla_touch_tpu.models.encoders import dinov2_runtime as dino
    from vla_touch_tpu.models.encoders.vit import ViTConfig

    tiny = ViTConfig(hidden_size=384, num_layers=1, num_heads=4, mlp_dim=64,
                     image_size=28, patch_size=14)
    # Use the tiny config through the registry.
    import unittest.mock as mock

    with mock.patch.dict(dino._CONFIGS, {"dinov2-small": tiny}):
        params = dino.init_params("dinov2-small", jax.random.PRNGKey(3))
        dino.save_params(str(tmp_path), "dinov2-small", params)
        loaded = dino.load_params(str(tmp_path), "dinov2-small")
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert dino.load_params(str(tmp_path / "missing"), "dinov2-small") is None
