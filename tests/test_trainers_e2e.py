"""End-to-end trainer + eval-harness tests on synthetic episodes: the
bridge_train → bridger_test and lstm_train → lstm_step_test pipelines."""

import dataclasses
import os

import numpy as np
import pytest

from vla_touch_tpu.config import (
    BridgeControllerConfig,
    BridgeTrainConfig,
    InterpolantConfig,
    LSTMControllerConfig,
    LSTMTrainConfig,
)
from vla_touch_tpu.data import episode as E
from vla_touch_tpu.data.controller_dataset import ControllerDataModule

HORIZON = 8

BCFG = BridgeControllerConfig(
    hidden_dim=32, horizon=HORIZON, unet_down_dims=(16, 32),
    image_model="dinov2-small",
    interpolant=InterpolantConfig(diffusion_steps=5))
LCFG = LSTMControllerConfig(hidden_dim=32, num_layers=1)

# Tiny DinoV2 for tests: patch the runtime registry.
from vla_touch_tpu.models.encoders import dinov2_runtime as dino  # noqa: E402
from vla_touch_tpu.models.encoders.vit import ViTConfig  # noqa: E402

pytestmark = pytest.mark.slow

TINY_DINO = ViTConfig(hidden_size=384, num_layers=1, num_heads=4, mlp_dim=64,
                      image_size=28, patch_size=14)


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("episodes")
    E.make_synthetic_dataset(str(root), n_episodes=3, num_steps=48,
                             img_size=28, chunk=16, lang_dim=32,
                             resized_size=28)
    return str(root)


@pytest.fixture(autouse=True)
def tiny_dino(monkeypatch):
    monkeypatch.setitem(dino._CONFIGS, "dinov2-small", TINY_DINO)


def test_bridge_train_and_test_harness(dataset_dir, tmp_path):
    from vla_touch_tpu.eval.bridge_test import test_diffusion_controller
    from vla_touch_tpu.train.bridge_train import (
        train_diffusion_controller_with_dataset)

    tcfg = BridgeTrainConfig(horizon=HORIZON, batch_size=8, epochs=2,
                             val_ratio=0.34, seed=0)
    out = str(tmp_path / "bridge_out")
    state, trainer = train_diffusion_controller_with_dataset(
        dataset_dir, out, BCFG, tcfg, num_epochs=2)

    assert os.path.exists(os.path.join(out, "final", "controller.msgpack"))
    assert os.path.exists(trainer.metrics_log)

    res = test_diffusion_controller(
        os.path.join(out, "final"), dataset_dir, num_samples=8, seed=0,
        image_encoder_params=trainer.img_params)
    assert np.isfinite(res["action_mse"]) and np.isfinite(res["vla_mse"])
    assert res["num_samples"] == 8
    # The synthetic VLA chunks are expert+noise, so vla_mse is small but
    # positive; the untrained-but-regularized controller must stay bounded.
    assert res["vla_mse"] > 0


def test_bridge_checkpoint_reload_gives_same_eval(dataset_dir, tmp_path):
    from vla_touch_tpu.eval.bridge_test import test_diffusion_controller
    from vla_touch_tpu.models.controllers.bridge import load_bridge_controller
    from vla_touch_tpu.train.bridge_train import (
        train_diffusion_controller_with_dataset)

    tcfg = BridgeTrainConfig(horizon=HORIZON, batch_size=8, epochs=1,
                             val_ratio=0.34, seed=0)
    out = str(tmp_path / "bridge_out2")
    state, trainer = train_diffusion_controller_with_dataset(
        dataset_dir, out, BCFG, tcfg, num_epochs=1)
    loaded = load_bridge_controller(os.path.join(out, "final"))
    dm = ControllerDataModule(dataset_dir, context_frames=2, horizon=HORIZON,
                              val_ratio=0.34, seed=42)
    a = test_diffusion_controller(None, None, 6, 0, trainer.img_params,
                                  state=state, data_module=dm)
    b = test_diffusion_controller(None, None, 6, 0, trainer.img_params,
                                  state=loaded, data_module=dm)
    np.testing.assert_allclose(a["action_mse"], b["action_mse"], rtol=1e-5)


def test_lstm_train_and_step_test(dataset_dir, tmp_path):
    from vla_touch_tpu.eval.lstm_step_test import test_lstm_controller
    from vla_touch_tpu.train.lstm_train import train_lstm_controller_with_dataset

    tcfg = LSTMTrainConfig(horizon=HORIZON, batch_size=8, epochs=2,
                           eval_period_epochs=1, val_ratio=0.34, seed=0)
    out = str(tmp_path / "lstm_out")
    state, trainer = train_lstm_controller_with_dataset(
        dataset_dir, out, LCFG, tcfg, num_epochs=2)
    assert os.path.exists(os.path.join(out, "final",
                                       "tactile_controller.msgpack"))

    res = test_lstm_controller(
        os.path.join(out, "final"), dataset_dir, num_samples=8,
        horizon=HORIZON, image_encoder_params=trainer.img_params)
    assert np.isfinite(res["action_mse"])
    assert res["vla_mse"] > 0


def test_lstm_training_reduces_loss(dataset_dir, tmp_path):
    """Loss after 12 epochs must be well below the first-epoch loss — the
    model learns the (deterministic) expert = f(vla) mapping."""
    import json

    from vla_touch_tpu.train.lstm_train import train_lstm_controller_with_dataset

    tcfg = LSTMTrainConfig(horizon=HORIZON, batch_size=16, epochs=12,
                           eval_period_epochs=100, val_ratio=0.34, seed=0,
                           learning_rate=3e-4)
    out = str(tmp_path / "lstm_out2")
    _, trainer = train_lstm_controller_with_dataset(
        dataset_dir, out, LCFG, tcfg, num_epochs=12)
    rows = [json.loads(l) for l in open(trainer.metrics_log)]
    first = rows[0]["loss"]
    last = np.mean([r["loss"] for r in rows[-3:]])
    assert last < first * 0.7, (first, last)
