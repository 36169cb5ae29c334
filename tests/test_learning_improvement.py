"""True-learning validation: on episodes where the VLA chunk is a *biased*
copy of the expert trajectory, trained controllers must beat the raw VLA
(positive improvement %, the reference's headline eval metric)."""

import os

import h5py
import numpy as np
import pytest

from vla_touch_tpu.config import (
    BridgeControllerConfig,
    BridgeTrainConfig,
    InterpolantConfig,
    LSTMControllerConfig,
    LSTMTrainConfig,
)
from vla_touch_tpu.data.episode import write_synthetic_episode
from vla_touch_tpu.models.encoders import dinov2_runtime as dino
from vla_touch_tpu.models.encoders.vit import ViTConfig

pytestmark = pytest.mark.slow

TINY_DINO = ViTConfig(hidden_size=384, num_layers=1, num_heads=4, mlp_dim=64,
                      image_size=28, patch_size=14)
HORIZON = 8


@pytest.fixture(autouse=True)
def tiny_dino(monkeypatch):
    monkeypatch.setitem(dino._CONFIGS, "dinov2-small", TINY_DINO)


@pytest.fixture(scope="module")
def biased_dataset(tmp_path_factory):
    """Episodes whose vla_action = expert shifted by a constant bias: a
    refinement controller can fully correct it from the action alone."""
    root = tmp_path_factory.mktemp("biased")
    bias = np.array([0.05, -0.03, 0.04, 0.02, -0.02, 0.03, -0.04, 0.02,
                     0.01, 20.0])  # gripper bias in raw units
    for e in range(3):
        path = str(root / f"episode_{e}.h5")
        write_synthetic_episode(path, num_steps=48, img_size=28, chunk=16,
                                lang_dim=16, seed=e, resized_size=28)
        with h5py.File(path, "a") as f:
            from vla_touch_tpu.data.episode import qpos_from_episode

            qpos = qpos_from_episode(f)
            T = qpos.shape[0]
            vla = np.zeros((T, 16, 10))
            for t in range(T):
                idx = np.minimum(np.arange(t, t + 16), T - 1)
                vla[t] = qpos[idx] + bias  # biased "VLA" prediction
            del f["vla_action"]
            f.create_dataset("vla_action", data=vla)
    return str(root)


def test_lstm_achieves_positive_improvement(biased_dataset, tmp_path):
    from vla_touch_tpu.eval.lstm_step_test import test_lstm_controller
    from vla_touch_tpu.train.lstm_train import train_lstm_controller_with_dataset

    ccfg = LSTMControllerConfig(hidden_dim=64, num_layers=1)
    tcfg = LSTMTrainConfig(horizon=HORIZON, batch_size=32, epochs=25,
                           eval_period_epochs=100, val_ratio=0.34, seed=0,
                           learning_rate=1e-3)
    out = str(tmp_path / "lstm")
    state, trainer = train_lstm_controller_with_dataset(
        biased_dataset, out, ccfg, tcfg)
    res = test_lstm_controller(os.path.join(out, "final"), biased_dataset,
                               num_samples=24, horizon=HORIZON,
                               image_encoder_params=trainer.img_params)
    # The bias is the dominant error; a trained residual controller must
    # remove most of it.
    assert res["improvement_pct"] > 50.0, res


def test_bridge_achieves_positive_improvement(biased_dataset, tmp_path):
    from vla_touch_tpu.eval.bridge_test import test_diffusion_controller
    from vla_touch_tpu.train.bridge_train import (
        train_diffusion_controller_with_dataset)

    ccfg = BridgeControllerConfig(
        hidden_dim=32, horizon=HORIZON, unet_down_dims=(32, 64),
        interpolant=InterpolantConfig(diffusion_steps=10))
    # The implicit v/s/b objective needs far more optimizer steps than the
    # LSTM's direct MSE: small batches + many epochs on the tiny task.
    tcfg = BridgeTrainConfig(horizon=HORIZON, batch_size=16, epochs=150,
                             val_ratio=0.34, seed=0, learning_rate=1e-3)
    out = str(tmp_path / "bridge")
    state, trainer = train_diffusion_controller_with_dataset(
        biased_dataset, out, ccfg, tcfg)
    res = test_diffusion_controller(
        os.path.join(out, "final"), biased_dataset, num_samples=24, seed=0,
        image_encoder_params=trainer.img_params)
    # The SDE bridge transports the biased prior toward the expert: it must
    # beat the raw VLA (positive improvement).
    assert res["improvement_pct"] > 0.0, res
