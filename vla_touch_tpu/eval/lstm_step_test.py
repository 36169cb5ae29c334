"""Offline LSTM controller evaluation harness.

Equivalent of ``/root/reference/VLA/residual_controller/lstm_step_test.py``:
evaluates through the *stateful step-wise* ``predict_sequence`` path
(:141-145) and reports the same MSE/improvement metrics as bridge_test
(:170-177).
"""

from __future__ import annotations

import json
import logging
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vla_touch_tpu.data.controller_dataset import ControllerDataModule
from vla_touch_tpu.models.controllers import lstm as L
from vla_touch_tpu.models.encoders import dinov2_runtime as dino

logger = logging.getLogger("lstm_step_test")


def test_lstm_controller(ckpt_path: str, data_dir: str, num_samples: int = 50,
                         horizon: int = 32, seed: int = 0,
                         image_encoder_params: Optional[dict] = None,
                         state: Optional[L.LSTMControllerState] = None,
                         data_module: Optional[ControllerDataModule] = None,
                         visualize_dir: Optional[str] = None) -> dict:
    st = state if state is not None else L.load_lstm_controller(ckpt_path)
    ccfg = st.cfg
    dm = data_module or ControllerDataModule(
        data_dir, context_frames=2, horizon=horizon, use_images=True, seed=42)
    ds = dm.val_dataset if (dm.val_dataset and len(dm.val_dataset)) else dm.train_dataset

    rng = np.random.default_rng(seed)
    idxs = rng.integers(0, len(ds), size=min(num_samples, len(ds)))
    samples = [ds[int(i)] for i in idxs]
    batch = {k: np.stack([s[k] for s in samples]) for k in samples[0]}
    ctx = 2

    img_cfg = dino.config_for(ccfg.image_model)
    img_params = image_encoder_params
    if img_params is None and ckpt_path:
        img_params = dino.load_params(ckpt_path, ccfg.image_model)
    if img_params is None:
        logger.warning("no persisted image encoder in checkpoint; using a "
                       "random init — visual metrics are meaningless")
        img_params = dino.init_params(ccfg.image_model, jax.random.PRNGKey(7))
    f1 = dino.encode_images(img_cfg, img_params,
                            jnp.asarray(batch["images_cam1"][:, -1]))
    f2 = dino.encode_images(img_cfg, img_params,
                            jnp.asarray(batch["images_cam2"][:, -1]))
    obs_cond = L.lstm_encode_obs(ccfg, st.params,
                                 jnp.asarray(batch["states"][:, ctx - 1]),
                                 f1, f2)

    horizon_len = batch["vla_actions"].shape[1]
    refined = L.lstm_predict_sequence(
        ccfg, st.params, st.stats, obs_cond,
        jnp.asarray(batch["vla_actions"]),
        # Decision-time forces (reference lstm_step_test.py:112).
        jnp.asarray(batch["forces"][:, ctx - 1: ctx - 1 + horizon_len]))

    expert = batch["expert_actions"]
    vla = batch["vla_actions"]
    refined = np.asarray(refined)

    if visualize_dir:
        from vla_touch_tpu.eval.visualize import plot_samples

        plot_samples(expert, vla, refined, visualize_dir)

    action_mse = float(np.mean((refined - expert) ** 2))
    vla_mse = float(np.mean((vla - expert) ** 2))
    improvement = (1.0 - action_mse / vla_mse) * 100.0 if vla_mse > 0 else 0.0
    result = {
        "action_mse": action_mse,
        "vla_mse": vla_mse,
        "improvement_pct": improvement,
        "num_samples": len(samples),
    }
    logger.info("lstm_step_test: %s", json.dumps(result))
    print(f"Refined action MSE vs expert: {action_mse:.6f}")
    print(f"VLA action MSE vs expert:     {vla_mse:.6f}")
    print(f"Improvement: {improvement:.2f}%")
    return result


def test(argv=None):
    """Reference-named entry (lstm_step_test.py:188-205)."""
    main(argv)


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description="Evaluate an LSTM controller checkpoint")
    p.add_argument("--ckpt_path", required=True)
    p.add_argument("--data_dir", required=True)
    p.add_argument("--num_samples", type=int, default=50)
    p.add_argument("--horizon", type=int, default=32)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--visualize_dir", default=None,
                   help="write 4-panel trajectory plots here")
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    test_lstm_controller(args.ckpt_path, args.data_dir, args.num_samples,
                         args.horizon, args.seed,
                         visualize_dir=args.visualize_dir)


if __name__ == "__main__":
    main()
