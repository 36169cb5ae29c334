"""LSTM residual controller training.

TPU-native equivalent of
``/root/reference/VLA/residual_controller/lstm_train.py``: AdamW over the
obs/force encoders + LSTM + head (``:26-30``), normalized VLA/expert actions
(``:57-82``), eval every N epochs with best-model checkpointing
(``:98-110``).
"""

from __future__ import annotations

import logging
import os
import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vla_touch_tpu.config import LSTMControllerConfig, LSTMTrainConfig
from vla_touch_tpu.data.controller_dataset import ControllerDataModule
from vla_touch_tpu.models.controllers import lstm as L
from vla_touch_tpu.models.encoders import dinov2_runtime as dino
from vla_touch_tpu.utils.normalization import normalize_actions

logger = logging.getLogger("lstm_train")


def _loss_with_obs(ccfg, params, batch, dropout_key=None):
    # The observation encoder MUST sit inside the differentiated loss: the
    # reference trains obs_encoder jointly (lstm_train.py:26-30), so
    # obs_cond is recomputed here from raw state + frozen image features.
    obs_cond = L.LSTMControllerModule(ccfg).apply(
        {"params": params}, batch["state"], batch["cam1_feat"],
        batch["cam2_feat"], method=L.LSTMControllerModule.encode_obs)
    inner = {"obs_cond": obs_cond, "vla_act": batch["vla_act"],
             "forces": batch["forces"], "expert_act": batch["expert_act"]}
    return L.lstm_loss(ccfg, params, inner, dropout_key=dropout_key)


@partial(jax.jit, static_argnames=("ccfg",), donate_argnums=(1, 2))
def _train_step(ccfg: LSTMControllerConfig, params, opt_state, key, batch,
                lr):
    opt = optax.adamw(learning_rate=lr, weight_decay=1e-6)
    loss, grads = jax.value_and_grad(
        lambda p: _loss_with_obs(ccfg, p, batch, dropout_key=key))(params)
    updates, opt_state = opt.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, loss


@partial(jax.jit, static_argnames=("ccfg",))
def _eval_loss(ccfg: LSTMControllerConfig, params, batch):
    return _loss_with_obs(ccfg, params, batch)


class LSTMControllerTrainer:
    def __init__(self, ccfg: LSTMControllerConfig, tcfg: LSTMTrainConfig,
                 output_dir: str, stats: dict,
                 image_encoder_params: Optional[dict] = None, seed: int = 0):
        self.ccfg, self.tcfg = ccfg, tcfg
        self.output_dir = output_dir
        os.makedirs(output_dir, exist_ok=True)
        key = jax.random.PRNGKey(seed)
        k_init, k_img, self.key = jax.random.split(key, 3)
        self.state = L.init_lstm_controller(ccfg, k_init)
        self.state.stats = stats
        self.opt = optax.adamw(tcfg.learning_rate,
                               weight_decay=tcfg.weight_decay)
        self.opt_state = self.opt.init(self.state.params)
        self.img_cfg = dino.config_for(ccfg.image_model)
        self.img_params = (image_encoder_params if image_encoder_params
                           is not None
                           else dino.init_params(ccfg.image_model, k_img))
        self.best_val = float("inf")
        from vla_touch_tpu.utils.metrics import MetricsLogger

        self.metrics = MetricsLogger(output_dir)
        self.metrics_log = self.metrics.jsonl_path

    def prepare_batch(self, batch: dict) -> dict:
        stats = self.state.stats
        ctx = 2
        f1 = dino.encode_images(self.img_cfg, self.img_params,
                                jnp.asarray(batch["images_cam1"][:, -1]))
        f2 = dino.encode_images(self.img_cfg, self.img_params,
                                jnp.asarray(batch["images_cam2"][:, -1]))
        horizon = batch["vla_actions"].shape[1]
        return {
            "state": jnp.asarray(batch["states"][:, ctx - 1]),
            "cam1_feat": f1,
            "cam2_feat": f2,
            "vla_act": normalize_actions(jnp.asarray(batch["vla_actions"]),
                                         stats, "vla"),
            "expert_act": normalize_actions(
                jnp.asarray(batch["expert_actions"]), stats, "expert"),
            # Decision-time forces: force observed BEFORE each executed step
            # (reference lstm_train.py: forces[:, ctx-1:-1]).
            "forces": jnp.asarray(
                batch["forces"][:, ctx - 1: ctx - 1 + horizon]),
        }

    def train(self, data_module: ControllerDataModule,
              num_epochs: Optional[int] = None, log_every: int = 10):
        tcfg = self.tcfg
        num_epochs = num_epochs or tcfg.epochs
        rng = np.random.default_rng(tcfg.seed)
        step, t0 = 0, time.time()
        for epoch in range(num_epochs):
            for batch in data_module.train_dataset.batches(
                    min(tcfg.batch_size, len(data_module.train_dataset)), rng,
                    workers=tcfg.prefetch_workers):
                self.key, k = jax.random.split(self.key)
                dev_batch = self.prepare_batch(batch)
                self.state.params, self.opt_state, loss = _train_step(
                    self.ccfg, self.state.params, self.opt_state, k,
                    dev_batch, tcfg.learning_rate)
                if step % log_every == 0:
                    row = self.metrics.log(step, {"loss": float(loss)},
                                           epoch=epoch)
                    logger.info("step %d loss %.5f", step, row["loss"])
                step += 1
            if (epoch + 1) % tcfg.eval_period_epochs == 0:
                val = self.validate(data_module)
                if val is not None and val < self.best_val:
                    self.best_val = val
                    self._save(os.path.join(self.output_dir, "best"))
                    logger.info("epoch %d new best val %.5f", epoch, val)
        self._save(os.path.join(self.output_dir, "final"))
        return self.state

    def _save(self, path: str):
        L.save_lstm_controller(path, self.state)
        dino.save_params(path, self.ccfg.image_model, self.img_params)

    def validate(self, data_module) -> Optional[float]:
        if data_module.val_dataset is None or len(data_module.val_dataset) == 0:
            return None
        rng = np.random.default_rng(0)
        losses = []
        for batch in data_module.val_dataset.batches(
                min(self.tcfg.batch_size, len(data_module.val_dataset)), rng,
                shuffle=False):
            losses.append(float(_eval_loss(self.ccfg, self.state.params,
                                           self.prepare_batch(batch))))
        return float(np.mean(losses)) if losses else None


def train_lstm_controller_with_dataset(
        data_dir: str, output_dir: str,
        ccfg: Optional[LSTMControllerConfig] = None,
        tcfg: Optional[LSTMTrainConfig] = None,
        image_encoder_params: Optional[dict] = None,
        num_epochs: Optional[int] = None):
    ccfg = ccfg or LSTMControllerConfig()
    tcfg = tcfg or LSTMTrainConfig()
    dm = ControllerDataModule(data_dir, context_frames=2, horizon=tcfg.horizon,
                              use_images=True, val_ratio=tcfg.val_ratio,
                              seed=tcfg.seed, data_format=tcfg.data_format)
    trainer = LSTMControllerTrainer(ccfg, tcfg, output_dir, stats=dm.stats,
                                    image_encoder_params=image_encoder_params,
                                    seed=tcfg.seed)
    state = trainer.train(dm, num_epochs=num_epochs)
    return state, trainer


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description="Train the LSTM residual controller")
    p.add_argument("--data_dir", required=True)
    p.add_argument("--output_dir", default="checkpoints/lstm")
    p.add_argument("--horizon", type=int, default=32)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--epochs", type=int, default=500)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--data_format", default="h5", choices=("h5", "epc"))
    p.add_argument("--prefetch_workers", type=int, default=0)
    args = p.parse_args(argv)
    ccfg = LSTMControllerConfig()
    tcfg = LSTMTrainConfig(horizon=args.horizon, batch_size=args.batch_size,
                           epochs=args.epochs, learning_rate=args.lr,
                           seed=args.seed, data_format=args.data_format,
                           prefetch_workers=args.prefetch_workers)
    logging.basicConfig(level=logging.INFO)
    train_lstm_controller_with_dataset(args.data_dir, args.output_dir, ccfg,
                                       tcfg)


if __name__ == "__main__":
    main()
