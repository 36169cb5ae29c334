"""BRIDGeR controller training.

TPU-native equivalent of
``/root/reference/VLA/residual_controller/bridge_train.py`` (and its
``_no_force`` / ``_no_visual`` ablations, which are config flags here):

- AdamW over the SI nets + observation encoder (``:50-57``), cosine LR;
- per-step EMA of the UNet bundle (torch_ema decay 0.75, ``:334``);
- batch prep: current state = last context frame (raw gripper scale),
  current images/forces, normalized vla/expert chunks (``:105-164``);
- optional auxiliary force-reconstruction loss;
- val-loss-gated best checkpoint + periodic checkpoints with pruning
  (``:215-265``);
- jsonl metrics log (v/s/b losses per step ≙ the TensorBoard scalars).

The whole optimizer step (obs encode is pre-computed per batch through the
frozen DinoV2) is one jitted function.
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

from vla_touch_tpu.config import BridgeControllerConfig, BridgeTrainConfig
from vla_touch_tpu.data.controller_dataset import ControllerDataModule
from vla_touch_tpu.models.controllers import bridge as B
from vla_touch_tpu.models.encoders import dinov2_runtime as dino
from vla_touch_tpu.utils import ema as ema_lib
from vla_touch_tpu.utils.normalization import normalize_actions

logger = logging.getLogger("bridge_train")


@partial(jax.jit, static_argnames=("ccfg",), donate_argnums=(1, 2, 3))
def _train_step(ccfg: BridgeControllerConfig, params, opt_state, ema_state,
                key, batch, opt_hparams):
    # Plain adamw with a traced lr scalar: the state pytree structure is
    # lr-independent, so it matches the trainer's init.
    opt = optax.adamw(learning_rate=opt_hparams["lr"],
                      weight_decay=opt_hparams["wd"])

    def loss_fn(p):
        total, parts = B.bridge_loss(ccfg, p, key, batch)
        if ccfg.use_force and "current_force" in batch:
            obs_cond = B.BridgeControllerModule(ccfg).apply(
                {"params": p}, batch["state"], batch.get("cam1_feat"),
                batch.get("cam2_feat"), batch.get("forces"),
                method=B.BridgeControllerModule.encode_obs)
            total = total + B.bridge_force_reconstruction_loss(
                ccfg, p, obs_cond, batch["current_force"])
        return total, parts

    (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    updates, opt_state = opt.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    ema_state = ema_lib.update_torch_ema(ema_state, params["si"], 0.75)
    metrics = {"loss": loss, "v_loss": parts.v_loss, "s_loss": parts.s_loss,
               "b_loss": parts.b_loss}
    return params, opt_state, ema_state, metrics


@partial(jax.jit, static_argnames=("ccfg",))
def _val_loss(ccfg: BridgeControllerConfig, params, key, batch):
    total, parts = B.bridge_loss(ccfg, params, key, batch)
    return total


class DiffusionControllerTrainer:
    """Reference-named trainer class (public API)."""

    def __init__(self, ccfg: BridgeControllerConfig, tcfg: BridgeTrainConfig,
                 output_dir: str, stats: dict,
                 image_encoder_params: Optional[dict] = None, seed: int = 0):
        self.ccfg = ccfg
        self.tcfg = tcfg
        self.output_dir = output_dir
        os.makedirs(output_dir, exist_ok=True)
        key = jax.random.PRNGKey(seed)
        k_init, k_img, self.key = jax.random.split(key, 3)
        self.state = B.init_bridge_controller(ccfg, k_init)
        self.state.stats = stats
        self.opt = optax.adamw(learning_rate=tcfg.learning_rate,
                               weight_decay=tcfg.weight_decay)
        self.opt_state = self.opt.init(self.state.params)
        if ccfg.use_visual:
            self.img_cfg = dino.config_for(ccfg.image_model)
            self.img_params = (image_encoder_params if image_encoder_params
                               is not None else
                               dino.init_params(ccfg.image_model, k_img))
        self.best_val = float("inf")
        from vla_touch_tpu.utils.metrics import MetricsLogger

        self.metrics = MetricsLogger(output_dir)
        self.metrics_log = self.metrics.jsonl_path

    def _lr(self, step: int, total_steps: int) -> float:
        # cosine schedule, matching the reference's CosineAnnealingLR.
        return float(0.5 * self.tcfg.learning_rate
                     * (1 + np.cos(np.pi * min(step / max(total_steps, 1), 1.0))))

    def prepare_batch(self, batch: dict) -> dict:
        """numpy ControllerDataset batch -> device batch for bridge_loss."""
        ccfg = self.ccfg
        ctx = ccfg.context_frames
        stats = self.state.stats
        out = {
            "state": jnp.asarray(batch["states"][:, ctx - 1]),
            "vla_act": normalize_actions(
                jnp.asarray(batch["vla_actions"]), stats, "vla"),
            "expert_act": normalize_actions(
                jnp.asarray(batch["expert_actions"]), stats, "expert"),
        }
        if ccfg.use_force:
            out["forces"] = jnp.asarray(batch["forces"][:, ctx - 1])
            out["current_force"] = out["forces"]
        if ccfg.use_visual:
            out["cam1_feat"] = dino.encode_images(
                self.img_cfg, self.img_params,
                jnp.asarray(batch["images_cam1"][:, -1]))
            out["cam2_feat"] = dino.encode_images(
                self.img_cfg, self.img_params,
                jnp.asarray(batch["images_cam2"][:, -1]))
        return out

    def train(self, data_module: ControllerDataModule,
              num_epochs: Optional[int] = None, save_interval: int = 50,
              log_every: int = 10):
        tcfg = self.tcfg
        num_epochs = num_epochs or tcfg.epochs
        rng = np.random.default_rng(tcfg.seed)
        steps_per_epoch = max(
            1, len(data_module.train_dataset) // tcfg.batch_size)
        total_steps = steps_per_epoch * num_epochs
        step = 0
        t0 = time.time()
        for epoch in range(num_epochs):
            for batch in data_module.train_dataset.batches(
                    tcfg.batch_size, rng,
                    workers=tcfg.prefetch_workers):
                self.key, k = jax.random.split(self.key)
                dev_batch = self.prepare_batch(batch)
                hp = {"lr": self._lr(step, total_steps),
                      "wd": tcfg.weight_decay}
                (self.state.params, self.opt_state, self.state.ema,
                 metrics) = _train_step(self.ccfg, self.state.params,
                                        self.opt_state, self.state.ema,
                                        k, dev_batch, hp)
                if step % log_every == 0:
                    row = self.metrics.log(
                        step, {k2: float(v) for k2, v in metrics.items()},
                        epoch=epoch, lr=hp["lr"])
                    logger.info("step %d loss %.4f (v %.4f s %.4f b %.4f)",
                                step, row["loss"], row["v_loss"],
                                row["s_loss"], row["b_loss"])
                step += 1

            val = self.validate(data_module)
            if val is not None and val < self.best_val:
                self.best_val = val
                self._save(os.path.join(self.output_dir, "best"))
                logger.info("epoch %d new best val %.4f", epoch, val)
            if (epoch + 1) % save_interval == 0:
                self._save(os.path.join(self.output_dir,
                                        f"checkpoint-{epoch + 1}"))
                from vla_touch_tpu.utils.checkpoint import prune_checkpoints
                prune_checkpoints(self.output_dir, total_limit=5)
        self._save(os.path.join(self.output_dir, "final"))
        return self.state

    def _save(self, path: str):
        B.save_bridge_controller(path, self.state)
        if self.ccfg.use_visual:
            # Persist the visual encoder: the controller's features are only
            # reproducible with these exact weights.
            dino.save_params(path, self.ccfg.image_model, self.img_params)

    def validate(self, data_module) -> Optional[float]:
        if data_module.val_dataset is None or len(data_module.val_dataset) == 0:
            return None
        rng = np.random.default_rng(0)
        losses = []
        for batch in data_module.val_dataset.batches(
                min(self.tcfg.batch_size, len(data_module.val_dataset)), rng,
                shuffle=False):
            dev_batch = self.prepare_batch(batch)
            losses.append(float(_val_loss(self.ccfg, self.state.params,
                                          jax.random.PRNGKey(0), dev_batch)))
        return float(np.mean(losses)) if losses else None


def train_diffusion_controller_with_dataset(
        data_dir: str, output_dir: str,
        ccfg: Optional[BridgeControllerConfig] = None,
        tcfg: Optional[BridgeTrainConfig] = None,
        image_encoder_params: Optional[dict] = None,
        num_epochs: Optional[int] = None):
    """Reference-named convenience entry (``bridge_train.py:562+``)."""
    ccfg = ccfg or BridgeControllerConfig()
    tcfg = tcfg or BridgeTrainConfig()
    dm = ControllerDataModule(data_dir, context_frames=ccfg.context_frames,
                              horizon=ccfg.horizon,
                              use_images=ccfg.use_visual,
                              val_ratio=tcfg.val_ratio, seed=tcfg.seed,
                              data_format=tcfg.data_format)
    trainer = DiffusionControllerTrainer(ccfg, tcfg, output_dir,
                                         stats=dm.stats,
                                         image_encoder_params=image_encoder_params,
                                         seed=tcfg.seed)
    state = trainer.train(dm, num_epochs=num_epochs)
    return state, trainer


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description="Train the BRIDGeR controller")
    p.add_argument("--data_dir", required=True)
    p.add_argument("--output_dir", default="checkpoints/bridge")
    p.add_argument("--horizon", type=int, default=32)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--epochs", type=int, default=400)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--beta_max", type=float, default=0.03)
    p.add_argument("--no_force", action="store_true")
    p.add_argument("--no_visual", action="store_true")
    p.add_argument("--image_model", default="dinov2-small")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--data_format", default="h5", choices=("h5", "epc"))
    p.add_argument("--prefetch_workers", type=int, default=0)
    args = p.parse_args(argv)

    from vla_touch_tpu.config import InterpolantConfig

    ccfg = BridgeControllerConfig(
        horizon=args.horizon, use_force=not args.no_force,
        use_visual=not args.no_visual, image_model=args.image_model,
        interpolant=InterpolantConfig(beta_max=args.beta_max))
    tcfg = BridgeTrainConfig(horizon=args.horizon, batch_size=args.batch_size,
                             epochs=args.epochs, learning_rate=args.lr,
                             seed=args.seed, data_format=args.data_format,
                             prefetch_workers=args.prefetch_workers)
    logging.basicConfig(level=logging.INFO)
    train_diffusion_controller_with_dataset(args.data_dir, args.output_dir,
                                            ccfg, tcfg)


if __name__ == "__main__":
    main()
