"""Full RDT finetuning driver.

The orchestration layer over :mod:`rdt_train`'s sharded step — equivalent of
``/root/reference/VLA/train/train.py`` + ``main.py``:

- consumer dataset with condition masking / state noise / image aug
  (:mod:`vla_touch_tpu.data.consumer`);
- frozen SigLIP image encoding outside the gradient path (``train.py:415-418``);
- periodic checkpointing with ``checkpoint-<step>`` dirs, total-limit
  pruning, and ``resume_from_checkpoint='latest'`` (``train.py:347-389,
  455-460``);
- periodic sampling eval: full DPM-Solver++ rollout on held-out batches with
  per-dataset MSE and state-norm-scaled L2 (``train/sample.py:7-98``);
- metrics to a jsonl log (≙ wandb/tensorboard scalars).
"""

from __future__ import annotations

import dataclasses
import logging
import os
import threading
import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vla_touch_tpu.config import DataConfig, TrainConfig
from vla_touch_tpu.data.consumer import VLAConsumerDataset, collate
from vla_touch_tpu.models.encoders.vit import SIGLIP_SO400M, SiglipVisionEncoder, ViTConfig
from vla_touch_tpu.models.rdt import runner as R
from vla_touch_tpu.parallel import mesh as mesh_lib
from vla_touch_tpu.train import rdt_train as T
from vla_touch_tpu.utils import checkpoint as ckpt

logger = logging.getLogger("rdt_loop")

_SIGLIP_MEAN = 0.5


@partial(jax.jit, static_argnames=("vision_cfg",))
def encode_images(vision_cfg: ViTConfig, vision_params, images, image_mask):
    """uint8 frames (B, F, S, S, 3) -> SigLIP tokens (B, F*729, D), frozen
    (no grad), masked frames become the background (≙ train.py:415-418)."""
    from vla_touch_tpu.utils.image import siglip_normalize

    B, F, S, _, _ = images.shape
    x = siglip_normalize(images)
    x = jnp.where(image_mask[:, :, None, None, None], x, 0.0)
    tokens = SiglipVisionEncoder(vision_cfg).apply(
        {"params": vision_params}, x.reshape(B * F, S, S, 3))
    return jax.lax.stop_gradient(tokens.reshape(B, -1, tokens.shape[-1]))


@partial(jax.jit, static_argnames=("rcfg",))
def _sample_metric_sums(rcfg: R.RDTRunnerConfig, params, key, batch,
                        img_tokens):
    """Eval rollout -> GLOBAL metric sums as one compiled program.

    All reductions happen inside jit, so when the inputs are global arrays
    sharded over the data axis of a multi-host mesh, XLA inserts the
    cross-host collectives and every process receives the replicated global
    sums — the TPU-idiom equivalent of the reference's
    ``accelerator.gather_for_metrics`` (``train/sample.py:67-70,80,85``)."""
    pred = R.rdt_predict_action(
        rcfg, params, key,
        jnp.asarray(batch["lang_tokens"]), jnp.asarray(batch["lang_mask"]),
        img_tokens, jnp.asarray(batch["state_tokens"]),
        jnp.asarray(batch["action_mask"]),
        jnp.asarray(batch["ctrl_freqs"]))
    gt = jnp.asarray(batch["action_gt"])
    mask = jnp.asarray(batch["action_mask"])  # (B, 1, 128)
    diff = (pred - gt) * mask
    # state-norm-scaled L2 (sample.py:61-66).
    norm = jnp.maximum(jnp.linalg.norm(
        jnp.asarray(batch["state_norm"]), axis=-1, keepdims=True), 1e-6)
    return {
        "se_sum": jnp.sum(jnp.square(diff)),
        "mask_sum": jnp.sum(mask) * gt.shape[1],
        "l2_sum": jnp.sum(jnp.linalg.norm(diff, axis=-1) / norm),
        "rows": jnp.asarray(gt.shape[0] * gt.shape[1], jnp.float32),
    }


def sample_metrics(rcfg: R.RDTRunnerConfig, params, key, batch, img_tokens):
    """Full-rollout eval metrics (≙ ``train/sample.py:46-93``).  Global
    across all hosts when the batch is a mesh-sharded global array."""
    needed = ("lang_tokens", "lang_mask", "state_tokens", "action_gt",
              "action_mask", "ctrl_freqs", "state_norm")
    batch = {k: batch[k] for k in needed}
    s = _sample_metric_sums(rcfg, params, key, batch, img_tokens)
    return {
        "sample_mse": float(s["se_sum"] / jnp.maximum(s["mask_sum"], 1.0)),
        "sample_l2err": float(s["l2_sum"] / jnp.maximum(s["rows"], 1.0)),
    }


@dataclasses.dataclass
class RDTTrainer:
    rcfg: R.RDTRunnerConfig
    tcfg: TrainConfig
    dcfg: DataConfig
    output_dir: str
    vision_cfg: ViTConfig = SIGLIP_SO400M

    def __post_init__(self):
        os.makedirs(self.output_dir, exist_ok=True)
        from vla_touch_tpu.utils.metrics import MetricsLogger

        self.metrics = MetricsLogger(self.output_dir)
        self.metrics_log = self.metrics.jsonl_path
        self._ckpt_thread = None
        self._async_saver = None
        self._ckpt_error = None

    # ---- checkpoint I/O ---------------------------------------------------

    def save_checkpoint(self, state: T.TrainState, step: int):
        path = os.path.join(self.output_dir, f"checkpoint-{step}")
        if jax.process_count() > 1:
            # Cross-host sharded state (ZeRO moments live on other hosts):
            # all processes cooperate through the orbax backend.
            tree = {"params": state.params, "ema": state.ema.shadow,
                    "opt_state": state.opt_state}
            if self.tcfg.async_save:
                if self._async_saver is None:
                    self._async_saver = ckpt.AsyncOrbaxSaver()
                self._wait_ckpt()
                self._async_saver.save(os.path.join(path, "state.orbax"),
                                       tree)
                # meta-after-data holds here too: the finalize thread writes
                # meta.json only after orbax commits state.orbax (atomic
                # rename), so a crash mid-write never leaves a checkpoint
                # dir that resume would pick but cannot load.
                ema_updates = int(state.ema.num_updates)

                def _finalize():
                    try:
                        self._async_saver.wait()
                        if jax.process_index() == 0:
                            ckpt.save_json(
                                os.path.join(path, "meta.json"),
                                {"step": step,
                                 "ema_num_updates": ema_updates})
                            ckpt.prune_checkpoints(
                                self.output_dir,
                                self.tcfg.checkpoints_total_limit)
                    except BaseException as e:  # surfaced by _wait_ckpt
                        self._ckpt_error = e

                self._ckpt_thread = threading.Thread(target=_finalize,
                                                     daemon=True)
                self._ckpt_thread.start()
                return
            else:
                ckpt.save_pytree_orbax(os.path.join(path, "state.orbax"),
                                       tree)
        elif self.tcfg.async_save:
            # Snapshot to host now (blocks for D2H only), write + meta +
            # prune on the background thread; meta.json lands after the
            # data files so a crash mid-write never leaves a checkpoint
            # that has meta but no state.
            self._wait_ckpt()
            host = jax.device_get({
                "params": state.params, "ema": state.ema.shadow,
                "opt_state": state.opt_state,
                "ema_num_updates": state.ema.num_updates})

            def _write():
                try:
                    ckpt.save_pytree(os.path.join(path, "params.msgpack"),
                                     host["params"])
                    ckpt.save_pytree(os.path.join(path, "ema.msgpack"),
                                     host["ema"])
                    ckpt.save_pytree(os.path.join(path, "opt_state.msgpack"),
                                     host["opt_state"])
                    ckpt.save_json(os.path.join(path, "meta.json"),
                                   {"step": step, "ema_num_updates":
                                    int(host["ema_num_updates"])})
                    ckpt.prune_checkpoints(self.output_dir,
                                           self.tcfg.checkpoints_total_limit)
                except BaseException as e:  # surfaced by _wait_ckpt
                    self._ckpt_error = e

            self._ckpt_thread = threading.Thread(target=_write, daemon=True)
            self._ckpt_thread.start()
            return
        else:
            ckpt.save_pytree(os.path.join(path, "params.msgpack"),
                             state.params)
            ckpt.save_pytree(os.path.join(path, "ema.msgpack"),
                             state.ema.shadow)
            ckpt.save_pytree(os.path.join(path, "opt_state.msgpack"),
                             state.opt_state)
        if jax.process_index() == 0:
            ckpt.save_json(os.path.join(path, "meta.json"),
                           {"step": step,
                            "ema_num_updates": int(state.ema.num_updates)})
            ckpt.prune_checkpoints(self.output_dir,
                                   self.tcfg.checkpoints_total_limit)

    def _wait_ckpt(self):
        """Block until any in-flight async checkpoint write has landed.

        Re-raises a failure captured on the writer thread (full disk,
        permissions): a silently-lost checkpoint must fail the run the same
        way the synchronous path would.
        """
        if self._ckpt_thread is not None:
            self._ckpt_thread.join()
            self._ckpt_thread = None
        if self._async_saver is not None:
            self._async_saver.wait()
        if self._ckpt_error is not None:
            err, self._ckpt_error = self._ckpt_error, None
            raise RuntimeError("async checkpoint write failed") from err

    def load_checkpoint(self, state: T.TrainState, path: str) -> T.TrainState:
        from vla_touch_tpu.utils.ema import EmaState

        self._wait_ckpt()

        orbax_path = os.path.join(path, "state.orbax")
        if os.path.exists(orbax_path):
            # Multi-host runs save through the cooperative orbax backend
            # (see save_checkpoint); resume must read the same format.
            tree = ckpt.load_pytree_orbax(orbax_path, {
                "params": state.params, "ema": state.ema.shadow,
                "opt_state": state.opt_state})
            params, shadow = tree["params"], tree["ema"]
            opt_state = tree["opt_state"]
        else:
            params = ckpt.load_pytree(os.path.join(path, "params.msgpack"),
                                      state.params)
            shadow = ckpt.load_pytree(os.path.join(path, "ema.msgpack"),
                                      state.ema.shadow)
            opt_state = ckpt.load_pytree(
                os.path.join(path, "opt_state.msgpack"), state.opt_state)
        meta = ckpt.load_json(os.path.join(path, "meta.json"))
        return T.TrainState(
            params=params, opt_state=opt_state,
            ema=EmaState(shadow=shadow,
                         num_updates=jnp.asarray(meta["ema_num_updates"],
                                                 jnp.int32)),
            step=jnp.asarray(meta["step"], jnp.int32))

    # ---- main loop ----------------------------------------------------------

    def train(self, file_paths=None, max_steps: Optional[int] = None,
              resume_from: Optional[str] = "latest", mesh=None,
              vision_params=None, seed: Optional[int] = None,
              init_params=None):
        tcfg, rcfg, dcfg = self.tcfg, self.rcfg, self.dcfg
        seed = tcfg.seed if seed is None else seed
        key = jax.random.PRNGKey(seed)
        k_init, k_vis, key = jax.random.split(key, 3)

        if mesh is None:
            mesh = (mesh_lib.make_mesh(n_data=jax.device_count(), n_model=1)
                    if jax.process_count() > 1
                    else mesh_lib.make_mesh(n_data=1, n_model=1))
        if vision_params is None:
            logger.warning(
                "no SigLIP weights supplied: image conditioning uses a "
                "RANDOM tower. Pass vision_params (port the HF checkpoint "
                "via torch_port.siglip_from_hf or --siglip_checkpoint) for "
                "meaningful finetuning.")
            dummy = jnp.zeros((1, dcfg.image_size, dcfg.image_size, 3))
            vision_params = SiglipVisionEncoder(self.vision_cfg).init(
                k_vis, dummy)["params"]

        # Warm-start from a ported reference checkpoint
        # (--pretrained_model_name_or_path); EMA shadow starts there too.
        # Routed through init_train_state so the param_dtype/ema_dtype casts
        # (the pure-bf16 single-chip recipe) apply to loaded f32 checkpoints
        # exactly as they do to fresh inits.
        state = T.init_train_state(rcfg, tcfg, k_init, params=init_params)
        start_step = 0
        if resume_from == "latest":
            latest = ckpt.latest_checkpoint(self.output_dir)
            if latest:
                state = self.load_checkpoint(state, latest)
                start_step = int(state.step)
                logger.info("resumed from %s at step %d", latest, start_step)
        elif resume_from:
            state = self.load_checkpoint(state, resume_from)
            start_step = int(state.step)

        # Per-process data stream: each host samples its own shard of the
        # global batch (model-init seed stays shared across hosts).  The
        # resume step folds into the seed so a resumed run draws NEW samples
        # instead of replaying the stream from scratch (sampling is IID
        # length-weighted draws, so any seed gives the same distribution).
        data_seed = seed + 9973 * jax.process_index() + 31337 * start_step
        dataset = VLAConsumerDataset(dcfg, seed=data_seed,
                                     file_paths=file_paths)

        step_fn, state_sh = T.make_sharded_train_step(mesh, rcfg, tcfg)
        state = T.shard_train_state(mesh, state, state_sh)

        max_steps = max_steps or tcfg.max_train_steps
        micro = tcfg.batch_size
        accum = tcfg.grad_accum
        t0 = time.time()

        # Host-side prefetch: batches build in background threads while the
        # device runs the previous step (≙ DataLoader workers + producer
        # buffer, SURVEY §2.7).
        from vla_touch_tpu.data.pipeline import PrefetchLoader

        def make_batch():
            samples = [dataset.sample() for _ in range(micro * accum)]
            return collate(samples, max_lang_len=rcfg.model.max_lang_cond_len)

        loader = PrefetchLoader(make_batch, depth=2,
                                workers=tcfg.prefetch_workers,
                                num_batches=max_steps - start_step)
        try:
            state = self._train_loop(loader, state, step_fn, vision_params,
                                     key, start_step, max_steps, t0,
                                     mesh=mesh)
        finally:
            loader.close()
        if jax.process_count() > 1:
            self.save_checkpoint(state, max_steps)
            self._wait_ckpt()
            return state
        final = jax.device_get(state)
        self.save_checkpoint(final, max_steps)
        self._wait_ckpt()
        return final

    def _train_loop(self, loader, state, step_fn, vision_params, key,
                    start_step, max_steps, t0, mesh=None):
        tcfg, rcfg = self.tcfg, self.rcfg
        micro, accum = tcfg.batch_size, tcfg.grad_accum
        multihost = jax.process_count() > 1
        if multihost:
            from jax.sharding import PartitionSpec as P

            from vla_touch_tpu.parallel import launch
        for step in range(start_step, max_steps):
            batch = next(loader)
            img_tokens = encode_images(
                self.vision_cfg, vision_params,
                jnp.asarray(batch["images"]), jnp.asarray(batch["image_mask"]))

            def shape_micro(x):
                x = np.asarray(x)
                return jnp.asarray(
                    x.reshape((accum, micro) + x.shape[1:]))

            dev_batch = {
                "lang_tokens": shape_micro(batch["lang_tokens"]),
                "lang_mask": shape_micro(batch["lang_mask"]),
                # Reshape on device — no host round-trip for the big tokens.
                "img_tokens": img_tokens.reshape(
                    (accum, micro) + img_tokens.shape[1:]),
                "state_tokens": shape_micro(batch["state_tokens"]),
                "action_gt": shape_micro(batch["action_gt"]),
                "action_mask": shape_micro(batch["action_mask"]),
                "ctrl_freqs": shape_micro(batch["ctrl_freqs"]),
            }
            if multihost:
                # Assemble the global (accum, micro*P, ...) batch from each
                # host's local shard (≙ per-rank DataLoader under DeepSpeed).
                # img_tokens round-trips via host here; a device-resident
                # cross-host reshard is possible but the frozen-encode path
                # is not the bottleneck at pod scale.
                dev_batch = launch.host_local_batch(
                    mesh, jax.tree.map(np.asarray, dev_batch),
                    spec=P(None, mesh_lib.DATA_AXIS))

            key, k = jax.random.split(key)
            state, metrics = step_fn(state, k, dev_batch)

            if step % 10 == 0 and jax.process_index() == 0:
                row = self.metrics.log(
                    step, {"loss": float(metrics["loss"]),
                           "grad_norm": float(metrics["grad_norm"])})
                logger.info("step %d loss %.4f", step, row["loss"])

            if (step + 1) % tcfg.checkpointing_period == 0:
                self.save_checkpoint(
                    state if jax.process_count() > 1
                    else jax.device_get(state), step + 1)

            if (step + 1) % tcfg.sample_period == 0:
                key, k = jax.random.split(key)
                if multihost:
                    # Globalize the eval batch so every process runs the
                    # same SPMD rollout against the (globally placed) params.
                    keys = ("lang_tokens", "lang_mask", "state_tokens",
                            "action_gt", "action_mask", "ctrl_freqs",
                            "state_norm")
                    eb = launch.host_local_batch(
                        mesh, {n: np.asarray(batch[n]) for n in keys},
                        spec=P(mesh_lib.DATA_AXIS))
                    gt = launch.host_local_batch(
                        mesh, np.asarray(img_tokens),
                        spec=P(mesh_lib.DATA_AXIS))
                    sm = sample_metrics(rcfg, state.params, k, eb, gt)
                else:
                    sm = sample_metrics(rcfg, state.params, k, batch,
                                        img_tokens)
                if jax.process_index() == 0:
                    self.metrics.log(step + 1, sm, kind="sample_eval")
                    logger.info("sample eval @%d: %s", step + 1, sm)

        return state


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(
        description="Finetune RDT (data-parallel); flag surface mirrors the "
                    "reference CLI (/root/reference/VLA/main.py:8-294)")
    # --- multi-host (≙ DeepSpeed hostfile + NCCL env, finetune.sh:1-7,31) --
    p.add_argument("--coordinator", default=None,
                   help="host:port of process 0 for multi-host training "
                        "(auto-detected on TPU pods)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    # --- data ---------------------------------------------------------------
    p.add_argument("--data_root", default="data/datasets")
    p.add_argument("--dataset_name", default="mango")
    p.add_argument("--output_dir", default="checkpoints/rdt")
    p.add_argument("--load_from_hdf5", action="store_true",
                   help="accepted for script compat; episode h5 is already "
                        "the native path here")
    p.add_argument("--data_format", default="h5", choices=("h5", "epc"),
                   help="'epc' trains from the native mmap'd episode cache "
                        "(GIL-free threaded JPEG decode; pack once with "
                        "python -m vla_touch_tpu.data.pack_epc)")
    p.add_argument("--cond_mask_prob", type=float, default=0.1)
    p.add_argument("--cam_ext_mask_prob", type=float, default=-1.0)
    p.add_argument("--state_noise_snr", type=float, default=None)
    p.add_argument("--image_aug", action="store_true")
    p.add_argument("--precomp_lang_embed", action="store_true",
                   help="accepted for compat; precomputed T5 embeddings are "
                        "the only training-time language path (main.py:163)")
    p.add_argument("--dataloader_num_workers", type=int, default=2,
                   help="host-side prefetch threads")
    # --- optimization -------------------------------------------------------
    p.add_argument("--batch_size", "--train_batch_size", dest="batch_size",
                   type=int, default=4)
    p.add_argument("--sample_batch_size", type=int, default=None,
                   help="accepted for compat (sampling eval reuses the "
                        "train batch)")
    p.add_argument("--grad_accum", "--gradient_accumulation_steps",
                   dest="grad_accum", type=int, default=4)
    p.add_argument("--max_train_steps", type=int, default=40000)
    p.add_argument("--num_train_epochs", type=int, default=None,
                   help="accepted for compat; sampling is episode-length-"
                        "weighted and infinite here, cap with "
                        "--max_train_steps (the reference's effective knob "
                        "too, main.py:116-124)")
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--scale_lr", action="store_true",
                   help="scale lr by global batch (x processes, "
                        "train.py:211-214)")
    p.add_argument("--lr_scheduler", default="constant",
                   choices=["constant", "linear", "cosine",
                            "constant_with_warmup"])
    p.add_argument("--lr_warmup_steps", type=int, default=500)
    p.add_argument("--lr_num_cycles", type=int, default=1)
    p.add_argument("--lr_power", type=float, default=1.0)
    p.add_argument("--adam_beta1", type=float, default=0.9)
    p.add_argument("--adam_beta2", type=float, default=0.95)
    p.add_argument("--adam_weight_decay", type=float, default=1e-3)
    p.add_argument("--adam_epsilon", type=float, default=1e-8)
    p.add_argument("--max_grad_norm", type=float, default=1.0)
    p.add_argument("--use_8bit_adam", action="store_true")
    p.add_argument("--zero3", action="store_true",
                   help="FSDP/ZeRO-3 analogue: shard parameters + EMA over "
                        "the data axis (per-chip param state ~1/n_data; "
                        "GSPMD inserts per-layer all-gathers). The default "
                        "is ZeRO-2, the reference's DeepSpeed ceiling")
    p.add_argument("--accum_dtype", choices=["float32", "bfloat16"],
                   default="float32",
                   help="grad-accumulator dtype; bfloat16 halves accumulator "
                        "HBM so 1B accum>=4 fits one 16 GB chip")
    p.add_argument("--ema_dtype", choices=["float32", "bfloat16"],
                   default="float32",
                   help="EMA shadow dtype; bfloat16 (stochastically rounded) "
                        "halves EMA HBM for the single-chip 1B envelope")
    p.add_argument("--param_dtype", choices=["float32", "bfloat16"],
                   default="float32",
                   help="parameter storage dtype; bfloat16 drops the f32 "
                        "master and applies updates with stochastic "
                        "rounding (requires --use_8bit_adam)")
    p.add_argument("--alpha", type=float, default=None,
                   help="accepted for compat (reference aux-loss weight, "
                        "unused in its shipped path)")
    p.add_argument("--seed", type=int, default=42)
    # --- checkpoint / eval --------------------------------------------------
    p.add_argument("--checkpointing_period", type=int, default=1000)
    p.add_argument("--async_save", action="store_true",
                   help="overlap checkpoint writes with training steps "
                        "(host snapshot + background write / orbax async)")
    p.add_argument("--checkpoints_total_limit", type=int, default=40)
    p.add_argument("--sample_period", type=int, default=100)
    p.add_argument("--num_sample_batches", type=int, default=2)
    p.add_argument("--resume_from_checkpoint", default="latest")
    # --- model / towers ------------------------------------------------------
    p.add_argument("--model_scale", choices=["1b", "170m", "tiny"],
                   default="1b")
    p.add_argument("--pretrained_model_name_or_path", default=None,
                   help="reference-layout RDT checkpoint (.safetensors/.bin) "
                        "to initialize from")
    p.add_argument("--siglip_checkpoint",
                   "--pretrained_vision_encoder_name_or_path",
                   dest="siglip_checkpoint", default=None,
                   help="HF SiglipVisionModel weights (.safetensors or "
                        "torch .bin) for the frozen image tower")
    p.add_argument("--pretrained_text_encoder_name_or_path", default=None,
                   help="accepted for compat; language embeds are "
                        "precomputed (encode_lang tools)")
    # --- hub push (network-gated; reference train/train.py:495-508) ---------
    p.add_argument("--push_to_hub", action="store_true",
                   help="upload the output dir to the HF hub at the end "
                        "of training (requires huggingface_hub + network)")
    p.add_argument("--hub_model_id", default=None,
                   help="hub repo id (default: output dir basename)")
    p.add_argument("--hub_token", default=None)
    # --- accepted no-ops (GPU/accelerate specifics; logged, not errors) -----
    for flag in ("--config_path", "--deepspeed", "--report_to",
                 "--logging_dir", "--mixed_precision"):
        p.add_argument(flag, default=None, help="accepted for script "
                       "compat; no TPU equivalent needed")
    for flag in ("--allow_tf32", "--set_grads_to_none"):
        p.add_argument(flag, action="store_true", help="accepted for "
                       "script compat; no TPU equivalent needed")
    p.add_argument("--gradient_checkpointing", action="store_true",
                   help="rematerialize each RDT block on backward "
                        "(jax.checkpoint) — the single-chip memory lever")
    p.add_argument("--local_rank", type=int, default=-1,
                   help="accepted for compat (torch.distributed launcher)")
    args = p.parse_args(argv)

    from vla_touch_tpu.config import (NoiseSchedulerConfig, rdt_1b, rdt_170m,
                                      rdt_tiny)
    from vla_touch_tpu.parallel import launch

    # Multi-host: must run before any other jax use (≙ the reference's
    # accelerate/DeepSpeed NCCL process-group init, train/train.py:83-92).
    distributed = launch.initialize(coordinator_address=args.coordinator,
                                    num_processes=args.num_processes,
                                    process_id=args.process_id)
    if distributed:
        logging.getLogger("rdt_loop").info(
            "distributed: process %d/%d, %d local + %d global devices",
            jax.process_index(), jax.process_count(),
            len(jax.local_devices()), len(jax.devices()))

    model_cfg = {"1b": rdt_1b, "170m": rdt_170m, "tiny": rdt_tiny}[
        args.model_scale]()
    if args.gradient_checkpointing:
        model_cfg = dataclasses.replace(model_cfg, remat_blocks=True)
    rcfg = R.RDTRunnerConfig(model=model_cfg, noise=NoiseSchedulerConfig())
    lr = args.learning_rate
    if args.scale_lr:
        lr *= args.batch_size * args.grad_accum * jax.process_count()
    tcfg = TrainConfig(
        batch_size=args.batch_size, grad_accum=args.grad_accum,
        max_train_steps=args.max_train_steps, learning_rate=lr,
        lr_scheduler=args.lr_scheduler, lr_warmup_steps=args.lr_warmup_steps,
        weight_decay=args.adam_weight_decay, adam_beta1=args.adam_beta1,
        adam_beta2=args.adam_beta2, adam_epsilon=args.adam_epsilon,
        max_grad_norm=args.max_grad_norm, use_8bit_adam=args.use_8bit_adam,
        zero3=args.zero3,
        accum_dtype=args.accum_dtype, ema_dtype=args.ema_dtype,
        param_dtype=args.param_dtype,
        checkpointing_period=args.checkpointing_period,
        async_save=args.async_save,
        checkpoints_total_limit=args.checkpoints_total_limit,
        sample_period=args.sample_period, seed=args.seed,
        prefetch_workers=args.dataloader_num_workers)
    dcfg = DataConfig(data_root=args.data_root,
                      dataset_names=(args.dataset_name,),
                      cond_mask_prob=args.cond_mask_prob,
                      cam_ext_mask_prob=args.cam_ext_mask_prob,
                      state_noise_snr=args.state_noise_snr,
                      image_aug=args.image_aug,
                      chunk_size=model_cfg.horizon,
                      data_format=args.data_format)
    logging.basicConfig(level=logging.INFO)
    trainer = RDTTrainer(rcfg, tcfg, dcfg, args.output_dir)
    init_params = None
    if args.pretrained_model_name_or_path:
        from vla_touch_tpu.utils.torch_port import load_rdt_checkpoint

        init_params = load_rdt_checkpoint(args.pretrained_model_name_or_path,
                                          depth=model_cfg.depth)
    vision_params = None
    if args.siglip_checkpoint:
        from vla_touch_tpu.utils.torch_port import siglip_from_hf

        if args.siglip_checkpoint.endswith(".safetensors"):
            from safetensors.numpy import load_file

            sd = load_file(args.siglip_checkpoint)
        else:
            import torch

            sd = {k: v.numpy() for k, v in torch.load(
                args.siglip_checkpoint, map_location="cpu",
                weights_only=True).items()}
        vision_params = siglip_from_hf(sd, num_layers=SIGLIP_SO400M.num_layers)
    trainer.train(resume_from=args.resume_from_checkpoint,
                  vision_params=vision_params, init_params=init_params)

    # End-of-training hub upload (≙ reference train/train.py:495-508),
    # main process only, after the final checkpoint has landed on disk.
    if args.push_to_hub and jax.process_index() == 0:
        from vla_touch_tpu.utils.hub import push_checkpoint_to_hub

        repo = push_checkpoint_to_hub(
            args.output_dir, hub_model_id=args.hub_model_id,
            token=args.hub_token,
            base_model=args.pretrained_model_name_or_path)
        logging.getLogger(__name__).info("pushed to hub repo %s", repo)


if __name__ == "__main__":
    main()
