"""Octopi encoder training + evaluation driver.

Equivalent of the encoder half of ``/root/reference/octopi/octopi_s/
run_llm.py:95-160`` and ``test_encoder.py:42-109``: train the adapters +
property classifier on top of the (frozen or finetuned) CLIP video encoder
against hardness/roughness regression targets, then evaluate threshold
classification accuracy and pairwise comparison success.
"""

from __future__ import annotations

import json
import logging
import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vla_touch_tpu.planning import encoder as PE
from vla_touch_tpu.planning.datasets import TactilePropertyRegressionDataset
from vla_touch_tpu.planning.eval import (
    pairwise_comparison_success,
    threshold_classification_accuracy,
)

logger = logging.getLogger("train_encoder")


@partial(jax.jit, static_argnames=("cfg", "sensor", "train_clip"))
def _loss(cfg, clip_params, adapter_params, classifier_params, frames,
          targets, sensor="dotted", train_clip=False):
    video = PE.ViFiCLIPVideo(cfg).apply({"params": clip_params}, frames)
    if not train_clip:
        video = jax.lax.stop_gradient(video)
    feats = PE.Adapter(cfg.hidden_size, cfg.hidden_size).apply(
        {"params": adapter_params[sensor]}, video)
    preds = PE.PropertyClassifier().apply({"params": classifier_params},
                                          feats)
    return jnp.mean(jnp.square(preds - targets))


def train_property_encoder(data_path: str, output_dir: str,
                           datasets=("physiclear",), epochs: int = 10,
                           batch_size: int = 8, lr: float = 1e-4,
                           frame_size: int = 224, max_frames: int = 4,
                           cfg=None, state: Optional[PE.TactileEncoderState]
                           = None, seed: int = 0,
                           sensor: str = "dotted") -> PE.TactileEncoderState:
    cfg = cfg or PE.CLIP_VIT_B16
    st = state or PE.init_tactile_encoder(cfg, jax.random.PRNGKey(seed))
    ds = TactilePropertyRegressionDataset(
        data_path, "train", datasets, frame_size=frame_size,
        max_frames=max_frames, seed=seed)
    if len(ds) == 0:
        raise ValueError(f"no training samples under {data_path}")

    trainable = {"adapters": st.adapter_params,
                 "classifier": st.classifier_params}
    opt = optax.adamw(lr, weight_decay=1e-6)
    opt_state = opt.init(trainable)

    @jax.jit
    def step(trainable, opt_state, frames, targets):
        def f(tr):
            return _loss(cfg, st.clip_params, tr["adapters"],
                         tr["classifier"], frames, targets, sensor)

        loss, g = jax.value_and_grad(f)(trainable)
        updates, opt_state = opt.update(g, opt_state, trainable)
        return optax.apply_updates(trainable, updates), opt_state, loss

    os.makedirs(output_dir, exist_ok=True)
    log_path = os.path.join(output_dir, "training.jsonl")
    it = 0
    for epoch in range(epochs):
        for batch in ds.batches(batch_size):
            trainable, opt_state, loss = step(
                trainable, opt_state, jnp.asarray(batch["frames"]),
                jnp.asarray(batch["properties"]))
            if it % 5 == 0:
                with open(log_path, "a") as f:
                    f.write(json.dumps({"step": it, "epoch": epoch,
                                        "loss": float(loss)}) + "\n")
            it += 1
    st.adapter_params = trainable["adapters"]
    st.classifier_params = trainable["classifier"]
    PE.save_tactile_encoder(os.path.join(output_dir, "encoder"), st)
    return st


def train_vificlip_contrastive(batches, *, vision_cfg=None, text_cfg=None,
                               prompt_learning: bool = True,
                               freeze_text_encoder: bool = True,
                               num_prompts: int = 4,
                               prompt_depth_vision: int = 9,
                               prompt_depth_text: int = 9,
                               epochs: int = 1, lr: float = 1e-4,
                               seed: int = 0, params=None,
                               log_path: Optional[str] = None):
    """Train a ViFiCLIP the way the reference tactile-encoder checkpoints
    were produced: symmetric video<->text contrastive objective over the
    dual logit scales, with the text tower optionally frozen
    (encoder.py:389-399 ``freeze_text_encoder``).

    ``batches``: iterable of dicts with ``frames`` (B, L, H, W, 3) pixel
    videos, ``input_ids`` (B, Lt) CLIP token ids (row i is the caption of
    video i), and optional ``attention_mask`` (B, Lt).  Re-iterated once
    per epoch (pass a list, or a generator factory result per epoch).

    Returns ``(params, losses)``.
    """
    vision_cfg = vision_cfg or PE.CLIP_VIT_B16
    text_cfg = text_cfg or PE.CLIP_TEXT_B16
    model = PE.ViFiCLIPModel(
        vision_cfg=vision_cfg, text_cfg=text_cfg,
        prompt_learning=prompt_learning, num_prompts=num_prompts,
        prompt_depth_vision=prompt_depth_vision,
        prompt_depth_text=prompt_depth_text)

    batches = list(batches)
    if not batches:
        raise ValueError("no contrastive batches")
    b0 = batches[0]
    mask0 = b0.get("attention_mask")
    if params is None:
        params = model.init(
            jax.random.PRNGKey(seed), jnp.asarray(b0["frames"]),
            jnp.asarray(b0["input_ids"]),
            None if mask0 is None else jnp.asarray(mask0))["params"]

    def label(path, _):
        # Frozen-text contract: every text-tower leaf is held still; the
        # logit scales always train (they are top-level params).
        top = path[0].key if hasattr(path[0], "key") else str(path[0])
        return ("freeze" if (freeze_text_encoder and top == "text")
                else "train")

    labels = jax.tree_util.tree_map_with_path(label, params)
    opt = optax.multi_transform(
        {"train": optax.adamw(lr, weight_decay=1e-6),
         "freeze": optax.set_to_zero()}, labels)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, frames, input_ids, attn_mask):
        def f(p):
            if freeze_text_encoder:
                # Don't backprop through the frozen tower at all (the
                # multi_transform zeroing below additionally keeps adamw
                # weight decay off it).
                p = dict(p, text=jax.lax.stop_gradient(p["text"]))
            video, text, scales = model.apply(
                {"params": p}, frames, input_ids, attn_mask)
            return PE.vificlip_contrastive_loss(video, text, scales)

        loss, g = jax.value_and_grad(f)(params)
        updates, opt_state = opt.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for epoch in range(epochs):
        for batch in batches:
            am = batch.get("attention_mask")
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(batch["frames"]),
                jnp.asarray(batch["input_ids"]),
                None if am is None else jnp.asarray(am))
            losses.append(float(loss))
            if log_path is not None:
                with open(log_path, "a") as f:
                    f.write(json.dumps({"epoch": epoch,
                                        "loss": float(loss)}) + "\n")
    return params, losses


def evaluate_encoder(st: PE.TactileEncoderState, data_path: str,
                     datasets=("physiclear",), split: str = "test",
                     frame_size: int = 224, max_frames: int = 4,
                     hardness_threshold: float = 5.0,
                     sensor: str = "dotted") -> dict:
    """Threshold accuracy + pairwise success (test_encoder.py protocol)."""
    ds = TactilePropertyRegressionDataset(data_path, split, datasets,
                                          frame_size=frame_size,
                                          max_frames=max_frames)
    preds, labels = [], []
    for batch in ds.batches(batch_size=8, shuffle=False):
        feats = PE.encode_tactile_video(st.cfg, st.clip_params,
                                        st.adapter_params,
                                        jnp.asarray(batch["frames"]), sensor)
        p = PE.classify_properties(st.classifier_params, feats)
        preds.append(np.asarray(p))
        labels.append(batch["properties"])
    preds = np.concatenate(preds)
    labels = np.concatenate(labels)
    result = {
        "hardness_threshold_acc": threshold_classification_accuracy(
            preds[:, 0], labels[:, 0], hardness_threshold),
        "hardness_pairwise": pairwise_comparison_success(
            preds[:, 0], labels[:, 0]),
        "roughness_pairwise": pairwise_comparison_success(
            preds[:, 1], labels[:, 1]),
        "mse": float(np.mean((preds - labels) ** 2)),
        "num_samples": int(len(preds)),
    }
    logger.info("encoder eval: %s", json.dumps(result))
    return result
