"""Octopi tactile encoder stack: ViFiCLIP + sensor adapters + property head.

TPU-native equivalent of ``/root/reference/octopi/octopi_s/utils/encoder.py``:

- :class:`ViFiCLIP` (``:389-423``): frame-wise CLIP vision encoding of a
  GelSight tactile video, mean-pooled over frames, L2-normalized;
- :class:`Adapter` (``:441-474``): residual 2-layer GELU MLP per sensor type
  (dotted vs plain GelSight), optional output alignment;
- :class:`PropertyClassifier` (``:477-495``): shared MLP trunk with hardness
  and roughness scalar heads;
- :func:`load_encoder`-style checkpoint assembly and the RAG embedding
  helpers (``:498-601``) as plain functions.

All tactile-video batches encode as a single fused program (frames folded
into the batch axis — the "batched on the same mesh" serving path of
BASELINE.json).
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as fnn

from vla_touch_tpu.models.encoders.clip_text import (
    CLIP_TEXT_B16, CLIPTextConfig, CLIPTextTower, causal_bias, eos_pool,
    padding_bias)
from vla_touch_tpu.models.encoders.vit import (
    CLIP_VIT_B16, ViTBlock, ViTConfig, ViTEncoder)
from vla_touch_tpu.utils import checkpoint as ckpt


class CLIPVisionPooled(fnn.Module):
    """CLIP vision tower -> pooled CLS (HF ``pooler_output`` semantics:
    post-layernorm applied to the CLS token)."""

    cfg: ViTConfig = CLIP_VIT_B16
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, pixels):
        tokens = ViTEncoder(self.cfg, dtype=self.dtype, name="vit")(pixels)
        return tokens[:, 0]


class PromptLearningCLIPVision(fnn.Module):
    """VPT-deep prompt-learned CLIP vision tower with per-layer gating.

    Equivalent of the reference's prompt-learned CLIP vision path
    (encoder.py:11-127 + the embeddings-level ``VPT`` at :253-256):

    - an embedding-level prompt set (``prompts[0]``) appends to the patch
      sequence before the pre-layernorm;
    - layers 1..prompt_depth-1 replace the previous layer's prompt outputs
      with fresh learnable tokens (``prompts[i]``), after capturing the
      incoming prompt outputs as ``before``;
    - after each such block the prompt slots blend
      ``sigmoid(γ_i)·after + (1-sigmoid(γ_i))·before`` (except the last
      layer);
    - layer ``prompt_depth`` drops the prompt tokens.

    Only the prompts and gates train; the CLIP backbone stays frozen.
    """

    cfg: ViTConfig = CLIP_VIT_B16
    num_prompts: int = 4
    prompt_depth: int = 9
    gate_prior: float = -3.0
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, pixels):
        from vla_touch_tpu.models.encoders.vit import ViTBlock, _interpolate_pos_embed

        c = self.cfg
        B, H, W, _ = pixels.shape
        grid = (H - c.patch_size) // c.patch_size + 1
        x = fnn.Conv(c.hidden_size, (c.patch_size, c.patch_size),
                     strides=(c.patch_size, c.patch_size), padding="VALID",
                     use_bias=c.patch_bias, dtype=self.dtype,
                     name="patch_embed")(pixels.astype(self.dtype))
        x = x.reshape(B, grid * grid, c.hidden_size)
        n_pos = (c.image_size // c.patch_size) ** 2 + 1
        pos = self.param("pos_embed", fnn.initializers.normal(0.02),
                         (1, n_pos, c.hidden_size), jnp.float32)
        cls = self.param("cls_token", fnn.initializers.zeros,
                         (1, 1, c.hidden_size), jnp.float32)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (B, 1, c.hidden_size)),
             x], axis=1)
        pos = _interpolate_pos_embed(pos, grid, c.image_size // c.patch_size,
                                     c.hidden_size, True)
        x = x + pos.astype(self.dtype)

        prompts = self.param(
            "prompts", fnn.initializers.normal(0.02),
            (max(self.prompt_depth, 1), self.num_prompts, c.hidden_size),
            jnp.float32)
        gates = self.param("gates",
                           fnn.initializers.constant(self.gate_prior),
                           (c.num_layers,), jnp.float32)
        n = self.num_prompts

        # Embedding-level prompt set, appended before the pre-layernorm
        # (reference self.VPT, encoder.py:253-256).
        ctx0 = jnp.broadcast_to(prompts[0].astype(self.dtype),
                                (B, n, c.hidden_size))
        x = jnp.concatenate([x, ctx0], axis=1)
        if c.use_pre_norm:
            x = fnn.LayerNorm(epsilon=c.layernorm_eps, dtype=self.dtype,
                              name="pre_norm")(x)

        for i in range(c.num_layers):
            replace = 0 < i < self.prompt_depth
            before = None
            if replace:
                # Capture the PREVIOUS layer's prompt outputs before they are
                # replaced with fresh learnable tokens (reference gate blend
                # source, encoder.py:64,116).
                before = x[:, x.shape[1] - n:]
                ctx = jnp.broadcast_to(prompts[i].astype(self.dtype),
                                       (B, n, c.hidden_size))
                x = jnp.concatenate([x[:, : x.shape[1] - n], ctx], axis=1)
            elif i == self.prompt_depth:
                x = x[:, : x.shape[1] - n]  # drop prompt slots

            x = ViTBlock(c, dtype=self.dtype, name=f"block{i}")(x)
            if replace and i != c.num_layers - 1:
                g = fnn.sigmoid(gates[i]).astype(self.dtype)
                after = x[:, x.shape[1] - n:]
                gated = g * after + (1 - g) * before
                x = jnp.concatenate([x[:, : x.shape[1] - n], gated], axis=1)

        if self.prompt_depth >= c.num_layers:
            x = x[:, : x.shape[1] - n]
        x = fnn.LayerNorm(epsilon=c.layernorm_eps, dtype=self.dtype,
                          name="final_norm")(x)
        return x[:, 0]


class PromptLearningCLIPText(fnn.Module):
    """Deep prompt-learned CLIP text transformer with per-layer gating.

    Equivalent of ``PromptLearningCLIPTextTransformer`` + the text half of
    ``PromptLearningCLIPEncoderLayer`` (encoder.py:279-375, :66-124).
    Unlike the vision path (which APPENDS prompt tokens), text prompts
    REPLACE the ``num_prompts`` placeholder slots right after BOS
    (positions ``[1, 1+n)``) — the tokenized template is expected to carry
    that many filler tokens, so sequence length (and the causal mask and
    EOS position) is preserved:

    - the embedding-level prompt set overwrites slots ``[1, 1+n)``
      (encoder.py:319-324);
    - layers ``1..prompt_depth-1`` re-overwrite those slots with fresh
      learnable tokens, then blend the block's prompt outputs with the
      incoming ones through ``sigmoid(γ_i)`` (encoder.py:74-81, 108-124);
    - layer ``prompt_depth`` (if < num_layers) drops the slots entirely
      (encoder.py:88-91), shortening the sequence; the padding mask and
      the EOS pooling position shift accordingly.
    """

    cfg: CLIPTextConfig = CLIP_TEXT_B16
    num_prompts: int = 4
    prompt_depth: int = 12
    gate_prior: float = -3.0
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, input_ids, attention_mask=None):
        c = self.cfg
        B, L = input_ids.shape
        n = self.num_prompts
        tok = self.param("token_embed", fnn.initializers.normal(0.02),
                         (c.vocab_size, c.hidden_size), jnp.float32)
        pos = self.param("pos_embed", fnn.initializers.normal(0.01),
                         (c.max_positions, c.hidden_size), jnp.float32)
        x = (jnp.take(tok, input_ids, axis=0) + pos[None, :L]).astype(self.dtype)

        prompts = self.param(
            "prompts", fnn.initializers.normal(0.02),
            (max(self.prompt_depth, 1), n, c.hidden_size), jnp.float32)
        gates = self.param("gates",
                           fnn.initializers.constant(self.gate_prior),
                           (c.num_layers,), jnp.float32)

        def put(x, i):
            ctx = jnp.broadcast_to(prompts[i].astype(self.dtype),
                                   (B, n, c.hidden_size))
            return jnp.concatenate([x[:, :1], ctx, x[:, 1 + n:]], axis=1)

        if self.prompt_depth > 0:
            x = put(x, 0)

        bias = causal_bias(L)
        if attention_mask is not None:
            bias = bias + padding_bias(attention_mask)
        short_bias = causal_bias(L - n)
        if attention_mask is not None:
            short_bias = short_bias + padding_bias(jnp.concatenate(
                [attention_mask[:, :1], attention_mask[:, 1 + n:]], axis=1))

        vc = c.vit()
        dropped = False
        for i in range(c.num_layers):
            replace = 0 < i < self.prompt_depth
            before = None
            if replace:
                before = x[:, 1:1 + n]
                x = put(x, i)
            elif (i == self.prompt_depth and 0 < self.prompt_depth
                  < c.num_layers):
                x = jnp.concatenate([x[:, :1], x[:, 1 + n:]], axis=1)
                dropped = True
            x = ViTBlock(vc, dtype=self.dtype, name=f"block{i}")(
                x, short_bias if dropped else bias)
            if replace and i != c.num_layers - 1:
                g = fnn.sigmoid(gates[i]).astype(self.dtype)
                gated = g * x[:, 1:1 + n] + (1 - g) * before
                x = jnp.concatenate([x[:, :1], gated, x[:, 1 + n:]], axis=1)

        x = fnn.LayerNorm(epsilon=c.layernorm_eps, dtype=self.dtype,
                          name="final_norm")(x)
        eos = (jnp.asarray(input_ids) == c.eos_token_id).astype(jnp.int32)
        pos_idx = jnp.argmax(eos, axis=-1)
        if dropped:
            # EOS sits after the removed slots.  PRECONDITION (the
            # reference's tokenized-template contract): EOS index >= 1+n —
            # the caption must carry the n filler slots.  Clamp so a
            # violating row pools a defined in-range position instead of
            # negative-index wrapping to the padded tail.
            pos_idx = jnp.maximum(pos_idx - n, 0)
        pooled = x[jnp.arange(B), pos_idx]
        return x, pooled


class ViFiCLIPVideo(fnn.Module):
    """Tactile-video encoder: per-frame CLIP, mean-pool, L2 normalize
    (encoder.py:401-412)."""

    cfg: ViTConfig = CLIP_VIT_B16
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, frames):
        """frames: (B, L, H, W, 3) normalized pixels -> (B, D)."""
        B, L, H, W, C = frames.shape
        feats = CLIPVisionPooled(self.cfg, dtype=self.dtype, name="clip")(
            frames.reshape(B * L, H, W, C))
        video = feats.reshape(B, L, -1).mean(axis=1)
        return video / jnp.maximum(
            jnp.linalg.norm(video, axis=-1, keepdims=True), 1e-12)


class ViFiCLIPModel(fnn.Module):
    """Full ViFiCLIP: tactile-video branch + text branch + dual logit scales.

    Equivalent of ``ViFiCLIP`` (encoder.py:389-423): frame-wise CLIP vision
    encoding mean-pooled over frames, CLIP text encoding pooled at EOS, both
    L2-normalized, plus the two learnable temperature parameters
    ``logit_scale_tactile`` / ``logit_scale_text`` (encoder.py:398-399,
    init log(1/0.07)).  With ``prompt_learning=True`` both towers run the
    deep-prompt variants (``PromptLearningCLIPModel``, encoder.py:378-386).

    ``freeze_text_encoder`` (encoder.py:393-396) is a training-time concern
    here: pass the text subtree through ``jax.lax.stop_gradient`` / exclude
    it from the trainable tree (see ``train_encoder.train_vificlip_contrastive``).
    """

    vision_cfg: ViTConfig = CLIP_VIT_B16
    text_cfg: CLIPTextConfig = CLIP_TEXT_B16
    prompt_learning: bool = False
    num_prompts: int = 4
    prompt_depth_vision: int = 9
    prompt_depth_text: int = 9
    gate_prior: float = -3.0
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, frames, input_ids=None, attention_mask=None):
        """frames (B, L, H, W, 3); input_ids (B2, Lt) or None.

        Returns ``(video_features, text_features, logit_scales)`` with unit
        L2 norm features; ``text_features`` is None when ``input_ids`` is
        None (encoder.py:412-420 semantics)."""
        B, L, H, W, C = frames.shape
        flat = frames.reshape(B * L, H, W, C)
        if self.prompt_learning:
            feats = PromptLearningCLIPVision(
                self.vision_cfg, num_prompts=self.num_prompts,
                prompt_depth=self.prompt_depth_vision,
                gate_prior=self.gate_prior, dtype=self.dtype,
                name="vision")(flat)
        else:
            feats = CLIPVisionPooled(self.vision_cfg, dtype=self.dtype,
                                     name="vision")(flat)
        video = feats.reshape(B, L, -1).mean(axis=1)
        video = video / jnp.maximum(
            jnp.linalg.norm(video, axis=-1, keepdims=True), 1e-12)

        text = None
        if input_ids is not None:
            if self.prompt_learning:
                _, pooled = PromptLearningCLIPText(
                    self.text_cfg, num_prompts=self.num_prompts,
                    prompt_depth=self.prompt_depth_text,
                    gate_prior=self.gate_prior, dtype=self.dtype,
                    name="text")(input_ids, attention_mask)
            else:
                _, pooled = CLIPTextTower(self.text_cfg, dtype=self.dtype,
                                          name="text")(input_ids,
                                                       attention_mask)
            text = pooled / jnp.maximum(
                jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12)

        scales = {
            "tactile": self.param("logit_scale_tactile",
                                  fnn.initializers.constant(
                                      float(np.log(1 / 0.07))), ()),
            "text": self.param("logit_scale_text",
                               fnn.initializers.constant(
                                   float(np.log(1 / 0.07))), ()),
        }
        return video, text, scales


def vificlip_contrastive_loss(video, text, scales, max_scale: float = 100.0):
    """Symmetric InfoNCE over a matched (video_i, text_i) batch, one
    direction per learnable scale.

    The reference declares both scales (encoder.py:398-399) but its shipped
    forward never computes logits (returns None, :421-423) — this is the
    training objective those parameters exist for, the CLIP-standard
    cross-entropy over ``scale · <v, t>`` in both directions with the
    tactile scale tempering video→text and the text scale text→video.
    """
    import optax

    s_v = jnp.minimum(jnp.exp(scales["tactile"]), max_scale)
    s_t = jnp.minimum(jnp.exp(scales["text"]), max_scale)
    sims = video @ text.T                       # (B, B)
    labels = jnp.arange(video.shape[0])
    lv = optax.softmax_cross_entropy_with_integer_labels(
        sims * s_v, labels).mean()
    lt = optax.softmax_cross_entropy_with_integer_labels(
        sims.T * s_t, labels).mean()
    return 0.5 * (lv + lt)


class Adapter(fnn.Module):
    """Residual MLP adapter (encoder.py:441-474)."""

    input_size: int
    output_size: int
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, x):
        h = fnn.Dense(512, dtype=self.dtype,
                      kernel_init=fnn.initializers.truncated_normal(1e-3),
                      name="rfc1")(x)
        h = fnn.gelu(h, approximate=False)
        h = fnn.Dense(self.input_size, dtype=self.dtype,
                      kernel_init=fnn.initializers.truncated_normal(1e-3),
                      name="rfc2")(h)
        combined = h + x
        if self.input_size != self.output_size:
            combined = fnn.Dense(
                self.output_size, dtype=self.dtype,
                kernel_init=fnn.initializers.truncated_normal(1e-3),
                name="align")(fnn.gelu(combined, approximate=False))
        return combined


class PropertyClassifier(fnn.Module):
    """Hardness + roughness regression heads (encoder.py:477-495)."""

    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, x):
        h = fnn.Dense(512, dtype=self.dtype, name="fc1")(x)
        h = fnn.gelu(h, approximate=False)
        h = fnn.Dense(256, dtype=self.dtype, name="fc2")(h)
        h = fnn.gelu(h, approximate=False)
        hard = fnn.Dense(1, dtype=self.dtype, name="hardness_fc")(h)
        rough = fnn.Dense(1, dtype=self.dtype, name="roughness_fc")(h)
        return jnp.concatenate([hard, rough], axis=-1)


@dataclasses.dataclass
class TactileEncoderState:
    """The deployable encoder bundle (≙ load_encoder, encoder.py:498-544)."""

    cfg: ViTConfig
    clip_params: dict
    adapter_params: dict            # per sensor type: {"dotted": ..., "plain": ...}
    classifier_params: dict
    feature_dim: int = 768


def init_tactile_encoder(cfg: ViTConfig = CLIP_VIT_B16, key=None,
                         sensors=("dotted", "plain")) -> TactileEncoderState:
    key = key if key is not None else jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    D = cfg.hidden_size
    dummy_frames = jnp.zeros((1, 2, cfg.patch_size * 2, cfg.patch_size * 2, 3))
    clip_params = ViFiCLIPVideo(cfg).init(k1, dummy_frames)["params"]
    adapter_params = {
        s: Adapter(D, D).init(jax.random.fold_in(k2, i),
                              jnp.zeros((1, D)))["params"]
        for i, s in enumerate(sensors)
    }
    classifier_params = PropertyClassifier().init(k3, jnp.zeros((1, D)))["params"]
    return TactileEncoderState(cfg=cfg, clip_params=clip_params,
                               adapter_params=adapter_params,
                               classifier_params=classifier_params,
                               feature_dim=D)


@partial(jax.jit, static_argnames=("cfg", "sensor"))
def encode_tactile_video(cfg: ViTConfig, clip_params, adapter_params,
                         frames, sensor: str = "dotted"):
    """(B, L, H, W, 3) normalized frames -> adapted video features (B, D)."""
    video = ViFiCLIPVideo(cfg).apply({"params": clip_params}, frames)
    return Adapter(cfg.hidden_size, cfg.hidden_size).apply(
        {"params": adapter_params[sensor]}, video)


@partial(jax.jit, static_argnames=())
def classify_properties(classifier_params, features):
    """(B, D) -> (B, 2) [hardness, roughness]."""
    return PropertyClassifier().apply({"params": classifier_params}, features)


def save_tactile_encoder(path: str, st: TactileEncoderState) -> None:
    os.makedirs(path, exist_ok=True)
    ckpt.save_pytree(os.path.join(path, "clip.msgpack"), st.clip_params)
    ckpt.save_pytree(os.path.join(path, "adapters.msgpack"), st.adapter_params)
    ckpt.save_pytree(os.path.join(path, "classifier.msgpack"),
                     st.classifier_params)
    ckpt.save_json(os.path.join(path, "meta.json"),
                   {"feature_dim": st.feature_dim,
                    "cfg": dataclasses.asdict(st.cfg)})


def load_tactile_encoder(path: str, cfg: Optional[ViTConfig] = None
                         ) -> TactileEncoderState:
    meta = ckpt.load_json(os.path.join(path, "meta.json"))
    if cfg is None:
        cfg = ViTConfig(**meta["cfg"])
    st = init_tactile_encoder(cfg)
    st.clip_params = ckpt.load_pytree(os.path.join(path, "clip.msgpack"),
                                      st.clip_params)
    st.adapter_params = ckpt.load_pytree(
        os.path.join(path, "adapters.msgpack"), st.adapter_params)
    st.classifier_params = ckpt.load_pytree(
        os.path.join(path, "classifier.msgpack"), st.classifier_params)
    return st


# ---- RAG embeddings (encoder.py:547-601) --------------------------------------


def generate_rag_embeddings(features: np.ndarray, labels: list) -> dict:
    """Store normalized features with their labels for retrieval."""
    f = np.asarray(features, np.float32)
    f = f / np.maximum(np.linalg.norm(f, axis=-1, keepdims=True), 1e-12)
    return {"embeddings": f, "labels": list(labels)}


def rag_lookup(bank: dict, query: np.ndarray, top_k: int = 3) -> list:
    """Cosine-similarity top-k retrieval."""
    q = np.asarray(query, np.float32)
    q = q / np.maximum(np.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    sims = bank["embeddings"] @ q.reshape(-1)
    idx = np.argsort(-sims)[:top_k]
    return [(bank["labels"][i], float(sims[i])) for i in idx]
