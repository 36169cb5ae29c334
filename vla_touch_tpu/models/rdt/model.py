"""RDT — Robotics Diffusion Transformer, TPU-native.

Re-design of ``/root/reference/VLA/models/rdt/model.py`` +
``blocks.py`` as a flax module: a DiT-style transformer whose input sequence
is [timestep, ctrl_freq, state, action×horizon] and whose blocks alternate
masked cross-attention to the language condition (even blocks) and the image
condition (odd blocks) — ``model.py:155-159``.

Architectural contract preserved for weight-port parity:

- pre-RMSNorm residual blocks: self-attn → cross-attn → tanh-GELU MLP
  (``blocks.py:144-183``), qk-RMSNorm in both attentions;
- trainable positional embeddings initialized from the multimodal sincos
  tables (``model.py:77-111``);
- final layer = RMSNorm + tanh-GELU MLP to ``output_dim``, zero-initialized
  last projection (``model.py:119-121``);
- GLIDE sinusoidal timestep/ctrl-freq embedders (``blocks.py:28-66``).

Compute in ``dtype`` (bfloat16 on TPU), master params in float32.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as fnn

from vla_touch_tpu.config import RDTModelConfig
from vla_touch_tpu.ops.nn import CrossAttention, Mlp, RmsNorm, SelfAttention
from vla_touch_tpu.ops.pos_embed import (
    get_1d_sincos_pos_embed_from_grid,
    get_multimodal_cond_pos_embed,
    timestep_embedding,
)


class TimestepEmbedder(fnn.Module):
    """Sinusoidal frequency embedding -> SiLU MLP (blocks.py:28-66)."""

    hidden_size: int
    frequency_embedding_size: int = 256
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, t):
        freq = timestep_embedding(t, self.frequency_embedding_size,
                                  dtype=self.dtype)
        x = fnn.Dense(self.hidden_size, dtype=self.dtype,
                      param_dtype=self.param_dtype, name="fc1")(freq)
        x = fnn.silu(x)
        return fnn.Dense(self.hidden_size, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="fc2")(x)


class RDTBlock(fnn.Module):
    """Self-attn → masked cross-attn → MLP, each pre-RMSNorm residual."""

    hidden_size: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, x, c, mask=None):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = RmsNorm(name="norm1", **kw)(x)
        x = x + SelfAttention(num_heads=self.num_heads, name="attn", **kw)(h)
        h = RmsNorm(name="norm2", **kw)(x)
        x = x + CrossAttention(num_heads=self.num_heads, name="cross_attn",
                               **kw)(h, c, mask)
        h = RmsNorm(name="norm3", **kw)(x)
        x = x + Mlp(hidden_features=self.hidden_size, name="ffn", **kw)(h)
        return x


class RDT(fnn.Module):
    cfg: RDTModelConfig

    @fnn.compact
    def __call__(self, x, freq, t, lang_c, img_c, lang_mask=None,
                 img_mask=None):
        """x (B, horizon+1, D): [state, action...] tokens already adapted to
        hidden width; freq (B,); t (B,) diffusion timesteps; lang_c (B, L, D);
        img_c (B, L_img, D); masks True=valid.  Returns (B, horizon,
        output_dim)."""
        cfg = self.cfg
        dtype = cfg.compute_dtype
        kw = dict(dtype=dtype, param_dtype=jnp.float32)

        t_tok = TimestepEmbedder(cfg.hidden_size, name="t_embedder", **kw)(t)
        f_tok = TimestepEmbedder(cfg.hidden_size, name="freq_embedder", **kw)(freq)
        x = jnp.concatenate(
            [t_tok[:, None], f_tok[:, None], x.astype(dtype)], axis=1
        )  # (B, horizon+3, D)

        def x_pos_init(key, shape, dt):
            emb = get_multimodal_cond_pos_embed(
                embed_dim=cfg.hidden_size,
                mm_cond_lens=OrderedDict(
                    [("timestep", 1), ("ctrl_freq", 1), ("state", 1),
                     ("action", cfg.horizon)]
                ),
            )
            return jnp.asarray(emb[None], dt)

        def lang_pos_init(key, shape, dt):
            # Reference passes ("lang", -max_len): no *per-position* embedding
            # for pre-embedded language tokens (train/train.py:173-176) — all
            # rows equal the position-0 sincos vector.
            emb = get_multimodal_cond_pos_embed(
                embed_dim=cfg.hidden_size,
                mm_cond_lens=OrderedDict([("lang", -cfg.max_lang_cond_len)]),
                embed_modality=False,
            )
            return jnp.asarray(emb[None], dt)

        def img_pos_init(key, shape, dt):
            if cfg.img_pos_embed_grid is None:
                emb = get_1d_sincos_pos_embed_from_grid(
                    cfg.hidden_size, np.arange(cfg.img_cond_len))
            else:
                emb = get_multimodal_cond_pos_embed(
                    embed_dim=cfg.hidden_size,
                    mm_cond_lens=OrderedDict(
                        [("image", tuple(cfg.img_pos_embed_grid))]),
                    embed_modality=False,
                )
            return jnp.asarray(emb[None], dt)

        x_pos = self.param("x_pos_embed", x_pos_init,
                           (1, cfg.horizon + 3, cfg.hidden_size), jnp.float32)
        lang_pos = self.param("lang_cond_pos_embed", lang_pos_init,
                              (1, cfg.max_lang_cond_len, cfg.hidden_size),
                              jnp.float32)
        img_pos = self.param("img_cond_pos_embed", img_pos_init,
                             (1, cfg.img_cond_len, cfg.hidden_size),
                             jnp.float32)

        x = x + x_pos.astype(dtype)
        lang_c = lang_c.astype(dtype) + lang_pos[:, : lang_c.shape[1]].astype(dtype)
        img_c = img_c.astype(dtype) + img_pos.astype(dtype)

        conds = (lang_c, img_c)
        masks = (lang_mask, img_mask)
        for i in range(cfg.depth):
            x = RDTBlock(cfg.hidden_size, cfg.num_heads, name=f"block{i}",
                         **kw)(x, conds[i % 2], masks[i % 2])

        h = RmsNorm(name="final_norm", **kw)(x)
        out = Mlp(hidden_features=cfg.hidden_size, out_features=cfg.output_dim,
                  name="final_ffn", **kw)(h)
        return out[:, -cfg.horizon:]
