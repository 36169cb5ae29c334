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
  last projection init convention (``model.py:119-121``);
- GLIDE sinusoidal timestep/ctrl-freq embedders (``blocks.py:28-66``).

TPU-specific optimization absent from the reference: the conditions are
FIXED across the denoise loop, so their per-block cross-attention K/V
projections can be computed once (:meth:`compute_cond_kv`) and reused by
:meth:`forward_cached` inside the sampling scan — this removes the dominant
FLOPs of the reference's per-step recomputation (5 steps × 14 img blocks ×
4374-token KV projections).

Compute in ``dtype`` (bfloat16 on TPU), master params in float32.
"""

from __future__ import annotations

from collections import OrderedDict

import jax.numpy as jnp
import numpy as np
from flax import linen as fnn

from vla_touch_tpu.config import RDTModelConfig
from vla_touch_tpu.ops.attention import dot_product_attention
from vla_touch_tpu.ops.nn import Mlp, RmsNorm, SelfAttention
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


class CrossAttentionSized(fnn.Module):
    """Masked cross-attention with a separable KV path so condition K/V can
    be precomputed outside the denoise scan (blocks.py:72-138 semantics)."""

    hidden_size: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        C = self.hidden_size
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.q = fnn.Dense(C, use_bias=True, name="q", **kw)
        self.kv = fnn.Dense(2 * C, use_bias=True, name="kv", **kw)
        self.q_norm = RmsNorm(name="q_norm", **kw)
        self.k_norm = RmsNorm(name="k_norm", **kw)
        self.proj = fnn.Dense(C, name="proj", **kw)

    def compute_kv(self, c):
        """Condition (B, L, C) -> post-norm K, V (B, L, H, D)."""
        B, L, _ = c.shape
        C = self.hidden_size
        hd = C // self.num_heads
        kv = self.kv(c).reshape(B, L, 2, self.num_heads, hd)
        k, v = kv[:, :, 0], kv[:, :, 1]
        return self.k_norm(k), v

    def attend(self, x, k, v, mask=None):
        B, N, C = x.shape
        hd = C // self.num_heads
        q = self.q(x).reshape(B, N, self.num_heads, hd)
        q = self.q_norm(q)
        out = dot_product_attention(q, k, v, kv_mask=mask).reshape(B, N, C)
        return self.proj(out)

    def __call__(self, x, c, mask=None):
        k, v = self.compute_kv(c)
        return self.attend(x, k, v, mask)


class RDTBlock(fnn.Module):
    """Self-attn → masked cross-attn → MLP, each pre-RMSNorm residual."""

    hidden_size: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.norm1 = RmsNorm(name="norm1", **kw)
        self.attn = SelfAttention(num_heads=self.num_heads, name="attn", **kw)
        self.norm2 = RmsNorm(name="norm2", **kw)
        self.cross_attn = CrossAttentionSized(
            self.hidden_size, self.num_heads, name="cross_attn", **kw)
        self.norm3 = RmsNorm(name="norm3", **kw)
        self.ffn = Mlp(hidden_features=self.hidden_size, name="ffn", **kw)

    def __call__(self, x, c, mask=None):
        x = x + self.attn(self.norm1(x))
        x = x + self.cross_attn(self.norm2(x), c, mask)
        x = x + self.ffn(self.norm3(x))
        return x

    def call_cached(self, x, k, v, mask=None):
        x = x + self.attn(self.norm1(x))
        x = x + self.cross_attn.attend(self.norm2(x), k, v, mask)
        x = x + self.ffn(self.norm3(x))
        return x

    def compute_kv(self, c):
        return self.cross_attn.compute_kv(c)


class RDT(fnn.Module):
    cfg: RDTModelConfig

    def setup(self):
        cfg = self.cfg
        dtype = cfg.compute_dtype
        kw = dict(dtype=dtype, param_dtype=jnp.float32)
        self.t_embedder = TimestepEmbedder(cfg.hidden_size,
                                           name="t_embedder", **kw)
        self.freq_embedder = TimestepEmbedder(cfg.hidden_size,
                                              name="freq_embedder", **kw)
        # remat wraps __call__ only — the serving methods (call_cached /
        # compute_kv) never run under grad and keep their plain forms
        Block = fnn.remat(RDTBlock) if cfg.remat_blocks else RDTBlock
        self.blocks = [
            Block(cfg.hidden_size, cfg.num_heads, name=f"block{i}", **kw)
            for i in range(cfg.depth)
        ]
        self.final_norm = RmsNorm(name="final_norm", **kw)
        # Zero-initialized final projection: the untrained denoiser outputs
        # zeros (reference model.py:119-121).
        self.final_ffn = Mlp(hidden_features=cfg.hidden_size,
                             out_features=cfg.output_dim,
                             zero_init_output=True, name="final_ffn",
                             **kw)

        def x_pos_init(key, shape, dt):
            emb = get_multimodal_cond_pos_embed(
                embed_dim=cfg.hidden_size,
                mm_cond_lens=OrderedDict(
                    [("timestep", 1), ("ctrl_freq", 1), ("state", 1),
                     ("action", cfg.horizon)]))
            return jnp.asarray(emb[None], dt)

        def lang_pos_init(key, shape, dt):
            # ("lang", -max_len): no *per-position* embedding for
            # pre-embedded language (train/train.py:173-176) — all rows
            # equal the position-0 sincos vector.
            emb = get_multimodal_cond_pos_embed(
                embed_dim=cfg.hidden_size,
                mm_cond_lens=OrderedDict([("lang", -cfg.max_lang_cond_len)]),
                embed_modality=False)
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
                    embed_modality=False)
            return jnp.asarray(emb[None], dt)

        self.x_pos_embed = self.param(
            "x_pos_embed", x_pos_init,
            (1, cfg.horizon + 3, cfg.hidden_size), jnp.float32)
        self.lang_cond_pos_embed = self.param(
            "lang_cond_pos_embed", lang_pos_init,
            (1, cfg.max_lang_cond_len, cfg.hidden_size), jnp.float32)
        self.img_cond_pos_embed = self.param(
            "img_cond_pos_embed", img_pos_init,
            (1, cfg.img_cond_len, cfg.hidden_size), jnp.float32)

    def _embed_x(self, x, freq, t):
        dtype = self.cfg.compute_dtype
        t_tok = self.t_embedder(t)
        f_tok = self.freq_embedder(freq)
        x = jnp.concatenate(
            [t_tok[:, None], f_tok[:, None], x.astype(dtype)], axis=1)
        return x + self.x_pos_embed.astype(dtype)

    def add_cond_pos(self, lang_c, img_c):
        dtype = self.cfg.compute_dtype
        lang_c = lang_c.astype(dtype) + \
            self.lang_cond_pos_embed[:, : lang_c.shape[1]].astype(dtype)
        img_c = img_c.astype(dtype) + self.img_cond_pos_embed.astype(dtype)
        return lang_c, img_c

    def compute_cond_kv(self, lang_c, img_c):
        """Per-block K/V of the (pos-embedded) conditions, computed once per
        chunk inference.  Returns a list of (k, v) per block."""
        lang_c, img_c = self.add_cond_pos(lang_c, img_c)
        conds = (lang_c, img_c)
        return [blk.compute_kv(conds[i % 2])
                for i, blk in enumerate(self.blocks)]

    def forward_cached(self, x, freq, t, cond_kv, lang_mask=None,
                       img_mask=None):
        """Denoise-scan body forward: conditions enter as cached K/V."""
        import jax

        cfg = self.cfg
        with jax.named_scope("rdt_embed_x"):
            x = self._embed_x(x, freq, t)
        masks = (lang_mask, img_mask)
        for i, blk in enumerate(self.blocks):
            k, v = cond_kv[i]
            with jax.named_scope(f"rdt_block{i}"):
                x = blk.call_cached(x, k, v, masks[i % 2])
        with jax.named_scope("rdt_final"):
            out = self.final_ffn(self.final_norm(x))
        return out[:, -cfg.horizon:]

    def __call__(self, x, freq, t, lang_c, img_c, lang_mask=None,
                 img_mask=None):
        """x (B, horizon+1, D): [state, action...] tokens already adapted to
        hidden width; freq (B,); t (B,) diffusion timesteps; lang_c (B, L, D);
        img_c (B, L_img, D); masks True=valid.  Returns (B, horizon,
        output_dim)."""
        cfg = self.cfg
        x = self._embed_x(x, freq, t)
        lang_c, img_c = self.add_cond_pos(lang_c, img_c)
        conds = (lang_c, img_c)
        masks = (lang_mask, img_mask)
        for i, blk in enumerate(self.blocks):
            x = blk(x, conds[i % 2], masks[i % 2])
        out = self.final_ffn(self.final_norm(x))
        return out[:, -cfg.horizon:]
