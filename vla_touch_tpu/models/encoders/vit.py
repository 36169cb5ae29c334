"""Vision transformers: DinoV2 (controller conditioning) and SigLIP
(RDT image conditioning).

TPU-native forwards for the two frozen towers the reference loads from HF —
``facebook/dinov2-small`` (``/root/reference/VLA/residual_controller/
visual_encoder.py``) and ``google/siglip-so400m-patch14-384``
(``/root/reference/VLA/models/multimodal_encoder/siglip_encoder.py``).
Weights port from the HF checkpoints via
:mod:`vla_touch_tpu.utils.torch_port` (``dinov2_from_hf`` /
``siglip_from_hf``); architectures follow the HF modeling code contracts.

Outputs match the reference wrappers:

- DinoV2: ``pooler_output`` = final-layernormed CLS token (B, D);
- SigLIP: ``last_hidden_state`` = post-layernormed patch tokens (B, N, D)
  (the ``'patch'`` feature select, ``siglip_encoder.py:35-40``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as fnn


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    hidden_size: int
    num_layers: int
    num_heads: int
    mlp_dim: int
    patch_size: int = 14
    image_size: int = 518          # pos-embed native grid
    num_channels: int = 3
    layernorm_eps: float = 1e-6
    use_cls_token: bool = True     # DinoV2 yes, SigLIP no
    use_layerscale: bool = True    # DinoV2 yes, SigLIP no
    gelu_tanh: bool = False        # SigLIP uses gelu_pytorch_tanh
    quick_gelu: bool = False       # CLIP uses x*sigmoid(1.702x)
    use_pre_norm: bool = False     # CLIP applies LayerNorm before the blocks
    patch_bias: bool = True        # CLIP's patch conv has no bias


DINOV2_SMALL = ViTConfig(hidden_size=384, num_layers=12, num_heads=6,
                         mlp_dim=1536, image_size=518)
DINOV2_BASE = ViTConfig(hidden_size=768, num_layers=12, num_heads=12,
                        mlp_dim=3072, image_size=518)
SIGLIP_SO400M = ViTConfig(hidden_size=1152, num_layers=27, num_heads=16,
                          mlp_dim=4304, image_size=384, use_cls_token=False,
                          use_layerscale=False, gelu_tanh=True)
CLIP_VIT_B16 = ViTConfig(hidden_size=768, num_layers=12, num_heads=12,
                         mlp_dim=3072, patch_size=16, image_size=224,
                         use_layerscale=False, quick_gelu=True,
                         use_pre_norm=True, layernorm_eps=1e-5,
                         patch_bias=False)


class ViTSelfAttention(fnn.Module):
    """HF-style attention: separate q/k/v Linears + output projection."""

    cfg: ViTConfig
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, x, mask=None):
        """``mask``: optional additive attention bias broadcastable to
        (B, heads, N, N) — e.g. a causal/padding mask with 0 for visible
        and a large negative value for hidden (CLIP text path)."""
        c = self.cfg
        B, N, D = x.shape
        hd = D // c.num_heads
        q = fnn.Dense(D, dtype=self.dtype, name="query")(x)
        k = fnn.Dense(D, dtype=self.dtype, name="key")(x)
        v = fnn.Dense(D, dtype=self.dtype, name="value")(x)

        def split(t):
            return t.reshape(B, N, c.num_heads, hd)

        q, k, v = split(q), split(k), split(v)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (hd ** -0.5)
        if mask is not None:
            scores = scores + mask.astype(scores.dtype)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, N, D)
        return fnn.Dense(D, dtype=self.dtype, name="output")(out)


class ViTBlock(fnn.Module):
    cfg: ViTConfig
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, x, mask=None):
        c = self.cfg
        h = fnn.LayerNorm(epsilon=c.layernorm_eps, dtype=self.dtype,
                          name="norm1")(x)
        h = ViTSelfAttention(c, dtype=self.dtype, name="attention")(h, mask)
        if c.use_layerscale:
            ls1 = self.param("layerscale1", fnn.initializers.ones,
                             (c.hidden_size,), jnp.float32)
            h = h * ls1.astype(self.dtype)
        x = x + h
        h = fnn.LayerNorm(epsilon=c.layernorm_eps, dtype=self.dtype,
                          name="norm2")(x)
        h = fnn.Dense(c.mlp_dim, dtype=self.dtype, name="fc1")(h)
        if c.quick_gelu:
            h = h * fnn.sigmoid(1.702 * h)
        else:
            h = fnn.gelu(h, approximate=c.gelu_tanh)
        h = fnn.Dense(c.hidden_size, dtype=self.dtype, name="fc2")(h)
        if c.use_layerscale:
            ls2 = self.param("layerscale2", fnn.initializers.ones,
                             (c.hidden_size,), jnp.float32)
            h = h * ls2.astype(self.dtype)
        return x + h


def _interpolate_pos_embed(pos, new_grid: int, old_grid: int, dim: int,
                           has_cls: bool):
    """Bicubic grid interpolation of positional embeddings
    (HF ``Dinov2Embeddings.interpolate_pos_encoding`` semantics)."""
    if new_grid == old_grid:
        return pos
    if has_cls:
        cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
    else:
        cls_pos, patch_pos = None, pos
    grid = patch_pos.reshape(1, old_grid, old_grid, dim)
    grid = jax.image.resize(grid, (1, new_grid, new_grid, dim),
                            method="bicubic")
    out = grid.reshape(1, new_grid * new_grid, dim)
    if cls_pos is not None:
        out = jnp.concatenate([cls_pos, out], axis=1)
    return out


class ViTEncoder(fnn.Module):
    """Patchify → [CLS] → +pos → blocks → final LayerNorm."""

    cfg: ViTConfig
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, pixels):
        """pixels: (B, H, W, 3) already normalized, channels-last."""
        c = self.cfg
        B, H, W, _ = pixels.shape
        # VALID patchify: 384/14 is not integral for SigLIP-so400m; torch
        # Conv2d drops the trailing pixels, grid = floor((H - p)/p) + 1 = 27.
        grid = (H - c.patch_size) // c.patch_size + 1
        x = fnn.Conv(c.hidden_size, (c.patch_size, c.patch_size),
                     strides=(c.patch_size, c.patch_size), padding="VALID",
                     use_bias=c.patch_bias, dtype=self.dtype,
                     name="patch_embed")(pixels.astype(self.dtype))
        x = x.reshape(B, grid * grid, c.hidden_size)

        n_patches_native = (c.image_size // c.patch_size) ** 2
        n_pos = n_patches_native + (1 if c.use_cls_token else 0)
        pos = self.param("pos_embed", fnn.initializers.normal(0.02),
                         (1, n_pos, c.hidden_size), jnp.float32)

        if c.use_cls_token:
            cls = self.param("cls_token", fnn.initializers.zeros,
                             (1, 1, c.hidden_size), jnp.float32)
            x = jnp.concatenate(
                [jnp.broadcast_to(cls.astype(self.dtype),
                                  (B, 1, c.hidden_size)), x], axis=1)

        pos = _interpolate_pos_embed(pos, grid, c.image_size // c.patch_size,
                                     c.hidden_size, c.use_cls_token)
        x = x + pos.astype(self.dtype)

        if c.use_pre_norm:
            x = fnn.LayerNorm(epsilon=c.layernorm_eps, dtype=self.dtype,
                              name="pre_norm")(x)

        for i in range(c.num_layers):
            x = ViTBlock(c, dtype=self.dtype, name=f"block{i}")(x)

        return fnn.LayerNorm(epsilon=c.layernorm_eps, dtype=self.dtype,
                             name="final_norm")(x)


class DinoV2Encoder(fnn.Module):
    """Returns the pooled CLS embedding (B, D), matching
    ``Dinov2Model(...).pooler_output``."""

    cfg: ViTConfig = DINOV2_SMALL
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, pixels):
        tokens = ViTEncoder(self.cfg, dtype=self.dtype, name="vit")(pixels)
        return tokens[:, 0]


class SiglipVisionEncoder(fnn.Module):
    """Returns post-layernormed patch tokens (B, N, D), matching the
    reference tower's 'patch' feature select."""

    cfg: ViTConfig = SIGLIP_SO400M
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, pixels):
        return ViTEncoder(self.cfg, dtype=self.dtype, name="vit")(pixels)
